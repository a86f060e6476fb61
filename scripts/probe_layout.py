#!/usr/bin/env python
"""Layout probe: is the stage-1 EnhancedViM path lane-starved?

Hypothesis (round-4): at the flagship's dominant shape (B128 128^2 C16,
L=16384, N=64 state dim), every (B, L, C)/(B, L, N) tensor has a minor dim
of 16..64 < the 128-lane vreg width, so each HBM pass moves lane-padded
tiles and the mixer chain runs several x off the bandwidth roofline.

Measures effective GB/s (logical bytes moved / time) of the mixer's
building blocks in token-minor (B, *, L) vs channel-minor (B, L, *)
layouts:

  copy        y = x + 1                     (pure stream)
  softmax     softmax over L
  compress    einsum contraction over L     (the h = x^T(A*B) matmul)

Usage: python scripts/probe_layout.py [B] [L] [N] [C]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kmunet_tpu.utils.profiler import chained_time_ms


def gbps(ms, nbytes):
    return nbytes / (ms * 1e-3) / 1e9


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 128 * 128
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    C = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    itemsize = 2

    print(f"B{B} L{L} N{N} C{C} bf16; effective GB/s = logical bytes / time")

    # --- pure stream: read + write (B, L, N) ---
    x_ln = jax.random.normal(key, (B, L, N), dt)
    x_nl = jax.random.normal(key, (B, N, L), dt)
    nbytes = 2 * B * L * N * itemsize
    ms = chained_time_ms(lambda a: a + 1, x_ln, iters=10)
    print(f"copy  (B,L,N) N-minor: {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(lambda a: a + 1, x_nl, iters=10)
    print(f"copy  (B,N,L) L-minor: {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")

    # --- (B, L, C) stream at C=16 (the token tensor itself) ---
    t_lc = jax.random.normal(key, (B, L, C), dt)
    t_cl = jax.random.normal(key, (B, C, L), dt)
    nbytes = 2 * B * L * C * itemsize
    ms = chained_time_ms(lambda a: a + 1, t_lc, iters=10)
    print(f"copy  (B,L,C) C-minor: {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(lambda a: a + 1, t_cl, iters=10)
    print(f"copy  (B,C,L) L-minor: {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")

    # --- softmax over L ---
    nbytes = 2 * B * L * N * itemsize  # read once, write once (fused max/sum)
    ms = chained_time_ms(lambda a: jax.nn.softmax(a, axis=1), x_ln, iters=10)
    print(f"smax  (B,L,N) over L=axis1 (N-minor): {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(lambda a: jax.nn.softmax(a, axis=2), x_nl, iters=10)
    print(f"smax  (B,N,L) over L=minor:           {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")

    # --- compress einsum: contraction over L ---
    # channel-minor: blc,bln->bnc ; token-minor: bcl,bnl->bnc
    nbytes = B * L * (C + N) * itemsize
    ms = chained_time_ms(
        lambda a, b: jnp.einsum("blc,bln->bnc", a, b), t_lc, x_ln, iters=10)
    print(f"comp  blc,bln->bnc (C/N-minor): {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(
        lambda a, b: jnp.einsum("bcl,bnl->bnc", a, b), t_cl, x_nl, iters=10)
    print(f"comp  bcl,bnl->bnc (L-minor):   {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")

    # --- scatter einsum: y = h^T C, expansion over L ---
    h = jax.random.normal(key, (B, N, C), dt)
    nbytes = B * L * (C + N) * itemsize
    ms = chained_time_ms(
        lambda hh, cc: jnp.einsum("bnc,bln->blc", hh, cc), h, x_ln, iters=10)
    print(f"scat  bnc,bln->blc (C-minor out): {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(
        lambda hh, cc: jnp.einsum("bnc,bnl->bcl", hh, cc), h, x_nl, iters=10)
    print(f"scat  bnc,bnl->bcl (L-minor out): {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")

    # --- the full mixer softmax->compress chain both ways ---
    def chain_lc(tok, s, bm):
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        d = jnp.sum(e, axis=1)
        return jnp.einsum("blc,bln->bnc", tok, e * bm) / d[..., None]

    def chain_cl(tok, s, bm):
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        d = jnp.sum(e, axis=2)
        return jnp.einsum("bcl,bnl->bnc", tok, e * bm) / d[:, None, :]

    bm_ln = jax.random.normal(key, (B, L, N), dt)
    bm_nl = jax.random.normal(key, (B, N, L), dt)
    nbytes = B * L * (C + 2 * N) * itemsize
    ms = chained_time_ms(chain_lc, t_lc, x_ln, bm_ln, iters=10)
    print(f"chain C/N-minor: {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")
    ms = chained_time_ms(chain_cl, t_cl, x_nl, bm_nl, iters=10)
    print(f"chain L-minor:   {ms:7.2f} ms  {gbps(ms, nbytes):7.1f} GB/s")


if __name__ == "__main__":
    main()
