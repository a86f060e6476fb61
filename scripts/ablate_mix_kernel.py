#!/usr/bin/env python
"""Ablation harness for the fused HSM-SSD mixer kernel (perf diagnosis)."""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmunet_tpu.utils.profiler import chained_time_ms


def make_kernel(mode, n_tiles, c, n, tile):
    def _kernel(xt_ref, dt_ref, bm_ref, cm_ref, a_ref, yt_ref, m_ref, den_ref, h_ref):
        p = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when((p == 0) & (i == 0))
        def _():
            m_ref[...] = jnp.zeros_like(m_ref)
            den_ref[...] = jnp.zeros_like(den_ref)
            h_ref[...] = jnp.zeros_like(h_ref)

        @pl.when(p == 0)
        def _phase0():
            if mode == "dma_only":
                h_ref[...] += jnp.sum(dt_ref[0][:8, :].astype(jnp.float32)) + jnp.sum(
                    bm_ref[0][:8, :].astype(jnp.float32)) + jnp.sum(
                    xt_ref[0][:, :8].astype(jnp.float32))
                yt_ref[0] = jnp.zeros_like(yt_ref[0])
                return
            if mode == "no_max":
                s = dt_ref[0].astype(jnp.float32) + a_ref[0].astype(jnp.float32)
                e = jnp.exp(s)
                den_ref[0] = den_ref[0] + jnp.sum(e, axis=0)
                w = (e * bm_ref[0].astype(jnp.float32)).astype(xt_ref.dtype)
            elif mode == "bf16_e":
                s = dt_ref[0] + a_ref[0]
                m_old = m_ref[0]
                m_new = jnp.maximum(m_old, jnp.max(s.astype(jnp.float32), axis=0))
                e = jnp.exp((s.astype(jnp.float32) - m_new[None, :])).astype(jnp.bfloat16)
                scale = jnp.exp(m_old - m_new)
                den_ref[0] = den_ref[0] * scale + jnp.sum(e.astype(jnp.float32), axis=0)
                w = e * bm_ref[0]
                h_ref[...] = h_ref[...] * scale[None, :]
            elif mode == "no_exp":
                s = dt_ref[0].astype(jnp.float32) + a_ref[0].astype(jnp.float32)
                den_ref[0] = den_ref[0] + jnp.sum(s, axis=0)
                w = (s * bm_ref[0].astype(jnp.float32)).astype(xt_ref.dtype)
            else:  # full (online softmax fp32)
                s = dt_ref[0].astype(jnp.float32) + a_ref[0].astype(jnp.float32)
                m_old = m_ref[0]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
                scale = jnp.exp(m_old - m_new)
                e = jnp.exp(s - m_new[None, :])
                den_ref[0] = den_ref[0] * scale + jnp.sum(e, axis=0)
                w = (e * bm_ref[0].astype(jnp.float32)).astype(xt_ref.dtype)
                h_ref[...] = h_ref[...] * scale[None, :]
                m_ref[0] = m_new
            contrib = jax.lax.dot_general(
                xt_ref[0], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h_ref[...] = h_ref[...] + contrib

        @pl.when(p == 1)
        def _phase1():
            if mode == "dma_only":
                yt_ref[0] = (jnp.zeros_like(yt_ref[0]) + jnp.sum(
                    cm_ref[0][:8, :].astype(jnp.float32))).astype(yt_ref.dtype)
                return
            yt_ref[0] = jax.lax.dot_general(
                (h_ref[...] / (den_ref[0][None, :] + 1.0)).astype(xt_ref.dtype),
                cm_ref[0],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(yt_ref.dtype)

    return _kernel


def run(mode, B=64, C=16, HW=128, N=64, TILE=4096):
    L = HW * HW
    TILE = min(TILE, L)
    n_tiles = L // TILE
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (B, C, L), jnp.bfloat16)
    dt = jax.random.normal(key, (B, L, N), jnp.bfloat16)
    Bm = jax.random.normal(key, (B, L, N), jnp.bfloat16)
    Cm = jax.random.normal(key, (B, L, N), jnp.bfloat16)
    A = jax.random.uniform(key, (N,), jnp.bfloat16, 1, 16)

    kern = make_kernel(mode, n_tiles, C, N, TILE)
    f = pl.pallas_call(
        kern,
        grid=(B, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, C, TILE),
                         lambda b, p, i: (b, 0, i * (1 - p) + (n_tiles - 1) * p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, N),
                         lambda b, p, i: (b, i * (1 - p) + (n_tiles - 1) * p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, N),
                         lambda b, p, i: (b, i * (1 - p) + (n_tiles - 1) * p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, N), lambda b, p, i: (b, i * p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, p, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE), lambda b, p, i: (b, 0, i * p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, L), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((C, N), jnp.float32),
        ],
    )
    t = chained_time_ms(lambda *a: f(*a), xt, dt, Bm, Cm, A[None, :], iters=20)
    print(f"{mode:10s} TILE={TILE}: {t:.2f} ms")


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["full", "bf16_e", "no_max", "no_exp", "dma_only"]):
        if "=" in mode:
            continue
        tile = 4096
        for a in sys.argv[1:]:
            if a.startswith("tile="):
                tile = int(a.split("=")[1])
        run(mode, TILE=tile)
