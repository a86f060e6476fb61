#!/usr/bin/env python
"""Decompose EnhancedViMBlock cost at the dominant stage-1 shape.

Chained-timing (see utils/profiler.py) of each sub-component of the
EnhancedViM ladder at B x 128^2 x C16 bf16 — the shape that dominates the
B64 forward (BASELINE.md: EnhancedViM blocks ~71 ms of 183 ms).

Usage: python scripts/profile_vim.py [B] [C] [HW]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kmunet_tpu.models.km_unet import EnhancedViMBlock, DirectionViM
from kmunet_tpu.nn.attention import DirectionAttention, TripleNorm
from kmunet_tpu.nn.layers import ChannelLayerNorm, ConvBNAct, FFN
from kmunet_tpu.nn.ssd import HSMSSD, EfficientViMBlock
from kmunet_tpu.utils.profiler import chained_time_ms


def bf16(tree):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def time_module(mod, *xs, iters=30, **apply_kw):
    # jitted init: eager init dispatches each param op over the remote-TPU
    # tunnel individually (minutes for big modules).
    variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *xs, **apply_kw))()
    variables = bf16(variables)

    def f(*xs):
        out = mod.apply(variables, *xs, **apply_kw)
        return out[0] if isinstance(out, tuple) else out

    return chained_time_ms(f, *xs, iters=iters)


def time_fn(f, *xs, iters=30):
    return chained_time_ms(f, *xs, iters=iters)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    HW = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    N = 64
    L = HW * HW
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (B, HW, HW, C), jnp.bfloat16)
    tok = x.reshape(B, L, C)
    dt = jax.random.normal(key, (B, L, N), jnp.bfloat16)
    Bm = jax.random.normal(key, (B, L, N), jnp.bfloat16)
    A_param = jax.random.uniform(key, (N,), jnp.bfloat16, 1, 16)

    print(f"shape B{B} {HW}^2 C{C} N{N} bf16 (times in ms)")
    r = {}
    r["EnhancedViMBlock (full)"] = time_module(EnhancedViMBlock(state_dim=16), x, iters=10)
    r["DirectionViM x1"] = time_module(DirectionViM("height"), x, iters=10)
    r["EfficientViMBlock"] = time_module(
        EfficientViMBlock(dim=C, mlp_ratio=4, ssd_expand=1, state_dim=N), x, iters=10)
    r["HSMSSD (tokens)"] = time_module(
        HSMSSD(d_model=C, ssd_expand=1, state_dim=N), tok, iters=10)
    r["DirectionAttention"] = time_module(DirectionAttention("height"), x, iters=10)
    r["TripleNorm"] = time_module(TripleNorm(), x)
    r["ChannelLayerNorm"] = time_module(ChannelLayerNorm(), tok)
    r["dwconv3x3+BN"] = time_module(
        ConvBNAct(C, (3, 3), groups=C, bn_weight_init=0.0, act=None), x)
    r["FFN x4"] = time_module(FFN(4 * C), x)

    # HSM-SSD internals
    proj_k = jax.random.normal(key, (3, 3, C, 3 * N), jnp.bfloat16) * 0.05
    r["BCdt conv (C->3N)"] = time_fn(
        lambda a: jax.lax.conv_general_dilated(
            a.reshape(B, HW, HW, C), proj_k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), tok)
    r["softmax over L"] = time_fn(
        lambda d: jax.nn.softmax(d + A_param[None, None, :], axis=1), dt)
    r["A*B + compress einsum"] = time_fn(
        lambda t, a, b: jnp.einsum("blc,bln->bnc", t, a * b), tok, dt, Bm)
    h = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    r["scatter einsum"] = time_fn(
        lambda hh, cc: jnp.einsum("bnc,bln->blc", hh, cc), h, Bm)

    for k, v in r.items():
        print(f"  {k:28s} {v:8.2f}")


if __name__ == "__main__":
    main()
