#!/usr/bin/env python
"""Round-4 diagnostic: per-module fwd vs fwd+bwd cost at B32 (train batch).

The flagship train step measures 650 ms at B32 while the forward is ~46 ms.
This times jax.grad of each flagship module standalone to find where the
~14x fwd:train ratio comes from.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bf16_tree(t):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)


def main():
    from kmunet_tpu.models.km_unet import (
        EnhancedViMBlock, StableHybridKANConv, KM_UNetV3)
    from kmunet_tpu.nn.attention import LocalContrastAttention, MultiScaleFusion
    from kmunet_tpu.nn.dagem import DAGEM
    from kmunet_tpu.nn.resample import DySample
    from kmunet_tpu.nn.wavelet import IntelligentWaveletPooling
    from kmunet_tpu.utils.profiler import chained_time_ms

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = jax.random.PRNGKey(1)

    def u(h, c):
        return jax.random.uniform(key, (B, h, h, c), jnp.bfloat16)

    def tm(mod, *xs, **kw):
        v = bf16_tree(jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *xs, **kw))())

        def f(vv, *xs):
            out = mod.apply(vv, *xs, **kw)
            out = out[0] if isinstance(out, tuple) else out
            return out

        def loss(vv, *xs):
            return jnp.sum(f(vv, *xs).astype(jnp.float32) ** 2)

        ms_f = chained_time_ms(lambda *xs: f(v, *xs), *xs, iters=10)
        g = jax.grad(loss, argnums=0)
        ms_g = chained_time_ms(lambda *xs: g(v, *xs), *xs, iters=10)
        return ms_f, ms_g

    rows = []
    for hw, c in ((128, 16), (64, 32), (32, 64)):
        rows.append((f"EnhViM[separate] C{c}@{hw}^2",
                     tm(EnhancedViMBlock(state_dim=16), u(hw, c))))
    rows.append(("KAN C16@128^2", tm(StableHybridKANConv(16), u(128, 16))))
    rows.append(("IWP @128^2C16", tm(IntelligentWaveletPooling(), u(128, 16))))
    rows.append(("LCA @64^2C16", tm(LocalContrastAttention(), u(64, 16))))
    rows.append(("DAGEM @16^2C64", tm(DAGEM(), u(16, 64))))
    feats = [u(32, 16), u(32, 32), u(32, 32)]
    rows.append(("MSF @32^2",
                 tm(MultiScaleFusion(channels=(16, 32, 32)), feats)))
    for hw, c in ((16, 64), (32, 64), (64, 64)):
        rows.append((f"DySample C{c} {hw}->{2*hw}",
                     tm(DySample(scale=2, style="lp", groups=4), u(hw, c))))

    tot_f = tot_g = 0.0
    for name, (ms_f, ms_g) in rows:
        print(f"{name:32s} fwd {ms_f:7.2f}  grad {ms_g:7.2f}  ratio {ms_g/ms_f:5.1f}")
        tot_f += ms_f
        tot_g += ms_g
    print(f"{'TOTAL modules':32s} fwd {tot_f:7.2f}  grad {tot_g:7.2f}")

    model = KM_UNetV3()
    xin = jax.random.uniform(key, (B, 128, 128, 5), jnp.bfloat16)
    v = bf16_tree(jax.jit(lambda: model.init(jax.random.PRNGKey(0), xin))())
    lossf = lambda vv, a: jnp.sum(model.apply(vv, a).astype(jnp.float32) ** 2)
    ms_f = chained_time_ms(lambda a: model.apply(v, a), xin, iters=10)
    g = jax.grad(lossf, argnums=0)
    ms_g = chained_time_ms(lambda a: g(v, a), xin, iters=10)
    print(f"{'FULL KM_UNetV3_SH':32s} fwd {ms_f:7.2f}  grad {ms_g:7.2f}  ratio {ms_g/ms_f:5.1f}")


if __name__ == "__main__":
    main()
