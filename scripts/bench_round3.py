"""Round-3 TPU measurement runner: validates + times everything round 3 built.

Stages (run all, or name a subset on the CLI):

  sanity    kernel parity on the REAL chip (bilinear border/zeros fp32+bf16
            dispatch, entry() forward, TrajGRU bf16 forward on the multiview
            kernel path)
  flagship  KM_UNetV3_SH fused vs separate EnhancedViM chain @ B128 128^2
            bf16 (VERDICT r2 item 1: target >= 20k frames/s/chip)
  modules   per-module decomposition of the flagship forward (where the
            remaining ms live)
  dysample  DySample grouped-kernel vs XLA at the three decoder shapes
  trajgru   TrajGRU EF forward (multiview kernel warp; VERDICT r2 item 3:
            target >= 10x the 1858 fps round-2 number)
  mamba     Mamba-UNet full TRAIN step (fwd+bwd) — exercises the reverse-scan
            Pallas backward (VERDICT r2 item 4)

Usage: python scripts/bench_round3.py [stage ...]   (default: all)

Timing uses the chained-iteration method (bench.py docstring): the remote-TPU
tunnel does not honor block_until_ready, so each iteration's output feeds the
next and one scalar is read back at the end.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()


def log(*a):
    print("t=%6.1f" % (time.time() - T0), *a, flush=True)


def bf16_tree(tree):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        tree,
    )


def stage_sanity():
    from kmunet_tpu.kernels.bilinear_pallas import (
        gather_bilinear_border,
        gather_bilinear_zeros,
    )
    from kmunet_tpu.ops.sample import bilinear_gather, bilinear_gather_xla

    rng = np.random.default_rng(0)
    B, H, W, C, Ho, Wo = 2, 64, 64, 16, 128, 128
    img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.5, W + 0.5, (B, Ho, Wo)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1.5, H + 0.5, (B, Ho, Wo)).astype(np.float32))

    # fp32 dispatch must take the bit-exact XLA path
    for mode in ("border", "zeros"):
        got = jax.jit(lambda i, a, b: bilinear_gather(i, a, b, padding_mode=mode))(img, x, y)
        want = jax.jit(lambda i, a, b: bilinear_gather_xla(i, a, b, padding_mode=mode))(img, x, y)
        d = float(jnp.abs(got - want).max())
        log(f"sanity fp32 dispatch {mode}: maxdiff {d:.2e}")
        assert d == 0.0, mode

    # bf16 kernel parity, both padding modes
    for mode, fn in (("border", gather_bilinear_border), ("zeros", gather_bilinear_zeros)):
        i2, x2, y2 = img.astype(jnp.bfloat16), x.astype(jnp.bfloat16), y.astype(jnp.bfloat16)
        got = jax.jit(lambda i, a, b: fn(i, a, b))(i2, x2, y2)
        want = jax.jit(lambda i, a, b: bilinear_gather_xla(i, a, b, padding_mode=mode))(i2, x2, y2)
        d = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
        log(f"sanity bf16 kernel {mode}: maxdiff {d:.2e}")
        assert d < 6e-2, mode

    # multiview kernel vs folded XLA path (the TrajGRU warp layout)
    from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_multiview
    from kmunet_tpu.ops.sample import bilinear_gather_multiview as mv_xla_dispatch
    import kmunet_tpu.ops.sample as S

    G = 5
    xs = jnp.asarray(rng.uniform(-1.5, W + 0.5, (B, G, H, W)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1.5, H + 0.5, (B, G, H, W)).astype(np.float32))
    i2 = img.astype(jnp.bfloat16)
    got = jax.jit(lambda i, a, b: gather_bilinear_multiview(i, a, b, zeros=True))(
        i2, xs.astype(jnp.bfloat16), ys.astype(jnp.bfloat16))
    S.USE_PALLAS_GATHER = False
    try:
        want = jax.jit(lambda i, a, b: mv_xla_dispatch(i, a, b, padding_mode="zeros"))(
            i2, xs.astype(jnp.bfloat16), ys.astype(jnp.bfloat16))
    finally:
        S.USE_PALLAS_GATHER = None
    d = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
    log(f"sanity bf16 multiview zeros: maxdiff {d:.2e}")
    assert d < 6e-2

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    log("sanity entry():", out.shape, out.dtype, bool(jnp.isfinite(out).all()))


def stage_flagship():
    import bench
    import kmunet_tpu.models.km_unet as km
    from kmunet_tpu.models.km_unet import KM_UNetV3

    B = 128
    orig = km.EnhancedViMBlock
    for impl in ("fused", "separate"):
        km.EnhancedViMBlock = lambda *a, **k: orig(*a, **{**k, "impl": impl})
        try:
            m = KM_UNetV3(num_classes=20, variant="sh")
            x = jax.random.uniform(jax.random.PRNGKey(0), (B, 128, 128, 5), jnp.bfloat16)
            v = bf16_tree(jax.jit(m.init)(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 5))))
            dt = bench._chain_time(lambda vv, xx: m.apply(vv, xx), v, x)
            log(f"flagship[{impl}]: {dt*1e3:.1f} ms @ B{B} -> {B*20/dt:.0f} frames/s/chip")
        finally:
            km.EnhancedViMBlock = orig


def stage_modules():
    from kmunet_tpu.models.km_unet import EnhancedViMBlock, StableHybridKANConv
    from kmunet_tpu.nn.attention import LocalContrastAttention, MultiScaleFusion
    from kmunet_tpu.nn.dagem import DAGEM
    from kmunet_tpu.nn.fused_vim import FusedDirectionViM
    from kmunet_tpu.nn.resample import DySample
    from kmunet_tpu.nn.wavelet import IntelligentWaveletPooling
    from kmunet_tpu.ops.sample import resize_bilinear
    from kmunet_tpu.utils.profiler import chained_time_ms

    B = 128
    key = jax.random.PRNGKey(1)

    def u(h, c):
        return jax.random.uniform(key, (B, h, h, c), jnp.bfloat16)

    def tm(mod, *xs, **kw):
        v = bf16_tree(jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *xs, **kw))())

        def f(*xs):
            out = mod.apply(v, *xs, **kw)
            return out[0] if isinstance(out, tuple) else out

        return chained_time_ms(f, *xs, iters=10)

    for impl in ("fused", "separate"):
        for hw, c in ((128, 16), (64, 32), (32, 64)):
            ms = tm(EnhancedViMBlock(state_dim=16, impl=impl), u(hw, c))
            log(f"modules EnhViM[{impl}] C{c}@{hw}^2: {ms:.2f} ms")
    log("modules FusedDirectionViM C16@128^2: %.2f ms" % tm(FusedDirectionViM(), u(128, 16)))
    log("modules KAN C16@128^2: %.2f ms" % tm(StableHybridKANConv(16), u(128, 16)))
    log("modules IWP @128^2C16: %.2f ms" % tm(IntelligentWaveletPooling(), u(128, 16)))
    log("modules LCA @64^2C16: %.2f ms" % tm(LocalContrastAttention(), u(64, 16)))
    log("modules DAGEM @16^2C64: %.2f ms" % tm(DAGEM(), u(16, 64)))
    feats = [u(32, 16), u(32, 32), u(32, 32)]
    log("modules MSF @32^2: %.2f ms" % tm(MultiScaleFusion(channels=(16, 32, 32)), feats))
    e1 = u(64, 16)
    for d_hw in (32, 128):
        ms = chained_time_ms(
            lambda a: resize_bilinear(a, (d_hw, d_hw), align_corners=True), e1, iters=10)
        log(f"modules resize 64->{d_hw}: {ms:.2f} ms")
    for hw, c in ((16, 64), (32, 64), (64, 64)):
        ms = tm(DySample(scale=2, style="lp", groups=4), u(hw, c))
        log(f"modules DySample C{c} {hw}->{2*hw}: {ms:.2f} ms")


def stage_dysample():
    import kmunet_tpu.ops.sample as S
    from kmunet_tpu.nn.resample import DySample
    from kmunet_tpu.utils.profiler import chained_time_ms

    B = 128
    key = jax.random.PRNGKey(0)
    for hw, c in ((16, 64), (32, 64), (64, 64)):
        x = jax.random.uniform(key, (B, hw, hw, c), jnp.bfloat16)
        mod = DySample(scale=2, style="lp", groups=4)
        v = bf16_tree(jax.jit(lambda: mod.init(jax.random.PRNGKey(1), x))())
        ms_k = chained_time_ms(lambda a: mod.apply(v, a), x, iters=10)
        S.USE_PALLAS_GATHER = False
        try:
            ms_x = chained_time_ms(lambda a: mod.apply(v, a), x, iters=10)
        finally:
            S.USE_PALLAS_GATHER = None
        log(f"dysample C{c} {hw}->{2*hw}: kernel {ms_k:.2f} ms, xla {ms_x:.2f} ms")


def stage_trajgru():
    import bench

    bench.measure_zoo(only={"trajgru"})


def stage_mamba():
    """Full train step (fwd+bwd+adamw) on Mamba-UNet: the reverse-scan
    Pallas backward is what makes this shape fit + go fast."""
    import optax

    import bench
    from kmunet_tpu.models import zoo
    from kmunet_tpu.configs.base import ModelConfig

    for B in (16, 64):
        model = zoo.build(ModelConfig(name="mamba_unet", num_classes=20))
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, 128, 128, 5), jnp.bfloat16)
        tgt = jax.random.uniform(jax.random.PRNGKey(1), (B, 128, 128, 20), jnp.bfloat16)
        v = jax.jit(model.init)(jax.random.PRNGKey(2), jnp.zeros((1, 128, 128, 5)))
        params = bf16_tree(v["params"])
        tx = optax.adamw(1e-3)
        opt = jax.jit(tx.init)(params)

        def step(params, opt, x, tgt):
            def loss_fn(p):
                out = model.apply({"params": p}, x)
                return jnp.mean((out.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        try:
            dt = bench._chain_time(
                lambda p, o, xx, tt: step(p, o, xx, tt)[0], params, opt, x, tgt)
            log(f"mamba train-step B{B}: {dt*1e3:.1f} ms -> {B*20/dt:.0f} frames/s/chip (fwd+bwd+opt)")
        except Exception as e:  # OOM at B64 was the round-2 failure mode
            log(f"mamba train-step B{B}: FAILED {type(e).__name__}: {e}")


def stage_flagship_train():
    """Full KM_UNetV3_SH train step (hybrid loss + AdamW + cosine, the
    reference recipe) at 128^2 bf16 compute — training frames/s/chip."""
    import bench
    from kmunet_tpu.configs import shanghai_km_unet
    from kmunet_tpu.train.engine import (
        build_loss, build_model, build_optimizer, init_state, make_train_step)

    for B, remat in ((32, False), (64, True)):
        cfg = shanghai_km_unet()
        cfg.data.name = "synthetic"
        cfg.data.img_size = 128
        cfg.data.batch_size = B
        cfg.train.compute_dtype = "bfloat16"
        cfg.train.remat = remat
        model = build_model(cfg)
        loss_fn = build_loss(cfg)
        tx = build_optimizer(cfg, steps_per_epoch=16)
        state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
        batch = jax.random.uniform(
            jax.random.PRNGKey(1), (B, cfg.data.seq_len, 128, 128), jnp.float32)
        step = make_train_step(model, loss_fn, tx, cfg)

        try:
            # chained timing via state reuse: each iteration's state feeds the
            # next; read a scalar at the end
            import time as _t

            s, _ = step(state, batch, jax.random.PRNGKey(2))  # compile+warm
            n = 8
            t0 = _t.time()
            for i in range(n):
                s, m = step(s, batch, jax.random.PRNGKey(3 + i))
            _ = float(m["loss"])
            dt = (_t.time() - t0) / n
            log(f"flagship-train B{B} remat={remat}: {dt*1e3:.1f} ms/step -> "
                f"{B*20/dt:.0f} train frames/s/chip (loss {float(m['loss']):.4f})")
        except Exception as e:
            log(f"flagship-train B{B} remat={remat}: FAILED {type(e).__name__}: {e}")


STAGES = {
    "sanity": stage_sanity,
    "flagship": stage_flagship,
    "flagship_train": stage_flagship_train,
    "modules": stage_modules,
    "dysample": stage_dysample,
    "trajgru": stage_trajgru,
    "mamba": stage_mamba,
}


def main():
    want = sys.argv[1:] or list(STAGES)
    log("devices:", jax.devices())
    failed = []
    for name in want:
        log(f"=== stage {name} ===")
        try:
            STAGES[name]()
        except Exception as e:  # one-shot autorun window: never lose the
            import traceback    # remaining stages to one failure

            failed.append(name)
            log(f"stage {name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
    log("ALL DONE" + (f" (failed: {','.join(failed)})" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
