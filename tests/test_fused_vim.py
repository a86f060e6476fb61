"""FusedDirectionViM == separate DirectionViM branches (nn/fused_vim.py).

The fused (B, H, W, 3C) chain must reproduce the separate three-branch
EnhancedViMBlock bit-for-bit-ish at fp32 (same math, re-laid-out), for both
conv packings, in eval and under grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmunet_tpu.models.km_unet import EnhancedViMBlock
from kmunet_tpu.nn.fused_vim import fuse_direction_params, unfuse_direction_params

OUTER = ("Dense_0", "Dense_1", "norm", "Conv_0", "Conv_1")


def _fused_variables(fused_block, x, sep_vars):
    vf = fused_block.init(jax.random.PRNGKey(1), x)
    conv = fuse_direction_params(
        {"params": sep_vars["params"], "batch_stats": sep_vars.get("batch_stats", {})}
    )
    params = dict(vf["params"])
    params["directions"] = conv["params"]
    for k in OUTER:
        params[k] = sep_vars["params"][k]
    out = {"params": params}
    if conv["batch_stats"]:
        out["batch_stats"] = {"directions": conv["batch_stats"]}
    return out


@pytest.mark.parametrize("packing", ["grouped", "blockdiag"])
def test_fused_matches_separate_eval(rng, packing):
    B, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    sep = EnhancedViMBlock(state_dim=16, impl="separate")
    vs = sep.init(jax.random.PRNGKey(0), x)
    y_sep = sep.apply(vs, x)

    fused = EnhancedViMBlock(state_dim=16, impl="fused", packing=packing)
    vf = _fused_variables(fused, x, vs)
    y_fused = fused.apply(vf, x)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_sep), rtol=1e-5, atol=2e-5)


def test_fused_grads_match_separate(rng):
    B, H, W, C = 1, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    sep = EnhancedViMBlock(state_dim=16, impl="separate")
    vs = sep.init(jax.random.PRNGKey(0), x)
    fused = EnhancedViMBlock(state_dim=16, impl="fused")
    vf = _fused_variables(fused, x, vs)

    # d(loss)/dx must agree — the parameter trees differ in layout but the
    # function of x is the same.
    g_sep = jax.grad(lambda xx: jnp.sum(sep.apply(vs, xx) ** 2))(x)
    g_fus = jax.grad(lambda xx: jnp.sum(fused.apply(vf, xx) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_fus), np.asarray(g_sep), rtol=1e-4, atol=1e-4)


def test_fused_train_mode_updates_batch_stats(rng):
    B, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    blk = EnhancedViMBlock(state_dim=16, impl="fused")
    v = blk.init(jax.random.PRNGKey(0), x)
    y, mut = blk.apply(
        v, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == x.shape
    # dw-conv BN means must have moved off their zero init
    m = mut["batch_stats"]["directions"]["bn1"]["mean"]
    assert float(jnp.abs(m).max()) > 0.0


def test_default_impl_is_separate():
    # 'separate' measured faster than 'fused' at the full-model level on the
    # real v5e (183.3 vs 206.3 ms @ B128 128^2 bf16, 2026-08-19): XLA lowers
    # the stacked chain's grouped convs worse than three fusable plain convs.
    assert EnhancedViMBlock(state_dim=16).impl == "separate"


def test_unfuse_roundtrip_is_exact(rng):
    """fuse -> unfuse must be the identity (bit-exact): the reverse
    migration restores fused-window checkpoints into the 'separate'
    default layout (ADVICE r3)."""
    B, H, W, C = 1, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    sep = EnhancedViMBlock(state_dim=16, impl="separate")
    vs = sep.init(jax.random.PRNGKey(0), x)
    # run one train step so batch_stats are non-trivial
    _, mut = sep.apply(vs, x, True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(2)})
    vs = {"params": vs["params"], "batch_stats": mut["batch_stats"]}
    back = unfuse_direction_params(fuse_direction_params(vs))
    for b in ("height_block", "width_block", "channel_block"):
        for col, orig in (("params", vs["params"]), ("batch_stats", vs["batch_stats"])):
            want = jax.tree.leaves(orig[b])
            got = jax.tree.leaves(back[col][b])
            assert len(want) == len(got), (b, col)
            for w, g in zip(want, got):
                np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_fused_init_distribution_matches_separate():
    """Fresh fused init must carry the separate path's init conventions —
    in particular the zero-initialized BN scales on the dwconv residual
    stages (bn_weight_init=0, nn/ssd.py dwconv1/2) and on the FFN's second
    BN, so from-scratch training dynamics match the reference."""
    x = jnp.zeros((1, 8, 8, 16))
    blk = EnhancedViMBlock(state_dim=16, impl="fused")
    v = blk.init(jax.random.PRNGKey(0), x)
    d = v["params"]["directions"]
    for name, want in [("bn1", 0.0), ("bn2", 0.0), ("ffn_bn2", 0.0), ("ffn_bn1", 1.0)]:
        got = np.asarray(d[name]["scale"])
        np.testing.assert_array_equal(got, np.full_like(got, want), err_msg=name)
