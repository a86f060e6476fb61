"""Shape/behavior tests for DAGEM, IWP and attention blocks (the reference's
per-module __main__ smoke blocks, systematized — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.nn import (
    DAGEM,
    IntelligentWaveletPooling,
    ChannelAttention,
    LocalContrastAttention,
    MultiScaleFusion,
    TripleNorm,
    DirectionAttention,
)
from kmunet_tpu.ops.dwt import haar_dwt2d


def test_iwp_halves_resolution_and_matches_formula(rng):
    B, H, W, C = 2, 16, 16, 4
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    mod = IntelligentWaveletPooling()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert y.shape == (B, H // 2, W // 2, C)

    # Softmax over the single attention channel is exactly 1 => the fusion
    # input is [LL, mean(high)] (iwp.py:127-130 quirk).
    LL, LH, HL, HH = haar_dwt2d(jnp.asarray(x))
    high = jnp.concatenate([LH, HL, HH], axis=-1)
    combined = jnp.concatenate([LL, jnp.mean(high, -1, keepdims=True)], axis=-1)
    k = params["params"]["fusion_conv"]["kernel"]
    b = params["params"]["fusion_conv"]["bias"]
    want = np.einsum("bhwi,io->bhwo", np.asarray(combined), np.asarray(k)[0, 0]) + np.asarray(b)
    np.testing.assert_allclose(y, want, atol=1e-4)


def test_dagem_shapes_and_finite(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    mod = DAGEM()
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, mutated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert "batch_stats" in mutated


def test_dagem_edge_shift_is_circular(rng):
    """The reference builds edges with wrap-around shifts (DAGEM_md.py:64-67);
    verify sensitivity of output to the opposite border pixel."""
    x = np.zeros((1, 8, 8, 16), np.float32)
    x[0, 0, 0, :] = 1.0  # activate one corner
    mod = DAGEM()
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    x2 = x.copy()
    x2[0, 7, 0, :] = 2.0  # opposite border along H: circular neighbor of row 0
    y1 = mod.apply(variables, jnp.asarray(x))
    y2 = mod.apply(variables, jnp.asarray(x2))
    # Row 0 output must change: its "up" edge wraps to row 7.
    assert float(jnp.abs(y1[0, 0] - y2[0, 0]).max()) > 0


def test_attention_blocks_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    for mod in [ChannelAttention(4), LocalContrastAttention(4), TripleNorm(),
                DirectionAttention("height")]:
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == x.shape, type(mod)
        assert np.isfinite(np.asarray(y)).all(), type(mod)


def test_lca_blend_formula(rng):
    """LCA output is x*(1-g)+g with g from the grouped-channel SE MLP
    (KM_UNetV3_SH.py:349-368)."""
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    mod = LocalContrastAttention(reduction_ratio=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    p = jax.tree.map(np.asarray, params["params"])
    avg = x.mean((1, 2)).reshape(2, 2, 4).mean(-1)  # (B, C/r)
    h = np.maximum(avg @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"], 0)
    g = 1 / (1 + np.exp(-(h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"])))
    want = x * (1 - g[:, None, None, :]) + g[:, None, None, :]
    np.testing.assert_allclose(y, want, atol=1e-4)


def test_multiscale_fusion_shapes(rng):
    feats = [
        jnp.asarray(rng.normal(size=(2, 16, 16, c)).astype(np.float32))
        for c in (16, 32, 32)
    ]
    mod = MultiScaleFusion(channels=(16, 32, 32))
    variables = mod.init(jax.random.PRNGKey(0), feats)
    y = mod.apply(variables, feats)
    assert y.shape == (2, 16, 16, 32)
