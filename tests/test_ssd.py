"""HSM-SSD parity vs a numpy re-derivation of the reference algebra
(vim_block_init/efficient_vim_init.py:33-61)."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.nn.ssd import HSMSSD, EfficientViMBlock


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def test_hsmssd_matches_oracle(rng):
    B, side, C, N = 2, 8, 16, 8
    L = side * side
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    mod = HSMSSD(d_model=C, state_dim=N)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, h = mod.apply(params, jnp.asarray(x))
    y, h = np.asarray(y), np.asarray(h)

    p = jax.tree.map(np.asarray, params["params"])
    xb = x.astype(np.float64)
    bcdt = xb @ p["BCdt_proj_kernel"]  # (B, L, 3N)
    # depthwise 3x3 SAME conv on (B, side, side, 3N)
    bc = bcdt.reshape(B, side, side, 3 * N)
    kern = p["dw_kernel"]  # (3,3,1,3N)
    pad = np.pad(bc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    conv = np.zeros_like(bc)
    for kh in range(3):
        for kw in range(3):
            conv += pad[:, kh : kh + side, kw : kw + side, :] * kern[kh, kw, 0, :]
    bcdt = conv.reshape(B, L, 3 * N)
    Bm, Cm, dt = bcdt[..., :N], bcdt[..., N : 2 * N], bcdt[..., 2 * N :]
    A = _softmax(dt + p["A"][None, None, :], axis=1)
    h_c = np.einsum("blc,bln->bnc", xb, A * Bm)
    hz = h_c @ p["hz_proj"]["kernel"]
    h1, z = hz[..., :C], hz[..., C:]
    h2 = (h1 * _silu(z) + h1 * p["D"][0]) @ p["out_proj"]["kernel"]
    y_want = np.einsum("bnc,bln->blc", h2, Cm).reshape(B, side, side, C)

    np.testing.assert_allclose(y, y_want, atol=1e-4)
    np.testing.assert_allclose(h, h2, atol=1e-4)


def test_efficient_vim_block_near_identity_at_init(rng):
    """alpha=1e-4 => sigmoid ~= 0.5; BN-zero-init kills dwconv/FFN branches,
    so the block output stays finite and shape-preserving."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    mod = EfficientViMBlock(dim=8, state_dim=16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_efficient_vim_block_train_updates_bn(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    mod = EfficientViMBlock(dim=4, state_dim=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, mutated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(y)).all()
