"""KANLinear / KANConv2d parity vs numpy re-derivations of the reference
semantics (convKAN/KANlayers.py:652-660, KANConv2Dlayers.py:15-37)."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.nn.kan import KANLinear, KANConv2d
from tests.test_spline import numpy_bsplines


def _silu(x):
    return x / (1.0 + np.exp(-x))


def test_kanlinear_matches_oracle(rng):
    in_f, out_f, batch = 12, 7, 32
    x = rng.uniform(-1.2, 1.2, (batch, in_f)).astype(np.float32)
    mod = KANLinear(features=out_f)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params["params"])
    grid = np.arange(-3, 9) * (2.0 / 5.0) - 1.0
    grid = np.broadcast_to(grid, (in_f, 12))
    basis = numpy_bsplines(x.astype(np.float64), grid, 3)  # (B, in, 8)
    scaled = p["spline_weight"] * p["spline_scaler"][:, None, :]
    want = _silu(x.astype(np.float64)) @ p["base_weight"] + np.einsum(
        "bif,ifo->bo", basis, scaled
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_kanconv_matches_unfold_oracle(rng):
    """KANConv2d == zero-pad -> unfold -> KANLinear over (C*k*k) features."""
    B, H, W, C, out_c, k, pad = 2, 8, 8, 3, 5, 3, 1
    x = rng.uniform(-1.0, 1.0, (B, H, W, C)).astype(np.float32)
    mod = KANConv2d(features=out_c, kernel_size=k, padding=pad)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params["params"])
    base_k = p["base_kernel"].astype(np.float64)      # (k,k,C,out)
    spline_k = p["spline_kernel"].astype(np.float64)  # (k,k,C,8,out)
    scaler = p["spline_scaler"].astype(np.float64)    # (k,k,C,out)
    scaled = spline_k * scaler[..., None, :]

    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))).astype(np.float64)
    grid = np.broadcast_to(np.arange(-3, 9) * 0.4 - 1.0, (1, 12))
    want = np.zeros((B, H, W, out_c))
    for i in range(H):
        for j in range(W):
            patch = xp[:, i : i + k, j : j + k, :]  # (B,k,k,C)
            basis = numpy_bsplines(patch.reshape(B, -1, 1)[..., 0].reshape(-1, 1), grid, 3)
            basis = basis.reshape(B, k, k, C, 8)
            want[:, i, j, :] = (
                np.einsum("bklc,klco->bo", _silu(patch), base_k)
                + np.einsum("bklcf,klcfo->bo", basis, scaled)
            )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_kanconv_jits_and_grads(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    mod = KANConv2d(features=8, kernel_size=3, padding=1)
    params = mod.init(jax.random.PRNGKey(2), x)

    def loss(p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
