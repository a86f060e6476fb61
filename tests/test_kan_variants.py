"""Alt-KAN basis layers: shape/grad smoke + formula spot checks vs numpy
re-derivations of KANlayers.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.nn.kan_variants import (
    ChebyKANLayer,
    FastKANLayer,
    FasterKANLayer,
    GRAMLayer,
    JacobiKANLayer,
    PatchKANConv2d,
    RBFKANLayer,
    ReLUKANLayer,
    WavKANLayer,
)

ALL = [
    ChebyKANLayer(features=6, degree=4),
    FastKANLayer(features=6),
    FasterKANLayer(features=6),
    GRAMLayer(features=6),
    JacobiKANLayer(features=6, degree=4),
    ReLUKANLayer(features=6),
    RBFKANLayer(features=6),
]


@pytest.mark.parametrize("mod", ALL, ids=lambda m: type(m).__name__)
def test_variant_shapes_and_grads(rng, mod):
    x = jnp.asarray(rng.uniform(-1, 1, (8, 12)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (8, 6)
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_wavkan_all_types(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (8, 12)).astype(np.float32))
    for wt in ("mexican_hat", "morlet", "dog", "meyer", "shannon"):
        mod = WavKANLayer(features=6, wavelet_type=wt)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == (8, 6), wt
        assert np.isfinite(np.asarray(y)).all(), wt


def test_cheby_formula(rng):
    """y = sum_d cos(d*acos(clamp(x))) @ coeffs (KANlayers.py:134-154)."""
    x = rng.uniform(-1.5, 1.5, (4, 3)).astype(np.float32)
    mod = ChebyKANLayer(features=2, degree=3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    coeffs = np.asarray(params["params"]["cheby_coeffs"])
    xc = np.clip(x, -1, 1)
    basis = np.cos(np.arccos(xc)[..., None] * np.arange(4))
    want = np.einsum("bid,iod->bo", basis, coeffs)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rswaf_backward_quirk(rng):
    """FasterKAN's custom backward scales dL/dx by inv_denominator even
    though the forward ignores it (convKAN/utils.py:38-69)."""
    from kmunet_tpu.nn.kan_variants import _rswaf

    x = jnp.asarray(rng.uniform(-1, 1, (4,)).astype(np.float32))
    grid = jnp.linspace(-1.2, 0.2, 8)

    g_half = jax.grad(lambda v: jnp.sum(_rswaf(v, grid, 0.5)))(x)
    g_one = jax.grad(lambda v: jnp.sum(_rswaf(v, grid, 1.0)))(x)
    np.testing.assert_allclose(np.asarray(g_half), np.asarray(g_one) * 0.5, atol=1e-6)


def test_patch_conv_wrapper(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)).astype(np.float32))
    mod = PatchKANConv2d(layer=ChebyKANLayer(features=5, degree=3),
                         kernel_size=3, padding=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (2, 8, 8, 5)
