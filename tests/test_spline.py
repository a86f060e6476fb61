"""Golden tests for the B-spline basis vs a numpy re-derivation of the
reference Cox-de-Boor recursion (convKAN/KANlayers.py:577-610)."""

import numpy as np
import jax.numpy as jnp

from kmunet_tpu.ops import bspline_basis, make_uniform_grid


def numpy_bsplines(x, grid, spline_order):
    # Direct numpy transcription of the reference recursion semantics.
    x = x[..., None]
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(np.float64)
    for k in range(1, spline_order + 1):
        bases = (
            (x - grid[:, : -(k + 1)])
            / (grid[:, k:-1] - grid[:, : -(k + 1)])
            * bases[:, :, :-1]
        ) + (
            (grid[:, k + 1 :] - x)
            / (grid[:, k + 1 :] - grid[:, 1 : (-k)])
            * bases[:, :, 1:]
        )
    return bases


def test_grid_matches_reference_construction():
    grid = np.asarray(make_uniform_grid(3, grid_size=5, spline_order=3))
    h = 2.0 / 5.0
    expected = np.arange(-3, 5 + 3 + 1) * h + (-1.0)
    assert grid.shape == (3, 12)
    np.testing.assert_allclose(grid[0], expected, atol=1e-7)


def test_basis_matches_numpy_oracle(rng):
    in_features, batch = 7, 64
    grid = make_uniform_grid(in_features, grid_size=5, spline_order=3)
    x = rng.uniform(-1.3, 1.3, size=(batch, in_features)).astype(np.float32)
    got = np.asarray(bspline_basis(jnp.asarray(x), grid, spline_order=3))
    want = numpy_bsplines(x, np.asarray(grid, dtype=np.float64), 3)
    assert got.shape == (batch, in_features, 8)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_update_grid_preserves_function(rng):
    """After refitting the grid to data, the spline must reproduce (in
    least-squares sense) the same outputs on the samples (KANlayers.py:662-709)."""
    from kmunet_tpu.ops.spline import update_grid

    in_f, out_f, batch = 4, 3, 256
    grid = make_uniform_grid(in_f)
    w = jnp.asarray(rng.normal(size=(in_f, 8, out_f)).astype(np.float32) * 0.3)
    # samples inside the representable range of the old grid
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(batch, in_f)).astype(np.float32))

    old = jnp.einsum("bif,ifo->bio", bspline_basis_j(x, grid), w)
    new_grid, new_w = update_grid(x, grid, w)
    new = jnp.einsum("bif,ifo->bio", bspline_basis_j(x, new_grid), new_w)
    err = float(jnp.abs(new - old).max())
    assert err < 0.1, err  # LSQ refit residual; same in reference
    # new interior knots cover the sample range
    assert float(new_grid[:, 3].max()) <= float(x.min()) + 0.05
    assert float(new_grid[:, -4].min()) >= float(x.max()) - 0.05


def bspline_basis_j(x, grid):
    return bspline_basis(x, grid, 3)


def test_basis_partition_of_unity(rng):
    """Inside the core grid range a B-spline basis sums to 1."""
    grid = make_uniform_grid(4, grid_size=5, spline_order=3)
    x = rng.uniform(-0.99, 0.99, size=(128, 4)).astype(np.float32)
    b = np.asarray(bspline_basis(jnp.asarray(x), grid, 3))
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-4)
