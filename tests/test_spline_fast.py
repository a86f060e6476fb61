"""Cardinal fast-path basis must exactly match the Cox-de-Boor recursion."""

import numpy as np
import jax.numpy as jnp

from kmunet_tpu.ops.spline import bspline_basis, cardinal_bspline_basis_flat, make_uniform_grid


def test_cardinal_matches_coxdeboor(rng):
    C, nb = 6, 8
    x = rng.uniform(-1.5, 1.5, size=(4, 10, C)).astype(np.float32)
    grid = make_uniform_grid(C)
    slow = np.asarray(bspline_basis(jnp.asarray(x), grid, 3))  # (4,10,C,8)
    fast = np.asarray(cardinal_bspline_basis_flat(jnp.asarray(x)))  # (4,10,C*8)
    fast = fast.reshape(4, 10, C, nb)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_cardinal_at_zero_padding_value(rng):
    """x=0 is the zero-padding value in KANConv — must match exactly."""
    x = np.zeros((1, 3), np.float32)
    grid = make_uniform_grid(3)
    slow = np.asarray(bspline_basis(jnp.asarray(x), grid, 3))
    fast = np.asarray(cardinal_bspline_basis_flat(jnp.asarray(x))).reshape(1, 3, 8)
    np.testing.assert_allclose(fast, slow, atol=1e-6)
