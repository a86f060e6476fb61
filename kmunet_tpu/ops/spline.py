"""B-spline basis evaluation for KAN layers.

Re-derivation of the Cox-de-Boor recursion used by the reference KANLinear
(`/root/reference/convKAN/KANlayers.py:577-610`): a degree-``spline_order``
B-spline basis over a uniform grid of ``grid_size`` intervals on
``grid_range``, extended by ``spline_order`` knots on each side.

TPU notes: the recursion has a fixed small depth (order 3), so we unroll it
statically; every step is an elementwise VPU op over the trailing basis axis.
The degree-0 seed is a half-open interval indicator, which we keep bitwise
identical to the reference (``x >= g_i and x < g_{i+1}``) so values outside
``[-1, 1 + eps)`` produce the same (decaying) extrapolation behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_uniform_grid(
    in_features: int,
    grid_size: int = 5,
    spline_order: int = 3,
    grid_range: tuple[float, float] = (-1.0, 1.0),
) -> jnp.ndarray:
    """Uniform extended knot grid, shape ``(in_features, grid_size + 2*order + 1)``.

    Matches the reference buffer construction (KANlayers.py:526-535):
    ``grid[i] = grid_range[0] + i*h`` for ``i in [-order, grid_size+order]``
    with ``h = (hi - lo)/grid_size``, replicated per input feature (the
    per-feature copy exists so ``update_grid`` can adapt each feature
    independently).
    """
    lo, hi = grid_range
    h = (hi - lo) / grid_size
    knots = jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=jnp.float32) * h + lo
    return jnp.broadcast_to(knots, (in_features, knots.shape[0]))


def bspline_basis(x: jnp.ndarray, grid: jnp.ndarray, spline_order: int = 3) -> jnp.ndarray:
    """Evaluate the B-spline basis functions at ``x``.

    Args:
      x: ``(..., in_features)`` input values.
      grid: ``(in_features, grid_size + 2*order + 1)`` knot grid.
      spline_order: spline degree k (statically unrolled).

    Returns:
      ``(..., in_features, grid_size + spline_order)`` basis values.
    """
    x = x[..., None]  # (..., F, 1)
    # Degree-0: half-open interval indicators (reference KANlayers.py:593).
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - x) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases
