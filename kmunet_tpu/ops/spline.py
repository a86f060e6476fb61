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


def cardinal_bspline_basis_flat(
    x: jnp.ndarray,
    grid_size: int = 5,
    spline_order: int = 3,
    grid_range: tuple[float, float] = (-1.0, 1.0),
) -> jnp.ndarray:
    """Fast uniform-grid basis: (..., C) -> (..., C * (grid_size+order)).

    On a *uniform* knot grid every B-spline basis function is a shift of one
    cardinal spline: ``B_b(x) = M_{k+1}(u - b)`` with ``u = (x - lo)/h +
    order`` and ``M_4`` the cubic cardinal B-spline (support [0, 4)). This
    evaluates all 8 bases with the basis axis *flattened into channels* —
    a (..., C*8) layout whose trailing dim packs TPU lanes — instead of the
    5D (..., C, 8) layout, which pads the 8-wide axis to 128 lanes (a 16x
    memory blowup; measured 40x slower at 256^2).

    Exactly equals ``bspline_basis`` with a uniform grid (same half-open
    interval convention); only cubic order is implemented (the only order
    the reference uses).
    """
    if spline_order != 3:
        raise NotImplementedError("cardinal fast path implements cubic only")
    lo, hi = grid_range
    h = (hi - lo) / grid_size
    n_basis = grid_size + spline_order
    *lead, C = x.shape

    u = (x - lo) / h + spline_order  # basis b supported on u in [b, b+4)
    t = u[..., None] - jnp.arange(n_basis, dtype=x.dtype)
    t = t.reshape(*lead, C * n_basis)

    # Cubic cardinal B-spline M4 on [0,4), piecewise:
    #   [0,1): t^3/6
    #   [1,2): (-3t^3 + 12t^2 - 12t + 4)/6
    #   [2,3): (3t^3 - 24t^2 + 60t - 44)/6
    #   [3,4): (4-t)^3/6
    t2 = t * t
    t3 = t2 * t
    p0 = t3 * (1.0 / 6.0)
    p1 = (-3.0 * t3 + 12.0 * t2 - 12.0 * t + 4.0) * (1.0 / 6.0)
    p2 = (3.0 * t3 - 24.0 * t2 + 60.0 * t - 44.0) * (1.0 / 6.0)
    p3 = (4.0 - t) ** 3 * (1.0 / 6.0)
    out = jnp.where(t < 1.0, p0, jnp.where(t < 2.0, p1, jnp.where(t < 3.0, p2, p3)))
    return jnp.where((t >= 0.0) & (t < 4.0), out, 0.0)


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
