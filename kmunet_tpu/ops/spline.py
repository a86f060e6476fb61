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


def update_grid(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    scaled_spline_weight: jnp.ndarray,
    spline_order: int = 3,
    grid_eps: float = 0.02,
    margin: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Re-fit the knot grid to the data distribution and re-fit spline
    weights so the represented function is preserved on the samples.

    Functional port of the reference's ``KANLinear.update_grid``
    (convKAN/KANlayers.py:662-709) — defined there but never invoked by any
    training script; provided here for API completeness.

    Args:
      x: (batch, in_features) samples.
      grid: (in_features, grid_size + 2*order + 1) current knots.
      scaled_spline_weight: (in_features, n_basis, out_features) —
        spline_weight * scaler, the effective coefficients.

    Returns:
      (new_grid, new_spline_weight) with the same shapes; the caller should
      reset the scaler to 1 (the refit absorbs it), as the reference does by
      writing into ``spline_weight`` directly.
    """
    batch, in_features = x.shape
    grid_size = grid.shape[1] - 2 * spline_order - 1

    # current spline outputs on the samples
    bases = bspline_basis(x, grid, spline_order)  # (batch, in, nb)
    unreduced = jnp.einsum("bif,ifo->bio", bases, scaled_spline_weight)

    # adaptive grid: per-feature quantiles of sorted x
    x_sorted = jnp.sort(x, axis=0)
    qi = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[qi]  # (grid_size+1, in)
    uniform_step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (
        jnp.arange(grid_size + 1, dtype=x.dtype)[:, None] * uniform_step
        + x_sorted[0]
        - margin
    )
    g = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    ext_lo = g[:1] - uniform_step * jnp.arange(spline_order, 0, -1, dtype=x.dtype)[:, None]
    ext_hi = g[-1:] + uniform_step * jnp.arange(1, spline_order + 1, dtype=x.dtype)[:, None]
    new_grid = jnp.concatenate([ext_lo, g, ext_hi], axis=0).T  # (in, K)

    # refit coefficients: per-feature min-norm lstsq of new basis -> outputs
    A = bspline_basis(x, new_grid, spline_order)  # (batch, in, nb)
    A_f = A.transpose(1, 0, 2)  # (in, batch, nb)
    B_f = unreduced.transpose(1, 0, 2)  # (in, batch, out)
    pinv = jnp.linalg.pinv(A_f)  # (in, nb, batch)
    new_w = jnp.einsum("inb,ibo->ino", pinv, B_f)
    return new_grid, new_w


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
