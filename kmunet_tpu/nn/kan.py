"""Kolmogorov-Arnold (KAN) layers, TPU-native formulation.

Re-derivation of the reference KANLinear/KANConv2d semantics
(`/root/reference/convKAN/KANlayers.py:505-660`,
`convKAN/KANConv2Dlayers.py:5-37`):

    KANLinear(x) = silu(x) @ W_base + B(x) @ (W_spline * scaler)
    KANConv2d    = unfold(x) -> KANLinear over (C*k*k) patch features

where B(x) is a degree-3 B-spline basis (8 functions per feature) over a
uniform grid on [-1, 1].

TPU design — no im2col. Because the basis is evaluated *pointwise* on input
values, the spline term of the conv factorizes into

    spline_out = Conv( basis(x) as C*8 channels, kernel (k, k, C*8, out) )

so the whole op is two MXU convs (base + spline) over a zero-padded input.
Zero padding is applied to the *input before basis evaluation* — the
reference's unfold pads with zeros and then evaluates the basis on them, and
basis(0) != 0, so padding the basis channels instead would diverge at the
borders.

The reference's update_grid / regularization_loss exist but are never invoked
by any training script (SURVEY.md C1); the grid is therefore a static uniform
knot vector here (functional update_grid lives in ops/spline.py, and the
regularizer is the free function ``kan_regularization_loss`` below — JAX
losses are functions of params, not module methods).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.spline import bspline_basis, cardinal_bspline_basis_flat


def _knots(grid_size: int, spline_order: int, grid_range=(-1.0, 1.0)) -> jnp.ndarray:
    lo, hi = grid_range
    h = (hi - lo) / grid_size
    return jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=jnp.float32) * h + lo


def _spline_noise_init(grid_size, spline_order, scale_noise, grid_range=(-1.0, 1.0)):
    """curve2coeff-style init (KANlayers.py:555-575): fit the spline to small
    uniform noise at the interior grid points, via min-norm least squares."""

    knots = _knots(grid_size, spline_order, grid_range)
    interior = knots[spline_order:-spline_order]  # (grid_size+1,)
    n_basis = grid_size + spline_order

    def init(key, shape, dtype=jnp.float32):
        # shape: (..., n_basis, out) with leading feature dims.
        *feat, nb, out = shape
        assert nb == n_basis
        n_feat = math.prod(feat) if feat else 1
        noise = (jax.random.uniform(key, (grid_size + 1, n_feat, out)) - 0.5) * (
            scale_noise / grid_size
        )
        # Basis matrix at the interior points (same for every feature).
        A = bspline_basis(interior[:, None], knots[None, :], spline_order)[:, 0, :]
        # (grid_size+1, n_basis); min-norm LSQ solution per feature/output.
        pinv = jnp.linalg.pinv(A)  # (n_basis, grid_size+1)
        coeff = jnp.einsum("bg,gfo->fbo", pinv, noise)  # (n_feat, n_basis, out)
        return coeff.reshape(*feat, nb, out).astype(dtype)

    return init


class KANLinear(nn.Module):
    """Spline-KAN dense layer over the trailing feature axis."""

    features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    base_activation: Callable = jax.nn.silu
    grid_range: tuple[float, float] = (-1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        n_basis = self.grid_size + self.spline_order
        knots = _knots(self.grid_size, self.spline_order, self.grid_range)

        base_w = self.param(
            "base_weight", kaiming_uniform_torch(), (in_features, self.features)
        )
        spline_w = self.param(
            "spline_weight",
            _spline_noise_init(self.grid_size, self.spline_order, self.scale_noise, self.grid_range),
            (in_features, n_basis, self.features),
        )
        scaler = self.param(
            "spline_scaler", kaiming_uniform_torch(), (in_features, self.features)
        )

        base = jnp.dot(self.base_activation(x), base_w)
        basis = bspline_basis(x, knots[None, :], self.spline_order)  # (..., in, nb)
        scaled = spline_w * scaler[:, None, :]
        spline = jnp.einsum("...ib,ibo->...o", basis, scaled)
        return base + spline


def kan_regularization_loss(
    params, regularize_activation: float = 1.0, regularize_entropy: float = 1.0
):
    """Spline L1 + entropy regularizer, summed over every KAN layer in ``params``.

    Exactly the reference's KANLinear.regularization_loss
    (`/root/reference/convKAN/KANlayers.py:711-731`): per layer,
    ``l1 = |W_spline|.mean(basis axis)``, activation term = ``l1.sum()``,
    entropy term = ``-sum(p log p)`` with ``p = l1 / l1.sum()`` — computed on
    the RAW spline weight (the standalone scaler is not included, matching
    the reference). Works on any param pytree: KANLinear (``spline_weight``,
    (in, nb, out) — basis axis 1) and KANConv2d (``spline_kernel``,
    (k, k, C, nb, out) — basis axis -2) leaves are found by key; everything
    else is ignored. Returns 0.0 if the tree holds no KAN layers.
    """
    total = jnp.zeros((), jnp.float32)
    found = False

    def walk(node):
        nonlocal total, found
        if not isinstance(node, dict):
            return
        for key, leaf in node.items():
            if key in ("spline_weight", "spline_kernel"):
                found = True
                l1 = jnp.abs(leaf.astype(jnp.float32)).mean(axis=-2)
                act = l1.sum()
                p = l1 / act
                ent = -jnp.sum(p * jnp.log(p))
                total = total + regularize_activation * act + regularize_entropy * ent
            else:
                walk(leaf)

    walk(params if not hasattr(params, "unfreeze") else params.unfreeze())
    return total if found else jnp.zeros((), jnp.float32)


class KANConv2d(nn.Module):
    """KAN convolution: per-patch spline-KAN linear, as two MXU convs (NHWC).

    Exactly the reference's unfold->KANLinear->fold pipeline
    (KANConv2Dlayers.py:15-37), refactored so XLA tiles it onto the MXU:
    the base branch is Conv(silu(x)); the spline branch expands x to C*n_basis
    pointwise basis channels and runs one conv.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    base_activation: Callable = jax.nn.silu
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 for AMP

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k = self.kernel_size
        n_basis = self.grid_size + self.spline_order

        base_k = self.param(
            "base_kernel", kaiming_uniform_torch(), (k, k, C, self.features)
        )
        spline_k = self.param(
            "spline_kernel",
            _spline_noise_init(self.grid_size, self.spline_order, self.scale_noise),
            (k, k, C, n_basis, self.features),
        )
        scaler = self.param(
            "spline_scaler", kaiming_uniform_torch(), (k, k, C, self.features)
        )

        p = self.padding
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0))) if p else x

        # Uniform-grid fast path: all bases as shifts of one cardinal cubic,
        # evaluated directly in (B, H, W, C*n_basis) lane-packed layout.
        basis = cardinal_bspline_basis_flat(xp, self.grid_size, self.spline_order)
        sk = (spline_k * scaler[..., None, :]).reshape(k, k, C * n_basis, self.features)
        base_in = self.base_activation(xp)

        cd = self.compute_dtype
        if cd is not None:
            basis, sk = basis.astype(cd), sk.astype(cd)
            base_in, base_k = base_in.astype(cd), base_k.astype(cd)

        # No preferred_element_type: the MXU accumulates bf16 convs in fp32
        # anyway, and a widened output dtype breaks the conv transpose rule
        # under AMP (fp32 cotangent vs bf16 kernel).
        dn = ("NHWC", "HWIO", "NHWC")
        base = jax.lax.conv_general_dilated(
            base_in, base_k, (self.stride, self.stride), "VALID",
            dimension_numbers=dn,
        )
        spline = jax.lax.conv_general_dilated(
            basis, sk, (self.stride, self.stride), "VALID", dimension_numbers=dn,
        )
        return (base + spline).astype(x.dtype)
