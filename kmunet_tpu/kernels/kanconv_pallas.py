"""Fused ConvKAN Pallas kernel — the hottest op in KM_UNetV3.

The XLA path (nn/kan.py) materializes the C*8-channel B-spline basis in HBM
(~16x the activation bytes round-trip) and then convolves it. This kernel
evaluates the cardinal cubic basis *in VMEM per tile* and contracts base +
spline branches as 9 shifted MXU matmuls — x is read ~3x, out written once,
zero basis HBM traffic (SURVEY.md §7 hard-part #1).

Design (Mosaic-friendly, no manual DMA):
- The host wrapper materializes K row-shifted views of the padded input
  (XLA slices); each is blocked *disjointly* as (1, TH, Wp, C), sidestepping
  Pallas' no-overlapping-blocks rule and unaligned-lane DMA restrictions.
- Inside the kernel, per row-shift the basis (TH, Wp, C*nb) is evaluated
  once (lane dim C*nb is 128-aligned for C in {16, 32, 64}); the K column
  shifts are cyclic ``pltpu.roll``s on the sublane axis followed by an
  aligned [0:W) slice (the roll never wraps into the used region because
  Wp = W + 2*pad).
- basis channels are *basis-major* (b*C + c): each shifted cardinal spline
  writes one contiguous C-slice; the wrapper permutes the spline kernel to
  match.

Gradients: custom VJP whose backward is the XLA formulation's autodiff
(identical math), so training uses the fused forward too.

Perf status (v5e, B8@256^2 C16->F16): XLA fast-basis path 4.2 ms, this
kernel 8.9 ms. The XLA path is HBM-roofline on basis traffic but the kernel
is MXU-starved: F=16 output channels use 12.5% of MXU lanes and VMEM limits
(3 double-buffered row views) cap tiles at TH=4. nn/kan.KANConv2d therefore
defaults to the XLA path; this kernel is kept correct + tested (interpret
mode in CI, parity 1e-6 on TPU) as the base for round-2 tuning
(bf16 basis, channel-padded single-view DMA, fused base+spline weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID_SIZE = 5
ORDER = 3
N_BASIS = GRID_SIZE + ORDER
LO, HI = -1.0, 1.0
H_KNOT = (HI - LO) / GRID_SIZE


def _basis_piece(t):
    """Cubic cardinal B-spline M4 on [0,4) (matches ops/spline.py)."""
    t2 = t * t
    t3 = t2 * t
    p0 = t3 * (1.0 / 6.0)
    p1 = (-3.0 * t3 + 12.0 * t2 - 12.0 * t + 4.0) * (1.0 / 6.0)
    p2 = (3.0 * t3 - 24.0 * t2 + 60.0 * t - 44.0) * (1.0 / 6.0)
    p3 = (4.0 - t) ** 3 * (1.0 / 6.0)
    out = jnp.where(t < 1.0, p0, jnp.where(t < 2.0, p1, jnp.where(t < 3.0, p2, p3)))
    return jnp.where((t >= 0.0) & (t < 4.0), out, 0.0)


def _kernel(*refs, TH, W, C, F, K):
    x_refs = refs[:K]               # K row-shifted views, each (1, TH, Wp, C)
    base_k_ref, sk_ref, out_ref = refs[K], refs[K + 1], refs[K + 2]

    acc = jnp.zeros((TH * W, F), jnp.float32)
    for kh in range(K):
        x = x_refs[kh][0]           # (TH, Wp, C)
        u = (x - LO) * (1.0 / H_KNOT) + ORDER
        # One lane-aligned (TH, Wp, C*nb) basis array (separate per-basis
        # C-lane arrays each pad to 128 lanes and blow VMEM). pltpu.repeat
        # tiles, so the layout is basis-major (b*C + c); offsets = lane // C
        # and the wrapper permutes the spline kernel to match.
        u_rep = pltpu.repeat(u, N_BASIS, axis=2)
        b_off = (
            jax.lax.broadcasted_iota(jnp.int32, u_rep.shape, 2) // C
        ).astype(u_rep.dtype)
        basis = _basis_piece(u_rep - b_off)
        silu = x * jax.nn.sigmoid(x)
        Wp = W + K - 1
        for kw in range(K):
            # left-roll by kw == right-roll by Wp-kw (pltpu.roll needs >= 0)
            bs = pltpu.roll(basis, Wp - kw, 1)[:, :W, :] if kw else basis[:, :W, :]
            acc += jnp.dot(
                bs.reshape(TH * W, C * N_BASIS), sk_ref[kh, kw],
                preferred_element_type=jnp.float32,
            )
            sx = pltpu.roll(silu, Wp - kw, 1)[:, :W, :] if kw else silu[:, :W, :]
            acc += jnp.dot(
                sx.reshape(TH * W, C), base_k_ref[kh, kw],
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc.reshape(TH, W, F)


def _pick_tile(H: int, W: int, C: int) -> int:
    budget = 6 * 2**20
    c_pad = max(C, 128)  # lane padding for the K x-views and silu
    for th in (64, 32, 16, 8, 4, 2, 1):
        if H % th:
            continue
        bytes_needed = th * (W + 2) * 4 * (3 * C * N_BASIS + 5 * c_pad)
        if bytes_needed < budget:
            return th
    return 1


def kanconv_reference(xp, base_k, sk_flat):
    """XLA formulation over the padded input (c-major flat basis) — used as
    the VJP backward and in parity tests."""
    from kmunet_tpu.ops.spline import cardinal_bspline_basis_flat

    dn = ("NHWC", "HWIO", "NHWC")
    basis = cardinal_bspline_basis_flat(xp, GRID_SIZE, ORDER)
    base = jax.lax.conv_general_dilated(
        jax.nn.silu(xp), base_k, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    spline = jax.lax.conv_general_dilated(
        basis, sk_flat, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return base + spline


def _c_to_b_major(sk_flat, C):
    """(k,k,C*nb,F) c-major -> (k,k,nb*C,F) basis-major."""
    k1, k2, _, F = sk_flat.shape
    return (
        sk_flat.reshape(k1, k2, C, N_BASIS, F)
        .transpose(0, 1, 3, 2, 4)
        .reshape(k1, k2, C * N_BASIS, F)
    )


def _forward(xp, base_k, sk_flat):
    B, Hp, Wp, C = xp.shape
    K = base_k.shape[0]
    F = base_k.shape[-1]
    H, W = Hp - K + 1, Wp - K + 1
    TH = _pick_tile(H, W, C)
    sk_b = _c_to_b_major(sk_flat, C)

    # K row-shifted views: view kh covers input rows [kh, kh+H).
    views = [jax.lax.slice_in_dim(xp, kh, kh + H, axis=1) for kh in range(K)]

    kern = functools.partial(_kernel, TH=TH, W=W, C=C, F=F, K=K)
    view_spec = pl.BlockSpec(
        (1, TH, Wp, C), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // TH),
        in_specs=[view_spec] * K + [
            pl.BlockSpec((K, K, C, F), lambda b, h: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, C * N_BASIS, F), lambda b, h: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, F), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(*views, base_k, sk_b)


@jax.custom_vjp
def fused_kanconv(xp, base_k, sk_flat):
    """Fused ConvKAN over a pre-padded NHWC input (stride 1).

    Args: xp (B, H+2p, W+2p, C) fp32; base_k (K,K,C,F); sk_flat (K,K,C*8,F)
    with channel-major (c*8+b) basis layout (as stored by nn/kan.KANConv2d).
    Returns (B, H, W, F) fp32.
    """
    return _forward(xp, base_k, sk_flat)


def _fwd(xp, base_k, sk_flat):
    return fused_kanconv(xp, base_k, sk_flat), (xp, base_k, sk_flat)


def _bwd(res, g):
    xp, base_k, sk_flat = res
    _, vjp = jax.vjp(kanconv_reference, xp, base_k, sk_flat)
    return vjp(g)


fused_kanconv.defvjp(_fwd, _bwd)
