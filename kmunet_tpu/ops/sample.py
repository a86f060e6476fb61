"""Bilinear resampling ops shared by DySample, deformable conv and TrajGRU warp.

These replace the reference's native CUDA gathers (`F.grid_sample` at
DySample_md.py:60 / models/TrajGru.py:56, `torchvision.ops.DeformConv2d` at
DAGEM_md.py:46) with a single XLA-compilable bilinear gather over NHWC
tensors. The gather is expressed as 4 advanced-index reads + a weighted sum;
XLA lowers it to TPU gathers, and the surrounding convs stay on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

# Border-mode fast path: MXU-matmul bilinear kernel (kernels/bilinear_pallas).
# None = auto (TPU + 16-bit dtypes only); True/False to force. The kernel is
# GSPMD/shardy-partitionable (custom_partitioning: output/coords shard over
# batch and output rows; the source image all-gathers over 'spatial'), so it
# composes with data AND spatial mesh sharding.
USE_PALLAS_GATHER: bool | None = None


def bilinear_gather(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample ``img`` at continuous pixel coordinates ``(x, y)``.

    Args:
      img: ``(B, H, W, C)``.
      x, y: ``(B, Ho, Wo)`` pixel-space coordinates (x along W, y along H),
        where integer coordinates land exactly on pixel centers.
      padding_mode: "border" (clamp) or "zeros" (out-of-range reads 0).

    Returns:
      ``(B, Ho, Wo, C)``.

    Implementation note (TPU): instead of 4 separate row-gathers (one per
    bilinear tap) we pre-concatenate the 2x2 neighborhood into a 4C-channel
    image via cheap shifts and do ONE ``take_along_axis`` with a 4x-wider
    contiguous innermost dim — TPU gathers move whole rows, so one wide
    gather beats four narrow ones.
    """
    if USE_PALLAS_GATHER is not False:
        from kmunet_tpu.kernels import bilinear_pallas

        if USE_PALLAS_GATHER or bilinear_pallas.supported(img.shape, img.dtype):
            if padding_mode == "border":
                return bilinear_pallas.gather_bilinear_border(img, x, y)
            return bilinear_pallas.gather_bilinear_zeros(img, x, y)

    return bilinear_gather_xla(img, x, y, padding_mode)


def bilinear_gather_grouped(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Per-group bilinear sample (the DySample layout, DySample_md.py:58-60).

    Channel block ``g`` of ``img`` (B, H, W, C) is sampled at its own coords
    ``x[:, g], y[:, g]`` ((B, G, Ho, Wo) pixel space); returns (B, Ho, Wo, C).

    Fast path: the group-aware Pallas kernel — ONE call over the full
    channel width. Folding groups into the batch axis instead multiplies
    the kernel's tile-row count (and VPU weight-row construction) by G:
    measured 76 vs 39 ms at the dec3 DySample shape (B128 64^2 C64 G4).
    """
    G = x.shape[1]
    if USE_PALLAS_GATHER is not False:
        from kmunet_tpu.kernels import bilinear_pallas

        if USE_PALLAS_GATHER or bilinear_pallas.supported_grouped(
                img.shape, G, img.dtype):
            return bilinear_pallas.gather_bilinear_grouped(
                img, x, y, zeros=(padding_mode == "zeros"))

    return bilinear_gather_grouped_xla(img, x, y, padding_mode)


def bilinear_gather_grouped_xla(img, x, y, padding_mode="border"):
    """Non-dispatching grouped gather (batch-folded). Shared by the runtime
    fallback above AND the Pallas kernel's custom VJP — one body, so the
    forward-fallback semantics can never drift from the kernel's backward."""
    B, H, W, C = img.shape
    G = x.shape[1]
    Cg = C // G
    Ho, Wo = x.shape[2:]
    xg = img.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W, Cg)
    out = bilinear_gather_xla(
        xg, x.reshape(B * G, Ho, Wo), y.reshape(B * G, Ho, Wo), padding_mode)
    return out.reshape(B, G, Ho, Wo, Cg).transpose(0, 2, 3, 1, 4).reshape(B, Ho, Wo, C)


def dysample_window_upsample(
    x: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    radius: int = 2,
) -> jnp.ndarray:
    """DySample ×s upsampling as (2r+1)² dense shifted multiply-adds.

    Every output pixel ``(s*i+di, s*j+dj)`` samples the source at
    ``(i, j) + e`` where ``e`` = static sub-pixel init (±(s-1)/2s, so within
    ±0.5) + 0.25×learned offset (DySample_md.py:45-61). While ``|e| < r``
    the two bilinear taps per axis live in the (2r+1)² source neighborhood
    of ``(i, j)`` and the gather collapses to

        out = Σ_{dy,dx ∈ [-r, r]} w(dy) w(dx) ⊙ nearest_up(shift(src, dy, dx))
        w(d) = relu(1 − |e − d|)   (the bilinear hat evaluated per tap)

    — dense edge-padded shifts, each a VPU multiply-add that XLA fuses; no
    gather rows, no MXU padding waste, and the backward is equally dense
    (shift transposes + segment-sums), replacing the scatter-add /
    transposed-kernel VJP entirely. vs the grouped matmul-formulation
    Pallas kernel at the dec3 DySample shape (B128 64²→128² C64 G4 bf16):
    that kernel runs AT its padded-MXU-FLOP limit (73.6 ms, BASELINE.md
    r4); this formulation is bandwidth-bound (~1-2 ms roofline).

    The default r=2 covers every DySample instance of the round-4 trained
    flagship WITH margin — measured max |learned offset| per instance
    (scripts/measure_dysample_offsets.py, ckpt step 1264): dec1 0.52,
    dec2 1.11, dec3 0.61 px, all < 2 (r=1's |e|<1 domain would SATURATE
    dec2 — the bound is a per-checkpoint measurement, not a law).

    Semantics note: ``e`` is clamped to (−r, r) so out-of-window offsets
    saturate at the window edge instead of sampling further away — the
    ONLY deviation from the exact path, and only for |learned offset| >
    r − 0.25 px. Border-clamp (grid_sample padding_mode='border',
    align_corners=False) is reproduced exactly: absolute coords are
    clamped to [0, size-1] first, so edge taps degenerate exactly like
    the reference's.

    Args:
      x: ``(B, h, w, C)`` source.
      ex, ey: ``(B, h, w, s, s, G)`` per-group fractional offsets of output
        subpixel (di, dj) relative to source cell (i, j) — i.e. sample coord
        = (i + ey, j + ex) in pixel space.
      radius: window radius r; exact for |e| < r.

    Returns:
      ``(B, s*h, s*w, C)``.
    """
    B, h, w, C = x.shape
    s, G = ex.shape[3], ex.shape[5]
    cg = C // G
    r = int(radius)
    f32 = jnp.float32
    eps = 1e-3  # keep the taps strictly inside the window
    ii = jnp.arange(h, dtype=f32)[None, :, None, None, None, None]
    jj = jnp.arange(w, dtype=f32)[None, None, :, None, None, None]
    # border clamp in absolute coords, then window clamp of the residual
    ey = jnp.clip(jnp.clip(ii + ey.astype(f32), 0, h - 1) - ii, -r + eps, r - eps)
    ex = jnp.clip(jnp.clip(jj + ex.astype(f32), 0, w - 1) - jj, -r + eps, r - eps)

    # Everything below stays in plain NHWC (B,h,w,C) tensors: one
    # accumulation per output subpixel (di,dj), then a single interleave.
    # An earlier draft broadcast over a 7-D (B,h,s,w,s,G,cg) layout; XLA
    # assigned those pathological tilings with 4x padding expansion and the
    # TRAIN step (stored bwd activations) OOMed at B32 — 10x 512M HLO temps
    # for 128M of data (round-5 bench OOM report). (2r+1)^2 * s^2 dense
    # VPU multiply-adds on standard layouts instead.
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    subs = []
    for di in range(s):
        for dj in range(s):
            eyd = ey[:, :, :, di, dj, :]               # (B,h,w,G)
            exd = ex[:, :, :, di, dj, :]
            acc = None
            for dy in range(-r, r + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(eyd - dy))
                for dx in range(-r, r + 1):
                    wgt = wy * jnp.maximum(0.0, 1.0 - jnp.abs(exd - dx))
                    # group-blocked channel broadcast: C index = g*cg + c
                    wgt = jnp.repeat(wgt.astype(x.dtype), cg, axis=-1)
                    src = xp[:, r + dy:r + dy + h, r + dx:r + dx + w, :]
                    term = wgt * src                   # (B,h,w,C)
                    acc = term if acc is None else acc + term
            subs.append(acc)
    # (s*s,B,h,w,C) -> (B,h,s_i,w,s_j,C) -> (B,sh,sw,C)
    out = jnp.stack(subs).reshape(s, s, B, h, w, C)
    out = out.transpose(2, 3, 0, 4, 1, 5)
    return out.reshape(B, s * h, s * w, C)


def bilinear_gather_multiview(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample ONE source at G coordinate sets (the TrajGRU warp layout,
    models/TrajGru.py:39-57).

    ``img`` (B, H, W, C) sampled at ``x[:, g], y[:, g]`` ((B, G, Ho, Wo)
    pixel space); returns (B, Ho, Wo, G*C), view g in channel block g.

    Fast path: the shared-source Pallas kernel — the source block is DMA'd
    once per tile instead of once per batch-folded view, and the G-fold HBM
    broadcast of the source disappears.
    """
    G = x.shape[1]
    if USE_PALLAS_GATHER is not False:
        from kmunet_tpu.kernels import bilinear_pallas

        if USE_PALLAS_GATHER or bilinear_pallas.supported_multiview(
                img.shape, G, img.dtype):
            return bilinear_pallas.gather_bilinear_multiview(
                img, x, y, zeros=(padding_mode == "zeros"))

    return bilinear_gather_multiview_xla(img, x, y, padding_mode)


def bilinear_gather_multiview_xla(img, x, y, padding_mode="border"):
    """Non-dispatching multiview gather (source broadcast into the batch).
    Shared by the runtime fallback above AND the Pallas kernel's custom VJP."""
    B, H, W, C = img.shape
    G, Ho, Wo = x.shape[1:]
    rep = jnp.broadcast_to(img[:, None], (B, G, H, W, C)).reshape(B * G, H, W, C)
    out = bilinear_gather_xla(
        rep, x.reshape(B * G, Ho, Wo), y.reshape(B * G, Ho, Wo), padding_mode)
    return out.reshape(B, G, Ho, Wo, C).transpose(0, 2, 3, 1, 4).reshape(
        B, Ho, Wo, G * C)


def bilinear_gather_xla(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Pure-XLA gather formulation (no Pallas dispatch). The Pallas kernel's
    custom VJP differentiates THIS function — routing its backward through
    the dispatching ``bilinear_gather`` would re-enter the kernel's own
    transpose and recurse without bound (hit in practice the first time
    bf16 *training* activated the kernel: the trace never terminated)."""
    B, H, W, C = img.shape
    Ho, Wo = x.shape[1:3]

    if padding_mode == "border":
        # Pre-clamping the *coordinates* is exactly equivalent to the
        # reference's per-tap index clamp: for x < 0 both give img[..., 0]
        # (weights collapse onto the duplicated border pixel), ditto x > W-1.
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(img.dtype)[..., None]
        wy = (y - y0).astype(img.dtype)[..., None]
        x0i = x0.astype(jnp.int32)  # in [0, W-1]
        y0i = y0.astype(jnp.int32)  # in [0, H-1]
        # 2x2 patch image with edge-clamped shifts: channel blocks are
        # [v00 | v01 | v10 | v11] at the gather point (y0, x0).
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        row0 = jnp.concatenate([img, right], axis=-1)
        row1 = jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)
        patches = jnp.concatenate([row0, row1], axis=-1)  # (B,H,W,4C)
        idx = (y0i * W + x0i).reshape(B, Ho * Wo, 1)
        v = jnp.take_along_axis(patches.reshape(B, H * W, 4 * C), idx, axis=1)
        v = v.reshape(B, Ho, Wo, 4, C)
        v00, v01, v10, v11 = v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :]
    else:  # zeros
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(img.dtype)[..., None]
        wy = (y - y0).astype(img.dtype)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        # Zero-pad one ring so taps one step outside read true zeros; clamp
        # the gather index into the padded range and mask every tap (masks
        # also kill the aliased values of far-outside indices).
        imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Hp, Wp = H + 2, W + 2
        right = jnp.concatenate([imgp[:, :, 1:], imgp[:, :, -1:]], axis=2)
        row0 = jnp.concatenate([imgp, right], axis=-1)
        row1 = jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)
        patches = jnp.concatenate([row0, row1], axis=-1)  # (B,Hp,Wp,4C)
        xg = jnp.clip(x0i + 1, 0, Wp - 2)
        yg = jnp.clip(y0i + 1, 0, Hp - 2)
        idx = (yg * Wp + xg).reshape(B, Ho * Wo, 1)
        v = jnp.take_along_axis(patches.reshape(B, Hp * Wp, 4 * C), idx, axis=1)
        v = v.reshape(B, Ho, Wo, 4, C)

        def mask(yi, xi):
            inside = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            return inside[..., None].astype(img.dtype)

        v00 = v[..., 0, :] * mask(y0i, x0i)
        v01 = v[..., 1, :] * mask(y0i, x0i + 1)
        v10 = v[..., 2, :] * mask(y0i + 1, x0i)
        v11 = v[..., 3, :] * mask(y0i + 1, x0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def resize_bilinear(
    img: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear resize of NHWC images with torch ``F.interpolate`` semantics.

    The reference resizes skip features with ``align_corners=True``
    (KM_UNetV3_SH.py:493-495) and upsamples the LAPS decoder the same way
    (KM_UNetV3_LAPS.py decoder Upsample blocks).
    """
    B, H, W, _ = img.shape
    Ho, Wo = size
    if (H, W) == (Ho, Wo):
        return img
    cdt = jnp.float32  # coord/weight math in fp32 (bf16 coords lose pixels)
    if align_corners:
        ys = jnp.arange(Ho, dtype=cdt) * ((H - 1) / max(Ho - 1, 1))
        xs = jnp.arange(Wo, dtype=cdt) * ((W - 1) / max(Wo - 1, 1))
    else:
        ys = (jnp.arange(Ho, dtype=cdt) + 0.5) * (H / Ho) - 0.5
        xs = (jnp.arange(Wo, dtype=cdt) + 0.5) * (W / Wo) - 0.5
        ys = jnp.clip(ys, 0, H - 1)
        xs = jnp.clip(xs, 0, W - 1)

    # Axis-aligned resize is SEPARABLE: out = Ry @ img @ Rx^T with constant
    # interpolation matrices R[o, i] = max(0, 1 - |coord[o] - i|) (exactly
    # the two bilinear taps per row; border clamp is implicit because coords
    # are already in-range). Two MXU matmuls that XLA folds/fuses — no
    # per-pixel weight-row construction, natively differentiable (the
    # transpose matmuls ARE the gradient) — vs the generic gather path,
    # which builds (tile, H)+(tile, W) weight rows from coords per call.
    ry = jnp.maximum(1.0 - jnp.abs(ys[:, None] - jnp.arange(H, dtype=cdt)[None]), 0.0)
    rx = jnp.maximum(1.0 - jnp.abs(xs[:, None] - jnp.arange(W, dtype=cdt)[None]), 0.0)
    t = jnp.einsum("oh,bhwc->bowc", ry.astype(img.dtype), img)
    return jnp.einsum("pw,bowc->bopc", rx.astype(img.dtype), t)


def grid_sample_bilinear(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """``F.grid_sample``-compatible bilinear sampling (NHWC).

    Args:
      img: ``(B, H, W, C)``.
      grid: ``(B, Ho, Wo, 2)`` normalized coords in [-1, 1]; ``grid[..., 0]``
        is x (width axis), ``grid[..., 1]`` is y (height axis) — same layout
        as torch.
      align_corners: coordinate convention. False maps -1/1 to the outer
        pixel-edge (torch default in DySample); True maps them to the first
        and last pixel centers (TrajGRU's ``wrap`` uses True semantics via
        its own mesh, see models/TrajGru.py:39-57).
    """
    B, H, W, _ = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    # torch border padding clamps the *unnormalized* coords into the valid
    # pixel-center range before interpolation weights are computed.
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    return bilinear_gather(img, x, y, padding_mode=padding_mode)
