"""Antialiased bilinear resize (host-side, numpy).

The reference resizes (25, 565, 784) uint8 frame stacks with torchvision
``transforms.Resize`` (Shanghai.py:31-33), whose tensor path is bilinear with
antialias — a triangle (tent) filter whose support scales with the
downsampling ratio. This is a separable exact re-derivation: for each output
axis we build a sparse row-weight matrix and apply it as two matmuls, which
also makes the whole resize one BLAS call per axis on the host.
"""

from __future__ import annotations

import numpy as np


def _triangle_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) antialiased bilinear weight matrix.

    Exact replication of PIL's resample weight computation (which
    torchvision's antialiased tensor path also matches): triangle filter of
    support ``scale``, window clipped to the image and renormalized.
    """
    scale = max(in_size / out_size, 1.0)
    step = in_size / out_size
    support = scale  # bilinear filter support 1.0 * scale
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * step
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        idx = np.arange(xmin, xmax)
        w = 1.0 - np.abs((idx + 0.5 - center) / scale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            W[i, xmin:xmax] = w / s
    return W


class Resizer:
    """Caches the weight matrices for a fixed (in, out) shape pair.

    Two execution paths, identical math:

    - numpy fallback: the dense two-matmul einsum below;
    - native fast path (`kmunet_tpu.native`): the triangle filter touches at
      most ~ceil(2*scale)+1 taps per output row/col, so the C++ core applies
      the weights in *banded* form — ~60x fewer FLOPs at (565, 784)->(128,
      128) — and `resize_scaled` additionally fuses the uint8 decode + value
      scale (the reference's frames/255, Shanghai.py:48) into the row pass,
      never materializing the float32 source stack.
    """

    def __init__(self, in_hw: tuple[int, int], out_hw: tuple[int, int]):
        self.in_hw = in_hw
        self.out_hw = out_hw
        self._wh = _triangle_weights(in_hw[0], out_hw[0]).astype(np.float32)
        self._ww = _triangle_weights(in_hw[1], out_hw[1]).astype(np.float32).T
        self._banded: dict[float, tuple] = {}

    def _banded_weights(self, scale: float) -> tuple:
        """Banded (row, col) weights with `scale` folded into the row taps."""
        if scale not in self._banded:
            from kmunet_tpu import native

            wh, hs = native.to_banded(self._wh * np.float32(scale))
            ww, ws = native.to_banded(self._ww.T)
            self._banded[scale] = (wh, hs, ww, ws)
        return self._banded[scale]

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """frames: (..., H, W) float array -> (..., Ho, Wo)."""
        if frames.dtype == np.float32:
            y = self.resize_scaled(frames, 1.0)
            if y is not None:
                return y
        lead = frames.shape[:-2]
        x = frames.reshape(-1, *self.in_hw)
        y = np.einsum("oh,nhw,wp->nop", self._wh, x, self._ww, optimize=True)
        return y.reshape(*lead, *self.out_hw)

    def resize_scaled(self, frames: np.ndarray, scale: float):
        """Native fused scale+resize of uint8/float32 frames; None = no lib."""
        from kmunet_tpu import native

        if tuple(frames.shape[-2:]) != tuple(self.in_hw):
            return None  # let the caller's numpy path raise a clean error
        return native.banded_resize(frames, *self._banded_weights(scale))


def resize_bilinear_antialias(frames: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    return Resizer(frames.shape[-2:], out_hw)(frames)
