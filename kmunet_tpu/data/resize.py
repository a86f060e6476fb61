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
    """(out_size, in_size) antialiased bilinear weight matrix."""
    scale = in_size / out_size
    support = max(scale, 1.0)
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.floor(centers - support).astype(int)
    hi = np.ceil(centers + support).astype(int)
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        idx = np.arange(lo[i], hi[i] + 1)
        d = np.abs((idx - centers[i]) / support)
        w = np.clip(1.0 - d, 0.0, None)
        idxc = np.clip(idx, 0, in_size - 1)
        total = w.sum()
        for j, wj in zip(idxc, w / total):
            W[i, j] += wj
    return W


class Resizer:
    """Caches the weight matrices for a fixed (in, out) shape pair."""

    def __init__(self, in_hw: tuple[int, int], out_hw: tuple[int, int]):
        self.in_hw = in_hw
        self.out_hw = out_hw
        self._wh = _triangle_weights(in_hw[0], out_hw[0]).astype(np.float32)
        self._ww = _triangle_weights(in_hw[1], out_hw[1]).astype(np.float32).T

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """frames: (..., H, W) float array -> (..., Ho, Wo)."""
        lead = frames.shape[:-2]
        x = frames.reshape(-1, *self.in_hw)
        y = np.einsum("oh,nhw,wp->nop", self._wh, x, self._ww, optimize=True)
        return y.reshape(*lead, *self.out_hw)


def resize_bilinear_antialias(frames: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    return Resizer(frames.shape[-2:], out_hw)(frames)
