"""Shanghai radar HDF5 dataset.

Re-derivation of `/root/reference/Shanghai.py:15-50,99-126`:

- File layout: ``f['train'|'test']['all_len']`` scalar plus one dataset per
  string index, each ``(25, 565, 784) uint8``.
- Per item: ``frames / 255.0`` then antialiased-bilinear resize to
  ``(img_size, img_size)``; item shape ``(25, S, S)`` float32 (we drop the
  reference's redundant channel dim of 1 — the training scripts squeeze it
  right back out, train_shanghai.py:165).
- Contiguous 60/20/20 train/val/test split over the 'train' group
  (train_shanghai.py:357-362).

Design differences (intentional): one persistent read handle instead of an
h5py open per item (Shanghai.py:45), resize via a cached separable weight
matrix, and index sharding for multi-host input (each host reads only its
shard — the "distributed data loading" layer the reference lacks).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

PIXEL_SCALE = 90.0
THRESHOLDS = [20, 30, 35, 40]

from kmunet_tpu.data.resize import Resizer

# 16-color radar colormap + bounds (Shanghai.py:54-74), used by utils/vis.py.
COLOR_MAP = np.array(
    [
        [0, 0, 0, 0], [0, 236, 236, 255], [1, 160, 246, 255], [1, 0, 246, 255],
        [0, 239, 0, 255], [0, 200, 0, 255], [0, 144, 0, 255], [255, 255, 0, 255],
        [231, 192, 0, 255], [255, 144, 2, 255], [255, 0, 0, 255], [166, 0, 0, 255],
        [101, 0, 0, 255], [255, 0, 255, 255], [153, 85, 201, 255], [255, 255, 255, 255],
    ]
) / 255.0
BOUNDS = [0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60, 65, 70, 75, PIXEL_SCALE]


def split_indices(n: int, fractions=(0.6, 0.8)) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contiguous 60/20/20 split (train_shanghai.py:357-362)."""
    idx = np.arange(n)
    a = math.floor(n * fractions[0])
    b = math.floor(n * fractions[1])
    return idx[:a], idx[a:b], idx[b:]


class ShanghaiDataset:
    """Indexable dataset of (25, S, S) float32 frame stacks."""

    def __init__(
        self,
        data_path: str,
        img_size: int = 256,
        group: str = "train",
        indices: Sequence[int] | None = None,
        native_hw: tuple[int, int] = (565, 784),
    ):
        import h5py  # local import: h5py is only needed for real data

        assert group in ("train", "test", "val")
        self.group = group if group != "val" else "test"
        self._file = h5py.File(data_path, "r")
        self._grp = self._file[self.group]
        self.all_len = int(self._grp["all_len"][()])
        self.indices = np.asarray(indices) if indices is not None else np.arange(self.all_len)
        self.img_size = img_size
        self._resize = Resizer(native_hw, (img_size, img_size))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int) -> np.ndarray:
        raw = self._grp[str(int(self.indices[i]))][()]  # (25, H, W) uint8
        # Native fused decode+scale+resize (kmunet_tpu/native); the numpy
        # fallback is the same math as two dense matmuls (data/resize.py).
        y = self._resize.resize_scaled(raw, 1.0 / 255.0)
        if y is None:
            y = self._resize(raw.astype(np.float32) / 255.0)
        return y.astype(np.float32, copy=False)

    def close(self):
        self._file.close()
