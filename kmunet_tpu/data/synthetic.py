"""Synthetic Shanghai-shaped nowcasting data.

Generates advecting-Gaussian "storm cells" so that (a) items match the real
dataset's shape/range contract — (25, S, S) float32 in [0, 1] with heavy-tail
intensities that cross the 20/30/35/40-of-90 thresholds — and (b) frames are
temporally coherent, so forecast skill (CSI/HSS) is actually learnable.
Used for end-to-end training tests and benchmarking without the real HDF5.
"""

from __future__ import annotations

import numpy as np


class SyntheticNowcastDataset:
    def __init__(
        self,
        length: int = 64,
        img_size: int = 256,
        seq_len: int = 25,
        n_cells: int = 4,
        seed: int = 0,
        cache: bool = True,
    ):
        self.length = length
        self.img_size = img_size
        self.seq_len = seq_len
        self.n_cells = n_cells
        self.seed = seed
        # Items are deterministic functions of (seed, i), so memoizing is
        # semantics-free. Without it the per-epoch regeneration (~50-100 ms
        # of numpy per item at 128^2) data-bottlenecks training on a 1-core
        # host. 512 items @ 25x128^2 fp32 ~= 84 MB.
        self._cache: dict[int, np.ndarray] | None = {} if cache else None

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> np.ndarray:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        item = self._generate(i)
        if self._cache is not None:
            self._cache[i] = item
        return item

    def _generate(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 100003 + i)
        S, T, K = self.img_size, self.seq_len, self.n_cells
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)

        pos = rng.uniform(0.1 * S, 0.9 * S, (K, 2)).astype(np.float32)
        vel = rng.uniform(-0.01 * S, 0.01 * S, (K, 2)).astype(np.float32)
        sigma = rng.uniform(0.04 * S, 0.12 * S, K).astype(np.float32)
        amp = rng.uniform(0.3, 0.95, K).astype(np.float32)
        growth = rng.uniform(-0.01, 0.01, K).astype(np.float32)

        frames = np.zeros((T, S, S), np.float32)
        for t in range(T):
            for k in range(K):
                cy, cx = pos[k] + vel[k] * t
                a = amp[k] * (1.0 + growth[k] * t)
                g = a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma[k] ** 2))
                frames[t] += g
        return np.clip(frames, 0.0, 1.0)
