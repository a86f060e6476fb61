"""Host input pipeline: sharded, prefetching, double-buffered to device.

Replaces the reference's torch DataLoader workers (train_shanghai.py:370-392).
Design:

- **Per-host sharding**: each JAX process reads only its slice of the index
  space (`process_index`/`process_count`), so multi-host DCN never carries
  raw data.
- **Background prefetch**: a worker-thread pool decodes/resizes items into a
  bounded queue while the previous step runs.
- **Double-buffered device transfer**: batches are `jax.device_put` with the
  training NamedSharding up to `prefetch_to_device` steps ahead, overlapping
  host->HBM DMA with compute.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class DataLoader:
    """Minimal epoch-based loader over an indexable dataset of numpy items."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 4,
        sharding=None,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.sharding = sharding
        self.prefetch = prefetch
        self._pi = jax.process_index() if process_index is None else process_index
        self._pc = jax.process_count() if process_count is None else process_count
        self._epoch = 0

    def __len__(self):
        n = len(self._host_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _host_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idx = rng.permutation(idx)
        return idx[self._pi :: self._pc]

    def _batches(self) -> Iterator[np.ndarray]:
        idx = self._host_indices()
        n_full = len(idx) // self.batch_size
        ends = n_full * self.batch_size
        stop = ends if self.drop_last else len(idx)

        work_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 4)
        done: dict[int, np.ndarray] = {}
        lock = threading.Lock()

        def worker():
            while True:
                j = work_q.get()
                if j is None:
                    return
                item = self.dataset[int(idx[j])]
                with lock:
                    done[j] = item

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        feeder_stop = stop

        def feeder():
            for j in range(feeder_stop):
                work_q.put(j)
            for _ in threads:
                work_q.put(None)

        threading.Thread(target=feeder, daemon=True).start()

        out = []
        j = 0
        while j < stop:
            with lock:
                ready = j in done
            if ready:
                with lock:
                    out.append(done.pop(j))
                j += 1
                if len(out) == self.batch_size or (j == stop and out and not self.drop_last):
                    yield np.stack(out)
                    out = []
            else:
                threading.Event().wait(0.001)

    def __iter__(self):
        self._epoch += 1
        buf = collections.deque()
        for batch in self._batches():
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            buf.append(batch)
            if len(buf) > self.prefetch:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
