"""Host input pipeline: sharded, prefetching, double-buffered to device.

Replaces the reference's torch DataLoader workers (train_shanghai.py:370-392).
Design:

- **Per-host sharding**: each JAX process reads only its slice of the index
  space (`process_index`/`process_count`), so multi-host DCN never carries
  raw data. ``batch_size`` is the PER-PROCESS batch; under multi-process JAX
  the global batch is ``batch_size * process_count``.
- **Background prefetch**: a worker-thread pool decodes/resizes items into a
  bounded result queue while the previous step runs (consumer blocks on the
  queue — no polling).
- **Global-array assembly**: with a ``sharding``, batches become global
  ``jax.Array``s. Single-process: ``jax.device_put``. Multi-process:
  ``jax.make_array_from_process_local_data`` — a plain ``device_put`` of
  host-local numpy would NOT form a global array across processes (each
  process only has addressable shards of its own data).
- **Double-buffered device transfer**: up to ``prefetch`` assembled batches
  are enqueued ahead, overlapping host->HBM DMA with compute.
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
        if stop == 0:
            return

        work_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 4)
        result_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 4)
        # Abandoned iteration (e.g. engine --max_steps breaking mid-epoch)
        # closes this generator; the finally below sets `halt` so feeder and
        # workers blocked on the bounded queues drain out instead of leaking.
        halt = threading.Event()

        def _put(q, item) -> bool:
            while not halt.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            while not halt.is_set():
                j = work_q.get()
                if j is None:
                    return
                if not _put(result_q, (j, self.dataset[int(idx[j])])):
                    return

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        def feeder():
            for j in range(stop):
                if not _put(work_q, j):
                    return
            for _ in threads:
                if not _put(work_q, None):
                    return

        threading.Thread(target=feeder, daemon=True).start()

        # Workers finish out of order; reorder via a stash keyed by index,
        # blocking on the result queue (no sleep/poll loop).
        try:
            stash: dict[int, np.ndarray] = {}
            out = []
            j = 0
            while j < stop:
                while j not in stash:
                    k, item = result_q.get()
                    stash[k] = item
                out.append(stash.pop(j))
                j += 1
                if len(out) == self.batch_size or (j == stop and out and not self.drop_last):
                    yield np.stack(out)
                    out = []
        finally:
            halt.set()
            # Unblock workers parked on work_q.get.
            for _ in threads:
                try:
                    work_q.put_nowait(None)
                except queue.Full:
                    pass

    def _to_device(self, batch: np.ndarray):
        if self.sharding is None:
            return batch
        if self._pc > 1:
            # Host-local numpy -> global jax.Array: each process contributes
            # its shard; the global batch axis is batch_size * process_count.
            return jax.make_array_from_process_local_data(self.sharding, batch)
        return jax.device_put(batch, self.sharding)

    def __iter__(self):
        self._epoch += 1
        buf = collections.deque()
        for batch in self._batches():
            buf.append(self._to_device(batch))
            if len(buf) > self.prefetch:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
