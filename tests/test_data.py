"""Data layer tests: Shanghai HDF5 reader (synthetic file), LAPS windows,
resize parity, loader sharding/prefetch."""

import numpy as np
import pytest
import jax

from kmunet_tpu.data import DataLoader, LAPSDataset, ShanghaiDataset, SyntheticNowcastDataset, split_indices
from kmunet_tpu.data.resize import resize_bilinear_antialias

h5py = pytest.importorskip("h5py")


@pytest.fixture()
def shanghai_h5(tmp_path, rng):
    """Synthetic file with the reference layout (Shanghai.py:26,45-46)."""
    path = str(tmp_path / "shanghai.h5")
    with h5py.File(path, "w") as f:
        for group, n in [("train", 6), ("test", 3)]:
            g = f.create_group(group)
            g.create_dataset("all_len", data=n)
            for i in range(n):
                g.create_dataset(str(i), data=rng.integers(0, 71, (25, 64, 96), dtype=np.uint8))
    return path


def test_shanghai_reader(shanghai_h5):
    ds = ShanghaiDataset(shanghai_h5, img_size=32, group="train", native_hw=(64, 96))
    assert len(ds) == 6
    item = ds[0]
    assert item.shape == (25, 32, 32)
    assert item.dtype == np.float32
    assert 0.0 <= item.min() and item.max() <= 71 / 255 + 1e-6
    ds.close()


def test_split_indices_contiguous():
    tr, va, te = split_indices(10)
    assert list(tr) == [0, 1, 2, 3, 4, 5]
    assert list(va) == [6, 7]
    assert list(te) == [8, 9]


def test_resize_antialias_constant_preserved(rng):
    x = np.full((3, 64, 96), 0.37, np.float32)
    y = resize_bilinear_antialias(x, (32, 32))
    np.testing.assert_allclose(y, 0.37, atol=1e-5)


def test_resize_matches_pil_if_available(rng):
    PIL = pytest.importorskip("PIL.Image")
    x = (rng.random((48, 64)) * 255).astype(np.float32)
    got = resize_bilinear_antialias(x[None], (24, 24))[0]
    import PIL.Image as Image

    want = np.asarray(
        Image.fromarray(x).resize((24, 24), Image.BILINEAR), dtype=np.float32
    )
    np.testing.assert_allclose(got, want, atol=0.25)  # PIL uses fixed-point


def test_laps_windows(rng):
    vil = rng.random((30, 16, 16)).astype(np.float32)
    tr = LAPSDataset(vil=vil, group_size=8, split="train")
    te = LAPSDataset(vil=vil, group_size=8, split="test")
    assert tr[0].shape == (8, 16, 16)
    np.testing.assert_array_equal(tr[1], vil[1:9])
    assert len(tr) + len(te) < 30  # val in between


def test_dataloader_shards_and_batches():
    ds = SyntheticNowcastDataset(length=16, img_size=16, seq_len=4)
    l0 = DataLoader(ds, batch_size=2, process_index=0, process_count=2, num_workers=2)
    l1 = DataLoader(ds, batch_size=2, process_index=1, process_count=2, num_workers=2)
    b0 = [b for b in l0]
    b1 = [b for b in l1]
    assert len(b0) == len(b1) == 4
    assert b0[0].shape == (2, 4, 16, 16)
    # disjoint shards
    assert not np.allclose(np.asarray(b0[0]), np.asarray(b1[0]))


def test_dataloader_shuffles_between_epochs():
    ds = SyntheticNowcastDataset(length=8, img_size=8, seq_len=3)
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=1, num_workers=1)
    e1 = next(iter(dl))
    e2 = next(iter(dl))
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_dataloader_abandoned_iteration_drains_threads():
    # Breaking out of an epoch (engine --max_steps) closes the batch
    # generator; feeder + workers parked on the bounded queues must drain
    # rather than leak blocked threads holding decoded items.
    import threading
    import time

    before = threading.active_count()
    ds = SyntheticNowcastDataset(length=64, img_size=8, seq_len=3)
    dl = DataLoader(ds, batch_size=2, num_workers=4, prefetch=0)
    it = iter(dl)
    next(it)
    it.close()  # triggers GeneratorExit inside the pipeline generators
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"leaked {threading.active_count() - before} loader threads")
