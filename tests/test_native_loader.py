"""Native C++ loader core vs the dense-numpy resize formulation.

The native banded path and the numpy einsum path (data/resize.py) are the
same separable triangle-filter math; these tests pin their equivalence (and
therefore transitively the PIL/torchvision parity established for the numpy
path in test_data.py) on uint8 + float32 inputs, down- and up-sampling.
"""

import numpy as np
import pytest

from kmunet_tpu import native
from kmunet_tpu.data.resize import Resizer, _triangle_weights

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="no native toolchain (g++) available"
)


def dense_apply(frames_f32, in_hw, out_hw):
    wh = _triangle_weights(in_hw[0], out_hw[0]).astype(np.float32)
    ww = _triangle_weights(in_hw[1], out_hw[1]).astype(np.float32).T
    return np.einsum("oh,nhw,wp->nop", wh, frames_f32, ww, optimize=True)


def test_to_banded_roundtrip(rng):
    W = _triangle_weights(565, 128).astype(np.float32)
    vals, starts = native.to_banded(W)
    dense = np.zeros_like(W)
    for i in range(W.shape[0]):
        dense[i, starts[i] : starts[i] + vals.shape[1]] = vals[i]
    np.testing.assert_array_equal(dense, W)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((565, 784), (128, 128)), ((565, 784), (256, 256)), ((64, 80), (128, 160))],
)
def test_u8_fused_scale_matches_dense(rng, in_hw, out_hw):
    x = rng.integers(0, 256, (3, *in_hw), dtype=np.uint8)
    r = Resizer(in_hw, out_hw)
    got = r.resize_scaled(x, 1.0 / 255.0)
    assert got is not None and got.dtype == np.float32
    want = dense_apply(x.astype(np.float32) / 255.0, in_hw, out_hw)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_f32_matches_dense(rng):
    x = rng.standard_normal((2, 565, 784), dtype=np.float32)
    r = Resizer((565, 784), (128, 128))
    got = r.resize_scaled(x, 1.0)
    assert got is not None
    want = dense_apply(x, (565, 784), (128, 128))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resizer_call_routes_native_consistently(rng):
    # Resizer.__call__ on float32 uses the native path when available; its
    # output must match the einsum fallback (the PIL-parity-tested path).
    x = rng.standard_normal((2, 100, 120), dtype=np.float32)
    r = Resizer((100, 120), (50, 60))
    got = r(x)
    want = np.einsum("oh,nhw,wp->nop", r._wh, x, r._ww, optimize=True)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_leading_dims_preserved(rng):
    x = rng.integers(0, 256, (2, 5, 64, 80), dtype=np.uint8)
    r = Resizer((64, 80), (32, 32))
    got = r.resize_scaled(x, 1.0 / 255.0)
    assert got.shape == (2, 5, 32, 32)


def test_loader_inside_dataloader_native_scale(tmp_path, rng):
    """E2E: native-(565,784) Shanghai h5 -> ShanghaiDataset (native fused
    decode+scale+resize engaged) -> DataLoader batch, bit-compared against
    the dense-numpy formulation (VERDICT r3 item 5: the loader-inside-
    DataLoader path at the reference's native shapes, Shanghai.py:45-49).
    """
    h5py = pytest.importorskip("h5py")
    from kmunet_tpu.data import DataLoader, ShanghaiDataset

    path = str(tmp_path / "shanghai_native.h5")
    n = 4
    with h5py.File(path, "w") as f:
        g = f.create_group("train")
        g.create_dataset("all_len", data=n)
        for i in range(n):
            g.create_dataset(
                str(i), data=rng.integers(0, 256, (25, 565, 784), dtype=np.uint8)
            )

    ds = ShanghaiDataset(path, img_size=128, group="train")
    # The native path must actually be engaged at this scale (uint8 input).
    raw0 = rng.integers(0, 256, (25, 565, 784), dtype=np.uint8)
    assert ds._resize.resize_scaled(raw0, 1.0 / 255.0) is not None

    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        process_index=0, process_count=1)
    batches = list(iter(loader))
    assert len(batches) == 2 and batches[0].shape == (2, 25, 128, 128)

    with h5py.File(path, "r") as f:
        want = dense_apply(
            f["train"]["1"][()].astype(np.float32) / 255.0, (565, 784), (128, 128)
        )
    np.testing.assert_allclose(
        np.asarray(batches[0][1]), want, atol=2e-6,
        err_msg="native loader output inside DataLoader drifted from the "
                "dense formulation at native scale")
    ds.close()
