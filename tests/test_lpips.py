"""LPIPS port + torch-checkpoint converter parity (VERDICT r1 item 9).

The real pretrained weights cannot be fetched here (zero egress), so parity
is proven structurally: a torch re-implementation of lpips v0.1 'alex'
(mirroring lpips/lpips.py + lpips/pretrained_networks.py layer by layer) is
built with RANDOM weights, its state_dict is saved with the AUTHENTIC
package key names (net.slice{1..5}.{0,3,6,8,10}, lin{i}.model.1), converted
through ``convert_torch_lpips`` — the exact path a user with the real
checkpoint would run — and the flax forward must match the torch forward
<= 1e-4 (BASELINE.json numerical-parity mandate, ref metrics.py:37-39).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from kmunet_tpu.metrics.evaluator import Evaluator  # noqa: E402
from kmunet_tpu.metrics.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    convert_torch_lpips,
    load_lpips_params,
    lpips_distance,
    make_lpips_fn,
)

# torchvision alexnet .features layout: (out_ch, k, stride, pad) convs with
# the global Sequential index each conv sits at (pools/relus between).
_ALEX = [(64, 11, 4, 2, 0), (192, 5, 1, 2, 3), (384, 3, 1, 1, 6),
         (256, 3, 1, 1, 8), (256, 3, 1, 1, 10)]
_SLICE_OF_IDX = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}


def _random_state_dict(gen: torch.Generator) -> dict:
    sd = {}
    in_ch = 3
    for out_ch, k, _, _, idx in _ALEX:
        key = f"net.slice{_SLICE_OF_IDX[idx]}.{idx}"
        sd[f"{key}.weight"] = 0.1 * torch.randn(out_ch, in_ch, k, k, generator=gen)
        sd[f"{key}.bias"] = 0.1 * torch.randn(out_ch, generator=gen)
        in_ch = out_ch
    for i, (out_ch, *_rest) in enumerate(_ALEX):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, out_ch, 1, 1, generator=gen)
    return sd


def _torch_lpips(x1: torch.Tensor, x2: torch.Tensor, sd: dict) -> torch.Tensor:
    """lpips v0.1 forward, re-derived line-for-line from the package:
    ScalingLayer -> alexnet relu taps (pools after taps 1 and 2) ->
    normalize_tensor -> squared diff -> 1x1 lin conv -> spatial mean -> sum."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        for out_ch, k, s, p, idx in _ALEX:
            key = f"net.slice{_SLICE_OF_IDX[idx]}.{idx}"
            x = F.relu(F.conv2d(x, sd[f"{key}.weight"], sd[f"{key}.bias"],
                                stride=s, padding=p))
            out.append(x)
            if idx in (0, 3):  # maxpool follows the first two relu taps
                x = F.max_pool2d(x, 3, stride=2)
        return out

    total = 0.0
    for i, (a, b) in enumerate(zip(feats(x1), feats(x2))):
        an = a / torch.sqrt(torch.sum(a * a, dim=1, keepdim=True) + 1e-10)
        bn = b / torch.sqrt(torch.sum(b * b, dim=1, keepdim=True) + 1e-10)
        d = (an - bn) ** 2
        d = F.conv2d(d, sd[f"lin{i}.model.1.weight"])
        total = total + d.mean(dim=(2, 3))[:, 0]
    return total


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    gen = torch.Generator().manual_seed(0)
    sd = _random_state_dict(gen)
    pth = tmp_path_factory.mktemp("lpips") / "lpips_alex.pth"
    npz = tmp_path_factory.mktemp("lpips") / "lpips_alex.npz"
    torch.save(sd, str(pth))
    convert_torch_lpips(str(npz), state_dict_path=str(pth))
    return sd, str(npz)


def test_lpips_matches_torch_oracle(converted):
    sd, npz = converted
    params = load_lpips_params(npz)
    r = np.random.default_rng(1)
    # 64x64 exercises both pools and leaves >1 spatial position at tap 5
    x1 = r.uniform(-1, 1, (3, 3, 64, 64)).astype(np.float32)
    x2 = r.uniform(-1, 1, (3, 3, 64, 64)).astype(np.float32)

    want = _torch_lpips(torch.from_numpy(x1), torch.from_numpy(x2), sd).numpy()
    got = np.asarray(lpips_distance(
        jnp.asarray(x1.transpose(0, 2, 3, 1)),
        jnp.asarray(x2.transpose(0, 2, 3, 1)),
        params,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lpips_zero_for_identical_inputs(converted):
    _, npz = converted
    fn = make_lpips_fn(npz)
    x = jnp.asarray(np.random.default_rng(2).random((2, 3, 32, 32), np.float32))
    np.testing.assert_allclose(np.asarray(fn(x, x)), 0.0, atol=1e-6)


def test_converter_roundtrip_keys_shapes_layout():
    """convert_lpips_state_dict on a fabricated dict: every npz key present,
    OIHW->HWIO transposes correct element-for-element (torch-free)."""
    _alex = [(64, 11, 0, 1), (192, 5, 3, 2), (384, 3, 6, 3),
             (256, 3, 8, 4), (256, 3, 10, 5)]
    r = np.random.default_rng(7)
    sd, in_ch = {}, 3
    for out_ch, k, idx, sl in _alex:
        key = f"net.slice{sl}.{idx}"
        sd[f"{key}.weight"] = r.standard_normal((out_ch, in_ch, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = r.standard_normal(out_ch).astype(np.float32)
        in_ch = out_ch
    for i, (out_ch, *_r) in enumerate(_alex):
        sd[f"lin{i}.model.1.weight"] = r.random((1, out_ch, 1, 1), dtype=np.float32)

    from kmunet_tpu.metrics.lpips import convert_lpips_state_dict

    params = convert_lpips_state_dict(sd)
    assert sorted(params) == sorted(
        [f"conv{i}_{s}" for i in range(5) for s in ("w", "b")]
        + [f"lin{i}_w" for i in range(5)]
    )
    # conv0: (64,3,11,11) OIHW -> (11,11,3,64) HWIO, element mapping exact
    assert params["conv0_w"].shape == (11, 11, 3, 64)
    np.testing.assert_array_equal(params["conv0_w"][4, 7, 1, 30],
                                  sd["net.slice1.0.weight"][30, 1, 4, 7])
    assert params["lin2_w"].shape == (1, 1, 384, 1)
    np.testing.assert_array_equal(params["lin2_w"][0, 0, :, 0],
                                  sd["lin2.model.1.weight"][0, :, 0, 0])


def test_lpips_golden_values_torch_free():
    """Full path (fabricated torch-format dict -> converter -> flax forward)
    against checked-in golden values: catches any numeric drift in the
    conv/normalize/lin/mean chain without needing torch at test time. The
    only branch left untested anywhere is the literal pretrained weight
    values (unfetchable: zero egress)."""
    _alex = [(64, 11, 0, 1), (192, 5, 3, 2), (384, 3, 6, 3),
             (256, 3, 8, 4), (256, 3, 10, 5)]
    r = np.random.default_rng(0)
    sd, in_ch = {}, 3
    for out_ch, k, idx, sl in _alex:
        key = f"net.slice{sl}.{idx}"
        sd[f"{key}.weight"] = (0.1 * r.standard_normal((out_ch, in_ch, k, k))).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * r.standard_normal(out_ch)).astype(np.float32)
        in_ch = out_ch
    for i, (out_ch, *_r) in enumerate(_alex):
        sd[f"lin{i}.model.1.weight"] = r.random((1, out_ch, 1, 1), dtype=np.float32)

    from kmunet_tpu.metrics.lpips import convert_lpips_state_dict

    params = {k: jnp.asarray(v) for k, v in convert_lpips_state_dict(sd).items()}
    x1 = jnp.asarray(r.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    x2 = jnp.asarray(r.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    got = np.asarray(lpips_distance(x1, x2, params))
    np.testing.assert_allclose(got, [0.9638738, 0.9498723], rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lpips_distance(x1, x1, params)), 0.0,
                               atol=1e-7)


def test_evaluator_reports_lpips_and_status(converted):
    _, npz = converted
    r = np.random.default_rng(3)
    pred = r.random((2, 4, 32, 32)).astype(np.float32)
    true = r.random((2, 4, 32, 32)).astype(np.float32)

    ev = Evaluator(seq_len=4, value_scale=90.0, lpips_fn=make_lpips_fn(npz))
    ev.evaluate(true, pred)
    res = ev.done()
    assert np.isfinite(res["LPIPS"]) and res["LPIPS"] > 0
    assert res["LPIPS_status"] == "ok"

    ev2 = Evaluator(seq_len=4, value_scale=90.0, lpips_fn=make_lpips_fn(None))
    ev2.evaluate(true, pred)
    res2 = ev2.done()
    assert np.isnan(res2["LPIPS"])
    assert "needs weights" in res2["LPIPS_status"]
