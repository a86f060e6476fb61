"""Golden parity against the ACTUAL reference PyTorch code (VERDICT r1 item 3).

Earlier tests compare against re-derived numpy/torch oracles; these import the
reference's own modules from /root/reference (read-only), map weights
torch -> flax, and assert per-module outputs match <= 1e-4 on shared random
inputs (BASELINE.json numerical-parity mandate).

Importable pure-torch subset (torch 2.13 CPU in the image):
  convKAN/KANlayers.py::KANLinear        (KANlayers.py:505-660)
  DySample_md.py::DySample               (DySample_md.py:20-81)
  models/convlstm.py::ConvLSTM           (convlstm.py:15-66)
  models/TrajGru.py::TrajGRU             (TrajGru.py:94-212)
  models/loss.py (4 losses)              (loss.py:11-100; torchvision stubbed)
The full KM_UNetV3 / DAGEM / IWP need timm/torchvision/pywt (absent) and are
covered by the re-derived oracles instead.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def _ref_on_path():
    """Import the reference read-only: no bytecode writes, stub torchvision
    (models/loss.py imports it at module level but never uses it in the
    losses under test)."""
    sys.dont_write_bytecode = True
    added = []
    for p in (REF, REF + "/models"):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional
    yield
    for p in added:
        sys.path.remove(p)


def t2f_conv(w):
    """torch Conv2d weight (out,in,kh,kw) -> flax kernel (kh,kw,in,out)."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2np(t):
    return t.detach().numpy()


# ---------------------------------------------------------------------------
# KANLinear (convKAN/KANlayers.py:505-660)
# ---------------------------------------------------------------------------

def _import_ref_kanlinear():
    import importlib

    mod = importlib.import_module("convKAN.KANlayers")
    return mod.KANLinear


def test_kanlinear_forward_parity(rng):
    RefKANLinear = _import_ref_kanlinear()
    from kmunet_tpu.nn.kan import KANLinear

    in_f, out_f, B = 12, 7, 64
    torch.manual_seed(0)
    ref = RefKANLinear(in_f, out_f)
    x = rng.uniform(-1.5, 1.5, size=(B, in_f)).astype(np.float32)
    want = t2np(ref(torch.from_numpy(x)))

    mod = KANLinear(features=out_f)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(params["params"])
    p["base_weight"] = jnp.asarray(t2np(ref.base_weight).T)           # (in,out)
    p["spline_weight"] = jnp.asarray(t2np(ref.spline_weight).transpose(1, 2, 0))
    p["spline_scaler"] = jnp.asarray(t2np(ref.spline_scaler).T)
    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_kanlinear_bspline_basis_parity(rng):
    """The Cox-de-Boor basis itself (KANlayers.py:577-610) vs ops/spline."""
    RefKANLinear = _import_ref_kanlinear()
    from kmunet_tpu.ops.spline import bspline_basis
    from kmunet_tpu.nn.kan import _knots

    in_f = 5
    ref = RefKANLinear(in_f, 3)
    x = rng.uniform(-1.2, 1.2, size=(32, in_f)).astype(np.float32)
    want = t2np(ref.b_splines(torch.from_numpy(x)))  # (B, in, nb)

    knots = _knots(5, 3)
    got = np.asarray(bspline_basis(jnp.asarray(x), knots[None, :], 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kanlinear_regularization_loss_parity(rng):
    """kan_regularization_loss vs the reference's own method
    (KANlayers.py:711-731) on identical spline weights."""
    RefKANLinear = _import_ref_kanlinear()
    from kmunet_tpu.nn.kan import kan_regularization_loss

    torch.manual_seed(3)
    ref = RefKANLinear(12, 7)
    params = {
        "kan": {
            "spline_weight": jnp.asarray(t2np(ref.spline_weight).transpose(1, 2, 0)),
            "base_weight": jnp.asarray(t2np(ref.base_weight).T),
            "spline_scaler": jnp.asarray(t2np(ref.spline_scaler).T),
        }
    }
    for ra, re in [(1.0, 1.0), (0.3, 2.5)]:
        want = float(ref.regularization_loss(ra, re))
        got = float(kan_regularization_loss(params, ra, re))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kan_regularization_loss_no_kan_layers():
    from kmunet_tpu.nn.kan import kan_regularization_loss

    assert float(kan_regularization_loss({"dense": {"kernel": jnp.ones((3, 3))}})) == 0.0


# ---------------------------------------------------------------------------
# DySample (DySample_md.py:20-81)
# ---------------------------------------------------------------------------

def _map_dysample_offset(ref, style, groups, scale, in_ch):
    """torch offset-conv channel layout is (xy, g, si, sj) (from _init_pos,
    DySample_md.py:45-47); ours is (g, si, sj, xy) for 'lp' and (g, xy)
    pre-unshuffle for 'pl'."""
    w = t2np(ref.offset.weight)  # (out, in, 1, 1)
    b = t2np(ref.offset.bias)
    g, s = groups, scale
    if style == "lp":
        w = w.reshape(2, g, s, s, -1).transpose(1, 2, 3, 0, 4)  # (g,s,s,xy,in)
        w = w.reshape(2 * g * s * s, -1)
        b = b.reshape(2, g, s, s).transpose(1, 2, 3, 0).reshape(-1)
    else:  # pl: conv out is 2g, torch (xy, g) -> ours (g, xy)
        w = w.reshape(2, g, -1).transpose(1, 0, 2).reshape(2 * g, -1)
        b = b.reshape(2, g).transpose(1, 0).reshape(-1)
    kernel = jnp.asarray(w.T[None, None])  # (1,1,in,out)
    return kernel, jnp.asarray(b)


@pytest.mark.parametrize("style", ["lp", "pl"])
def test_dysample_forward_parity(rng, style):
    import DySample_md

    from kmunet_tpu.nn.resample import DySample

    B, H, W, C, g, s = 2, 6, 5, 8, 4, 2
    torch.manual_seed(1)
    ref = DySample_md.DySample(C, scale=s, style=style, groups=g)
    # give the offsets real magnitude so the gather path is exercised
    with torch.no_grad():
        ref.offset.weight.mul_(200.0)
        ref.offset.bias.uniform_(-0.3, 0.3)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
    want = t2np(ref(xt)).transpose(0, 2, 3, 1)

    mod = DySample(scale=s, style=style, groups=g)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    in_ch = C // (s * s) if style == "pl" else C
    kernel, bias = _map_dysample_offset(ref, style, g, s, in_ch)
    p = {"offset": {"kernel": kernel, "bias": bias}}
    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# ConvLSTM (models/convlstm.py:15-66)
# ---------------------------------------------------------------------------

def test_convlstm_cell_parity(rng):
    import convlstm as ref_convlstm

    from kmunet_tpu.models.ef import ConvLSTMCell

    B, H, W, Cin, F, S = 2, 8, 8, 3, 6, 4
    torch.manual_seed(2)
    ref = ref_convlstm.ConvLSTM(Cin, F, b_h_w=(B, H, W), kernel_size=3, stride=1, padding=1)
    xs = rng.normal(size=(S, B, Cin, H, W)).astype(np.float32)
    want, (h_last, c_last) = ref(torch.from_numpy(xs), None, seq_len=S)
    want = t2np(want)  # (S,B,F,H,W)

    cell = ConvLSTMCell(filters=F)
    x0 = jnp.asarray(xs[0].transpose(0, 2, 3, 1))
    carry0 = (jnp.zeros((B, H, W, F)), jnp.zeros((B, H, W, F)))
    params = cell.init(jax.random.PRNGKey(0), carry0, x0)
    p = {
        "conv": {
            "kernel": t2f_conv(ref._conv.weight),
            "bias": jnp.asarray(t2np(ref._conv.bias)),
        },
        # reference peepholes are zero at init (and on CUDA stay zero forever
        # because .to(device) unregisters them, convlstm.py:27-29); our
        # per-channel zeros are exactly equivalent at that point.
        "Wci": jnp.zeros((F,)),
        "Wcf": jnp.zeros((F,)),
        "Wco": jnp.zeros((F,)),
    }
    carry = carry0
    outs = []
    for t in range(S):
        carry, h = cell.apply({"params": p}, carry, jnp.asarray(xs[t].transpose(0, 2, 3, 1)))
        outs.append(np.asarray(h).transpose(0, 3, 1, 2))
    got = np.stack(outs)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(carry[1]).transpose(0, 3, 1, 2), t2np(c_last), atol=1e-4, rtol=1e-4
    )


def test_convlstm_reference_peepholes_start_zero():
    """Pins the claimed equivalence (VERDICT r1 weak #6): the reference's
    per-pixel peepholes are zero at construction, so per-channel zero
    parameters produce identical initial behavior."""
    import convlstm as ref_convlstm

    ref = ref_convlstm.ConvLSTM(3, 6, b_h_w=(2, 8, 8), kernel_size=3)
    for w in (ref.Wci, ref.Wcf, ref.Wco):
        assert float(w.abs().max()) == 0.0


# ---------------------------------------------------------------------------
# TrajGRU (models/TrajGru.py:94-212)
# ---------------------------------------------------------------------------

def test_trajgru_cell_parity(rng):
    import TrajGru as ref_trajgru

    from kmunet_tpu.models.ef import TrajGRUCell

    B, H, W, Cin, F, S, L = 2, 8, 8, 3, 6, 3, 5
    torch.manual_seed(3)
    ref = ref_trajgru.TrajGRU(Cin, F, b_h_w=(B, H, W), L=L)
    xs = rng.normal(size=(S, B, Cin, H, W)).astype(np.float32) * 0.5
    want, h_last = ref(torch.from_numpy(xs), None, seq_len=S)
    want = t2np(want)

    cell = TrajGRUCell(filters=F, L=L, use_input=True)
    x0 = jnp.asarray(xs[0].transpose(0, 2, 3, 1))
    h0 = jnp.zeros((B, H, W, F))
    params = cell.init(jax.random.PRNGKey(0), h0, x0)
    p = {
        "h2f_conv1": {"kernel": t2f_conv(ref.h2f_conv1.weight),
                      "bias": jnp.asarray(t2np(ref.h2f_conv1.bias))},
        "i2f_conv1": {"kernel": t2f_conv(ref.i2f_conv1.weight),
                      "bias": jnp.asarray(t2np(ref.i2f_conv1.bias))},
        "flows_conv": {"kernel": t2f_conv(ref.flows_conv.weight),
                       "bias": jnp.asarray(t2np(ref.flows_conv.bias))},
        "i2h": {"kernel": t2f_conv(ref.i2h.weight),
                "bias": jnp.asarray(t2np(ref.i2h.bias))},
        "ret": {"kernel": t2f_conv(ref.ret.weight),
                "bias": jnp.asarray(t2np(ref.ret.bias))},
    }
    h = h0
    outs = []
    for t in range(S):
        h, _ = cell.apply({"params": p}, h, jnp.asarray(xs[t].transpose(0, 2, 3, 1)))
        outs.append(np.asarray(h).transpose(0, 3, 1, 2))
    got = np.stack(outs)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Losses (models/loss.py:11-100)
# ---------------------------------------------------------------------------

def test_rainfall_loss_parity(rng):
    import loss as ref_loss

    from kmunet_tpu.losses import rainfall_loss

    pred = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    want = float(ref_loss.RainfallLoss()(torch.from_numpy(pred), torch.from_numpy(tgt)))
    got = float(rainfall_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(got - want) < 1e-5 * max(1.0, abs(want))


def test_en_rainfall_loss_parity(rng):
    import loss as ref_loss

    from kmunet_tpu.losses import en_rainfall_loss

    pred = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    want = float(ref_loss.enRainfallLoss()(torch.from_numpy(pred), torch.from_numpy(tgt)))
    got = float(en_rainfall_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(got - want) < 1e-5 * max(1.0, abs(want))


def test_rain_loss_parity(rng):
    import loss as ref_loss

    from kmunet_tpu.losses import rain_loss

    pred = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    tgt = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    want = float(ref_loss.RAINlOSS()(torch.from_numpy(pred), torch.from_numpy(tgt)))
    got = float(rain_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("lam", [None, 0.1])
def test_weighted_mse_mae_parity(rng, lam):
    import loss as ref_loss

    from kmunet_tpu.losses import weighted_mse_mae

    thresholds = [0.28, 0.48, 0.6, 0.75, 0.9]
    pred = rng.uniform(0, 1, size=(2, 4, 1, 12, 12)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(2, 4, 1, 12, 12)).astype(np.float32)
    ref = ref_loss.Weighted_mse_mae(LAMBDA=lam, thresholds=thresholds)
    want = float(ref(torch.from_numpy(pred), torch.from_numpy(tgt)))
    got = float(
        weighted_mse_mae(jnp.asarray(pred), jnp.asarray(tgt), lam=lam, thresholds=thresholds)
    )
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))
