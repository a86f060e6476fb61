"""Golden parity for the flagship's hottest math vs the reference's OWN torch
code (VERDICT r4 item 3).

Round-4 state: HSMSSD / EfficientViMBlock / IWP / the assembled KM_UNetV3
were validated only against re-derived numpy oracles — a mis-read of the
reference math would pass every test. These tests import the reference
modules themselves (`/root/reference/vim_block_init/efficient_vim_init.py`,
`WPL/iwp.py`, `KM_UNetV3_LAPS.py`), map weights torch -> flax, and assert
forward parity <= 1e-4 (BASELINE.json mandate).

The missing pip deps are stubbed, which is sound because the reference uses
them only trivially on these paths:
  timm     -> trunc_normal_ (torch.nn.init has it), DropPath (identity in
              eval), SqueezeExcite (imported by vim_utils_init but never
              instantiated by the LAPS model — no PatchMerging in KM-UNet)
  fvcore   -> flop_count (only EfficientViM.flops, not under test)
  pywt     -> Wavelet('haar') filter taps (rec_lo = [s, s],
              rec_hi = [s, -s], s = 1/sqrt2 — the standard Haar bank;
              iwp.py:50-52 reads only rec_lo/rec_hi)

The LAPS variant (KM_UNetV3_LAPS.py:367+) needs no torchvision (no DAGEM /
DySample), so the FULL assembled flagship forward is golden-tested here; the
SH-only extras (DAGEM's DeformConv2d) keep their existing oracle + DySample
golden tests.
"""

import math
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn_t = torch.nn

REF = "/root/reference"
_SQRT2INV = 0.7071067811865476


def _install_stubs():
    """timm / fvcore / pywt stand-ins (see module docstring for why each is
    sound). Installed once; idempotent."""
    if "timm" in sys.modules:
        return

    class DropPath(nn_t.Module):
        """timm stochastic depth: identity in eval mode (the only mode the
        parity tests run)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    class SqueezeExcite(nn_t.Module):
        """Name-resolution stub: vim_utils_init imports it at module level
        but the KM-UNet path never instantiates PatchMerging."""

        def __init__(self, channels, rd_ratio=0.25, **kw):
            super().__init__()
            rd = max(1, int(channels * rd_ratio))
            self.fc1 = nn_t.Conv2d(channels, rd, 1)
            self.fc2 = nn_t.Conv2d(rd, channels, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))

    timm = types.ModuleType("timm")
    timm.layers = types.ModuleType("timm.layers")
    timm.layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers.SqueezeExcite = SqueezeExcite
    timm.layers.DropPath = DropPath
    timm.models = types.ModuleType("timm.models")
    timm.models.register_model = lambda fn=None, **kw: (
        fn if fn is not None else (lambda f: f))
    timm.models.layers = types.ModuleType("timm.models.layers")
    timm.models.layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models.layers.DropPath = DropPath
    for name, mod in [("timm", timm), ("timm.layers", timm.layers),
                      ("timm.models", timm.models),
                      ("timm.models.layers", timm.models.layers)]:
        sys.modules[name] = mod

    fvcore = types.ModuleType("fvcore")
    fvcore.nn = types.ModuleType("fvcore.nn")
    fvcore.nn.flop_count = lambda *a, **k: ({}, {})
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fvcore.nn

    class Wavelet:
        def __init__(self, name):
            assert name == "haar", name
            self.rec_lo = [_SQRT2INV, _SQRT2INV]
            self.rec_hi = [_SQRT2INV, -_SQRT2INV]
            self.dec_lo = [_SQRT2INV, _SQRT2INV]
            self.dec_hi = [-_SQRT2INV, _SQRT2INV]

    pywt = types.ModuleType("pywt")
    pywt.Wavelet = Wavelet
    sys.modules["pywt"] = pywt

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


@pytest.fixture(scope="module", autouse=True)
def _ref_on_path():
    sys.dont_write_bytecode = True
    _install_stubs()
    added = []
    for p in (REF, REF + "/models"):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    yield
    for p in added:
        sys.path.remove(p)


def t2np(t):
    return t.detach().numpy()


def _t2f_conv(w):
    """torch Conv2d weight (out, in/g, kh, kw) -> flax (kh, kw, in/g, out)."""
    return jnp.asarray(t2np(w).transpose(2, 3, 1, 0))


def _conv_p(m):
    p = {"kernel": _t2f_conv(m.weight)}
    if m.bias is not None:
        p["bias"] = jnp.asarray(t2np(m.bias))
    return p


def _dense_from_linear(m):
    return {"kernel": jnp.asarray(t2np(m.weight).T),
            "bias": jnp.asarray(t2np(m.bias))}


def _dense_from_conv1x1(m):
    """Conv1d/Conv2d k=1 -> Dense over the channel axis."""
    w = t2np(m.weight)
    d = {"kernel": jnp.asarray(w.reshape(w.shape[0], w.shape[1]).T)}
    if m.bias is not None:
        d["bias"] = jnp.asarray(t2np(m.bias))
    return d


def _norm_p(m):
    return {"scale": jnp.asarray(t2np(m.weight).reshape(-1)),
            "bias": jnp.asarray(t2np(m.bias).reshape(-1))}


def _bn(m):
    return (
        {"scale": jnp.asarray(t2np(m.weight)), "bias": jnp.asarray(t2np(m.bias))},
        {"mean": jnp.asarray(t2np(m.running_mean)),
         "var": jnp.asarray(t2np(m.running_var))},
    )


def _convbn(m):
    """reference ConvLayer2D (conv + BN) -> our ConvBNAct subtree."""
    bnp, bns = _bn(m.norm)
    return ({"Conv_0": {"kernel": _t2f_conv(m.conv.weight)}, "BatchNorm_0": bnp},
            {"BatchNorm_0": bns})


def _hsmssd_p(m):
    """efficient_vim_init.py:14-61 -> nn/ssd.py param names."""
    return {
        "BCdt_proj_kernel": jnp.asarray(t2np(m.BCdt_proj.conv.weight)[:, :, 0].T),
        "dw_kernel": jnp.asarray(t2np(m.dw.conv.weight).transpose(2, 3, 1, 0)),
        "A": jnp.asarray(t2np(m.A)),
        "D": jnp.asarray(t2np(m.D)),
        "hz_proj": {"kernel": jnp.asarray(t2np(m.hz_proj.conv.weight)[:, :, 0].T)},
        "out_proj": {"kernel": jnp.asarray(t2np(m.out_proj.conv.weight)[:, :, 0].T)},
    }


def _evb_p(m):
    """efficient_vim_init.py:64-97 -> nn/ssd.py EfficientViMBlock tree."""
    dw1p, dw1s = _convbn(m.dwconv1)
    dw2p, dw2s = _convbn(m.dwconv2)
    f1p, f1s = _convbn(m.ffn.fc1)
    f2p, f2s = _convbn(m.ffn.fc2)
    params = {
        "alpha": jnp.asarray(t2np(m.alpha)),
        "dwconv1": dw1p,
        "dwconv2": dw2p,
        "ffn": {"ConvBNAct_0": f1p, "ConvBNAct_1": f2p},
        "norm": _norm_p(m.norm),
        "mixer": _hsmssd_p(m.mixer),
    }
    stats = {"dwconv1": dw1s, "dwconv2": dw2s,
             "ffn": {"ConvBNAct_0": f1s, "ConvBNAct_1": f2s}}
    return params, stats


def _randomize(ref, seed, bn_stats=True):
    """Perturb every parameter (BN scales init 0 would otherwise zero whole
    branches and hide conv-mapping errors) and randomize BN running stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.15)
        if bn_stats:
            for name, b in ref.named_buffers():
                if name.endswith("running_mean"):
                    b.copy_(torch.randn(b.shape, generator=g) * 0.2)
                elif name.endswith("running_var"):
                    b.copy_(0.7 + torch.rand(b.shape, generator=g) * 0.7)


# ---------------------------------------------------------------------------
# HSMSSD (efficient_vim_init.py:14-61)
# ---------------------------------------------------------------------------

def test_hsmssd_parity(rng):
    import importlib

    evi = importlib.import_module("vim_block_init.efficient_vim_init")
    from kmunet_tpu.nn.ssd import HSMSSD

    C, N, side, B = 16, 64, 8, 2
    torch.manual_seed(0)
    ref = evi.HSMSSD(d_model=C, ssd_expand=1, state_dim=N).eval()
    _randomize(ref, 10)
    x = rng.normal(size=(B, C, side * side)).astype(np.float32)
    with torch.no_grad():
        want_y, want_h = ref(torch.from_numpy(x))
    want_y = t2np(want_y).transpose(0, 2, 3, 1)        # NCHW -> NHWC
    want_h = t2np(want_h).transpose(0, 2, 1)           # (B,C,N) -> (B,N,C)

    mod = HSMSSD(d_model=C, state_dim=N)
    tokens = jnp.asarray(x.transpose(0, 2, 1))          # (B, L, C)
    mod.init(jax.random.PRNGKey(0), tokens)
    got_y, got_h = mod.apply({"params": _hsmssd_p(ref)}, tokens)
    np.testing.assert_allclose(np.asarray(got_y), want_y, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# EfficientViMBlock (efficient_vim_init.py:64-97)
# ---------------------------------------------------------------------------

def test_efficient_vim_block_parity(rng):
    import importlib

    evi = importlib.import_module("vim_block_init.efficient_vim_init")
    from kmunet_tpu.nn.ssd import EfficientViMBlock

    C, side, B = 16, 8, 2
    torch.manual_seed(1)
    ref = evi.EfficientViMBlock(dim=C, mlp_ratio=4, ssd_expand=1,
                                state_dim=64).eval()
    _randomize(ref, 11)
    x = rng.normal(size=(B, C, side, side)).astype(np.float32)
    with torch.no_grad():
        want = t2np(ref(torch.from_numpy(x))).transpose(0, 2, 3, 1)

    mod = EfficientViMBlock(dim=C, mlp_ratio=4, state_dim=64)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    mod.init(jax.random.PRNGKey(0), xh, train=False)
    params, stats = _evb_p(ref)
    got = mod.apply({"params": params, "batch_stats": stats}, xh, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# IWP (WPL/iwp.py:116-132) — DWT banded matrices included
# ---------------------------------------------------------------------------

def _iwp_p(m):
    return {"high_freq_conv": _conv_p(m.high_freq_conv),
            "fusion_conv": _conv_p(m.fusion_conv)}


def test_iwp_parity(rng):
    import importlib

    iwp = importlib.import_module("WPL.iwp")
    from kmunet_tpu.nn.wavelet import IntelligentWaveletPooling

    C, H, B = 6, 16, 2
    torch.manual_seed(2)
    ref = iwp.IntelligentWaveletPoolingModule(in_channels=C).eval()
    _randomize(ref, 12)
    x = rng.normal(size=(B, C, H, H)).astype(np.float32)
    with torch.no_grad():
        want = t2np(ref(torch.from_numpy(x))).transpose(0, 2, 3, 1)

    mod = IntelligentWaveletPooling()
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    mod.init(jax.random.PRNGKey(0), xh)
    got = mod.apply({"params": _iwp_p(ref)}, xh)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_dwt_parity_vs_reference_banded_matrices(rng):
    """ops/dwt.py's strided filter bank vs the reference's own banded-matrix
    DWT (iwp.py:9-113), not a re-derivation."""
    import importlib

    iwp = importlib.import_module("WPL.iwp")
    from kmunet_tpu.ops.dwt import haar_dwt2d

    dwt = iwp.DWT_2D(wavename="haar")
    x = rng.normal(size=(2, 3, 12, 12)).astype(np.float32)
    with torch.no_grad():
        LL, LH, HL, HH = dwt(torch.from_numpy(x))
    got = haar_dwt2d(jnp.asarray(x.transpose(0, 2, 3, 1)))
    for g, w in zip(got, (LL, LH, HL, HH)):
        np.testing.assert_allclose(
            np.asarray(g), t2np(w).transpose(0, 2, 3, 1), atol=1e-5)


# ---------------------------------------------------------------------------
# Full KM_UNetV3_LAPS forward (KM_UNetV3_LAPS.py:367-511)
# ---------------------------------------------------------------------------

def _kanconv_p(m, in_c, k=3, nb=8):
    """reference KANConv2d (unfold->KANLinear, KANConv2Dlayers.py:5-37) ->
    our two-conv formulation. Unfold feature order is c*k*k + i*k + j."""
    kl = m.kanlayer
    out = kl.base_weight.shape[0]
    bw = t2np(kl.base_weight).reshape(out, in_c, k, k)
    sw = t2np(kl.spline_weight).reshape(out, in_c, k, k, nb)
    sc = t2np(kl.spline_scaler).reshape(out, in_c, k, k)
    return {
        "base_kernel": jnp.asarray(bw.transpose(2, 3, 1, 0)),
        "spline_kernel": jnp.asarray(sw.transpose(2, 3, 1, 4, 0)),
        "spline_scaler": jnp.asarray(sc.transpose(2, 3, 1, 0)),
    }


def _stable_kan_p(m, in_c):
    p = {"pre_norm": _norm_p(m.pre_norm),
         "kanconv": _kanconv_p(m.kanconv2d[0], in_c)}
    if not isinstance(m.residual, nn_t.Identity):
        p["residual"] = _conv_p(m.residual)
    return p


def _dattn_p(m):
    return {
        "qkv": _conv_p(m.qkv),
        "conv": _conv_p(m.conv),
        "Dense_0": _dense_from_linear(m.fc[0]),
        "Dense_1": _dense_from_linear(m.fc[2]),
    }


def _dvim_p(m):
    evp, evs = _evb_p(m.vit_mamba)
    return ({"proj": _conv_p(m.proj), "vit_mamba": evp, "attn": _dattn_p(m.attn)},
            {"vit_mamba": evs})


def _enh_p(m):
    hp, hs = _dvim_p(m.height_block)
    wp, ws = _dvim_p(m.width_block)
    cp, cs = _dvim_p(m.channel_block)
    params = {
        "height_block": hp, "width_block": wp, "channel_block": cp,
        "Dense_0": _dense_from_conv1x1(m.fusion_gate[1]),
        "Dense_1": _dense_from_conv1x1(m.fusion_gate[3]),
        "norm": {"norm_h": _norm_p(m.norm.norm_h),
                 "norm_w": _norm_p(m.norm.norm_w),
                 "norm_c": _norm_p(m.norm.norm_c)},
        "Conv_0": _conv_p(m.ffn[0]),
        "Conv_1": _conv_p(m.ffn[2]),
    }
    return params, {"height_block": hs, "width_block": ws, "channel_block": cs}


def _lca_p(m):
    return {"Dense_0": _dense_from_linear(m.fc[0]),
            "Dense_1": _dense_from_linear(m.fc[2])}


def _msf_p(m):
    p = {}
    for i in range(3):
        p[f"branch{i}"] = _conv_p(m.blocks[i][0])
        p[f"GroupNorm_{i}"] = _norm_p(m.blocks[i][1])
    p["Conv_0"] = _conv_p(m.fusion[0])
    p["Conv_1"] = _conv_p(m.fusion[1])
    p["ChannelAttention_0"] = {
        "Dense_0": _dense_from_linear(m.fusion[2].fc[0]),
        "Dense_1": _dense_from_linear(m.fusion[2].fc[2]),
    }
    return p


def _map_laps(ref, embed_dims=(16, 32, 64)):
    params, stats = {"conv_f": _conv_p(ref.conv_f)}, {}
    ins = [16, embed_dims[0], embed_dims[1]]
    for i in (1, 2, 3):
        enc = getattr(ref, f"enc{i}")
        params[f"enc{i}_kan"] = _stable_kan_p(enc[0], ins[i - 1])
        vp, vs = _enh_p(enc[1])
        params[f"enc{i}_vim"], stats[f"enc{i}_vim"] = vp, vs
        params[f"enc{i}_iwp"] = _iwp_p(enc[2])
        params[f"lca{i}"] = _lca_p(getattr(ref, f"lca{i}"))
    params["dec1_kan"] = _stable_kan_p(ref.dec1[1], embed_dims[2])
    params["attention1"] = _msf_p(ref.attention1[0])
    params["attention2"] = _msf_p(ref.attention2[0])
    params["dec2_conv"] = _conv_p(ref.dec2[1])
    vp, vs = _enh_p(ref.dec2[2])
    params["dec2_vim"], stats["dec2_vim"] = vp, vs
    params["dec3_conv"] = _conv_p(ref.dec3[1])
    vp, vs = _enh_p(ref.dec3[2])
    params["dec3_vim"], stats["dec3_vim"] = vp, vs
    params["head"] = _conv_p(ref.dec3[3])
    params["output_norm"] = _norm_p(ref.output_norm)
    return params, stats


def _tree_paths(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, pre + k + "/"))
        else:
            out[pre + k] = tuple(v.shape)
    return out


def test_km_unet_laps_full_forward_parity(rng):
    """The keystone: the ASSEMBLED flagship (LAPS variant) forward vs the
    reference's own torch model with mapped weights, eval mode, <= 1e-4."""
    import importlib

    laps = importlib.import_module("KM_UNetV3_LAPS")
    from kmunet_tpu.models import KM_UNetV3_LAPS

    B, S = 2, 32
    torch.manual_seed(3)
    ref = laps.KM_UNetV3(num_classes=3).eval()
    _randomize(ref, 13)
    x = rng.normal(size=(B, 5, S, S)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = t2np(ref(torch.from_numpy(x))).transpose(0, 2, 3, 1)

    model = KM_UNetV3_LAPS(num_classes=3)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), xh, train=False)
    params, stats = _map_laps(ref)

    # Structural safety: the mapped tree must cover the template exactly
    # (a silently-missing leaf would fall back to nothing and fail apply,
    # but a shape mismatch deserves a readable error).
    t_paths = _tree_paths(jax.tree.map(lambda a: a, dict(template["params"])))
    m_paths = _tree_paths(params)
    assert t_paths == m_paths, (
        sorted(set(t_paths) ^ set(m_paths))[:10],
        [(k, t_paths[k], m_paths[k]) for k in t_paths
         if k in m_paths and t_paths[k] != m_paths[k]][:10],
    )
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, xh, train=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
