#!/usr/bin/env python
"""Does the REFERENCE torch KM_UNetV3_SH reproduce the late-horizon collapse?

Round-5 root-cause evidence for the quality-table loss to SmaAt (VERDICT r4
#2): our trained flagship's head GroupNorm scale gamma collapses to ~0.2 for
output channels 14-19 (vs ~2.0 for 0-13), freezing the last 6 forecast
horizons at a near-constant mean field (per-channel pred std 0.03 vs 0.17).
The head is the reference's own design (`KM_UNetV3_SH.py:449-450`:
GroupNorm(1, num_classes) + Sigmoid): once a channel's gamma shrinks, its
gradient is scaled by gamma and it cannot escape the hedging basin.

This script trains the reference's OWN torch model (imported from
/root/reference with the same dependency stubs the golden-parity tests use,
plus a faithful grid-sample-based torchvision.ops.DeformConv2d stand-in) on
the IDENTICAL synthetic corpus with the reference recipe (AdamW 1e-3 wd
0.05, cosine T_max 200 eta_min 5e-4 per epoch, HybridLoss alpha 0.7 —
train_shanghai.py:342,396-401,298-326) at reduced scale (CPU-feasible), then
reports per-channel head gamma + per-channel prediction std + CSI@20 per
horizon. If late-horizon gamma/std collapse the same way, the pathology is
the reference architecture's training dynamics, not a rebuild bug.

Usage:
  python scripts/ref_torch_collapse.py --probe          # time one step
  python scripts/ref_torch_collapse.py [--epochs=30 --img=64 --batch=4
                                        --items=128 --out=<json>]
"""

import json
import math
import os
import sys
import time
import types

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np
import torch
import torch.nn.functional as F

import test_reference_parity_flagship as P  # the golden-parity stub installer


def _install_torchvision_stub():
    """Faithful DeformConv2d (deform_conv2d v1 semantics) via one
    grid_sample per kernel tap — torchvision is absent in this image.
    Matches torchvision.ops.DeformConv2d for the DAGEM usage (3x3, pad 1,
    stride 1, no mask): sample at p0 + p_k + offset_k with bilinear
    interpolation, out-of-range reads 0 (DAGEM_md.py:46).

    NB: the parity tests' _install_stubs() already registers a minimal
    torchvision (transforms only) — AUGMENT it with .ops rather than
    early-returning on its presence."""
    if "torchvision.ops" in sys.modules:
        return

    class DeformConv2d(torch.nn.Module):
        def __init__(self, in_c, out_c, kernel_size=3, stride=1, padding=1,
                     dilation=1, groups=1, bias=True):
            super().__init__()
            assert stride == 1 and dilation == 1 and groups == 1
            self.k, self.p = kernel_size, padding
            self.weight = torch.nn.Parameter(
                torch.empty(out_c, in_c, kernel_size, kernel_size))
            torch.nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            self.bias = None
            if bias:
                bound = 1 / math.sqrt(in_c * kernel_size ** 2)
                self.bias = torch.nn.Parameter(
                    torch.empty(out_c).uniform_(-bound, bound))

        def forward(self, x, offset):
            B, C, H, W = x.shape
            k, p = self.k, self.p
            ys = torch.arange(H, dtype=x.dtype)
            xs = torch.arange(W, dtype=x.dtype)
            taps = []
            for kh in range(k):
                for kw in range(k):
                    t = kh * k + kw
                    dy = offset[:, 2 * t]
                    dx = offset[:, 2 * t + 1]
                    sy = ys[None, :, None] + (kh - p) + dy
                    sx = xs[None, None, :] + (kw - p) + dx
                    gx = 2 * (sx + 0.5) / W - 1
                    gy = 2 * (sy + 0.5) / H - 1
                    grid = torch.stack([gx, gy], -1)
                    taps.append(F.grid_sample(
                        x, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False))
            g = torch.stack(taps, 2)  # (B, C, k*k, H, W)
            out = torch.einsum(
                "bcthw,oct->bohw", g,
                self.weight.reshape(self.weight.shape[0], C, k * k))
            if self.bias is not None:
                out = out + self.bias[None, :, None, None]
            return out

    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.DeformConv2d = DeformConv2d
    sys.modules["torchvision.ops"] = tv.ops


def hybrid_loss_torch(pred, target, alpha=0.7):
    """Torch mirror of kmunet_tpu.losses.hybrid_loss (itself re-derived from
    train_shanghai.py:298-326): weighted-MSE mix + SSIM on min-max-normalized
    maps. SSIM here reuses our jax op's windowing via a torch conv."""
    mse = ((pred - target) ** 2).mean()
    weighted = (((pred - target) ** 2) * torch.exp(target * 2.0)).mean()
    t_min, t_max = target.min().detach(), target.max().detach()
    p_min, p_max = pred.min().detach(), pred.max().detach()
    tn = (target - t_min) / (t_max - t_min + 1e-8)
    pn = (pred - p_min) / (p_max - p_min + 1e-8)
    ssim = _ssim_torch(pn, tn)
    return alpha * (0.55 * mse + 0.45 * weighted) + (1 - alpha) * (1 - ssim)


_SSIM_WIN = None


def _ssim_torch(a, b, data_range=1.0):
    """11x11 gaussian sigma=1.5 SSIM, valid-cropped mean (metrics.py:132-152
    semantics as re-derived in kmunet_tpu/ops/ssim.py)."""
    global _SSIM_WIN
    B, T, H, W = a.shape
    if _SSIM_WIN is None:
        g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2))
        g = (g / g.sum()).astype(np.float32)
        _SSIM_WIN = torch.from_numpy(np.outer(g, g))[None, None]
    w = _SSIM_WIN
    a2 = a.reshape(B * T, 1, H, W)
    b2 = b.reshape(B * T, 1, H, W)
    mu_a = F.conv2d(a2, w)
    mu_b = F.conv2d(b2, w)
    saa = F.conv2d(a2 * a2, w) - mu_a ** 2
    sbb = F.conv2d(b2 * b2, w) - mu_b ** 2
    sab = F.conv2d(a2 * b2, w) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (saa + sbb + c2))
    return s.mean()


def build_model(img, out_frames=20):
    P._install_stubs()
    _install_torchvision_stub()
    sys.dont_write_bytecode = True
    for p in (P.REF, P.REF + "/models"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    # The reference DySample `.view`s a non-contiguous tensor, which this
    # torch/CPU build rejects (DySample_md.py:58). Alias view -> reshape
    # process-wide: identical semantics wherever view would succeed, a copy
    # where it would raise — a layout-only fix for the diagnostic.
    torch.Tensor.view = torch.Tensor.reshape
    sh = importlib.import_module("KM_UNetV3_SH")
    # KM_UNetV3(num_classes, embed_dims=[16,32,64]); input is hardwired to
    # 5 channels by conv_f (KM_UNetV3_SH.py:372-376)
    return sh.KM_UNetV3(num_classes=out_frames, embed_dims=[16, 32, 64])


def corpus(items, img, seed):
    from kmunet_tpu.data.synthetic import SyntheticNowcastDataset

    ds = SyntheticNowcastDataset(length=items, img_size=img, seq_len=25,
                                 seed=seed)
    return np.stack([ds[i] for i in range(items)])


def csi_per_horizon(pred, tgt, thr=20 / 90):
    out = []
    for t in range(pred.shape[1]):
        p = pred[:, t] >= thr
        g = tgt[:, t] >= thr
        tp = (p & g).sum()
        fp = (p & ~g).sum()
        fn = (~p & g).sum()
        out.append(round(float(tp / max(tp + fp + fn, 1)), 4))
    return out


def main():
    args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    probe = "--probe" in sys.argv
    img = int(args.get("--img", 64))
    B = int(args.get("--batch", 4))
    epochs = int(args.get("--epochs", 30))
    items = int(args.get("--items", 128))
    out_path = args.get("--out", "outputs/round5_horizon/ref_torch_collapse.json")

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = build_model(img)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.05)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=200,
                                                       eta_min=5e-4)
    data = corpus(items, img, seed=0)          # (N, 25, img, img)
    test = corpus(max(items // 4, B), img, seed=2)

    if probe:
        xb = torch.from_numpy(data[:B, :5])
        yb = torch.from_numpy(data[:B, 5:25])
        t0 = time.time()
        out = model(xb)
        loss = hybrid_loss_torch(out, yb)
        loss.backward()
        print(json.dumps({"probe_step_s": round(time.time() - t0, 2),
                          "loss": float(loss)}))
        return

    n_steps = 0
    t0 = time.time()
    for ep in range(epochs):
        perm = np.random.default_rng(ep).permutation(items)
        for i in range(0, items - B + 1, B):
            idx = perm[i:i + B]
            xb = torch.from_numpy(data[idx, :5])
            yb = torch.from_numpy(data[idx, 5:25])
            opt.zero_grad()
            loss = hybrid_loss_torch(model(xb), yb)
            loss.backward()
            opt.step()
            n_steps += 1
        sched.step()
        print(json.dumps({"epoch": ep, "loss": round(float(loss), 4),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

    model.eval()
    with torch.no_grad():
        preds = []
        for i in range(0, len(test) - B + 1, B):
            preds.append(model(torch.from_numpy(test[i:i + B, :5])).numpy())
    pred = np.concatenate(preds)
    tgt = test[: len(pred), 5:25]
    gamma = model.output_norm.weight.detach().numpy()
    res = {
        "config": {"img": img, "batch": B, "epochs": epochs, "items": items,
                   "steps": n_steps},
        "head_gn_gamma": [round(float(v), 4) for v in gamma],
        "pred_std_per_channel": [round(float(pred[:, t].std()), 4)
                                 for t in range(20)],
        "csi20_per_horizon": csi_per_horizon(pred, tgt),
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
