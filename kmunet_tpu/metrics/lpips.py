"""LPIPS (AlexNet) perceptual metric, flax port.

The reference evaluator uses ``lpips.LPIPS(net='alex')`` with pretrained
ImageNet+LPIPS weights downloaded from the net (metrics.py:37-39,154-171).
This environment has no egress, so the weights cannot be fetched here; this
module implements the exact architecture and loads weights from a local
``.npz`` (converted from the torch checkpoints with ``convert_torch_lpips``)
when available. Without weights the Evaluator reports LPIPS as NaN.

Math (lpips v0.1 'alex'):
    x -> (x - shift) / scale               # per-channel normalization
    5 AlexNet feature stages (convs + ReLU, maxpools between)
    per stage: unit-normalize channels, d = (f1 - f2)^2, 1x1 conv (lin_k),
    spatial mean; LPIPS = sum over stages.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad), 'M' = maxpool 3x3 s2
_ALEX_CFG = [
    (64, 11, 4, 2), "M",
    (192, 5, 1, 2), "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_STAGE_ENDS = {0, 1, 2, 3, 4}  # relu outputs after each conv are the taps

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def alexnet_features(x: jnp.ndarray, params: dict) -> list[jnp.ndarray]:
    """x: (B, H, W, 3) in [-1, 1]. Returns the 5 relu feature maps."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for item in _ALEX_CFG:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        _, k, s, p = item
        x = jax.nn.relu(_conv(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], s, p))
        feats.append(x)
        ci += 1
    return feats


def lpips_distance(x1: jnp.ndarray, x2: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Per-image LPIPS distance. x1/x2: (B, H, W, 3) in [-1, 1]."""
    f1 = alexnet_features(x1, params)
    f2 = alexnet_features(x2, params)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        an = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        bn = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d = (an - bn) ** 2
        w = params[f"lin{i}_w"]  # (1,1,C,1)
        d = jax.lax.conv_general_dilated(
            d, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        total = total + jnp.mean(d, axis=(1, 2))[:, 0]
    return total


def load_lpips_params(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def make_lpips_fn(weights_path: Optional[str] = None):
    """Returns an Evaluator-compatible lpips_fn(pred, true) over (B, T, H, W)
    normalized [0,1] frames, or None when no weights are available."""
    if weights_path is None:
        return None
    params = load_lpips_params(weights_path)

    @jax.jit
    def fn(pred, true):
        B, T = pred.shape[:2]
        def prep(x):
            x = x.reshape(B * T, *x.shape[2:])[..., None]
            x = jnp.repeat(x, 3, axis=-1)
            return x * 2.0 - 1.0
        return lpips_distance(prep(pred), prep(true), params).reshape(B, T)

    return fn


# lpips v0.1 'alex' state_dict key names: the package builds each slice with
# the GLOBAL torchvision-alexnet feature indices as child names
# (lpips/pretrained_networks.py: slice2.add_module(str(x), features[x]) for
# x in range(2,5)), so the 5 conv layers live at these keys:
_TORCH_CONV_KEYS = [
    "net.slice1.0", "net.slice2.3", "net.slice3.6", "net.slice4.8", "net.slice5.10",
]
_TORCH_LIN_KEYS = [f"lin{i}.model.1" for i in range(5)]


def convert_lpips_state_dict(state_dict: dict) -> dict:
    """Map a torch ``lpips.LPIPS(net='alex')`` state_dict (tensors or numpy
    arrays) to this module's npz param naming/layout (HWIO convs).

    Accepts the full-module dict (``torch.save(lpips.LPIPS(net='alex')
    .state_dict(), p)``); the official alex.pth shard alone holds only the
    lin heads — the AlexNet convs must be present too.
    """
    def npy(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params = {}
    for ci, key in enumerate(_TORCH_CONV_KEYS):
        params[f"conv{ci}_w"] = npy(state_dict[f"{key}.weight"]).transpose(2, 3, 1, 0)
        params[f"conv{ci}_b"] = npy(state_dict[f"{key}.bias"])
    for i, key in enumerate(_TORCH_LIN_KEYS):
        params[f"lin{i}_w"] = npy(state_dict[f"{key}.weight"]).transpose(2, 3, 1, 0)
    return params


def convert_torch_lpips(out_path: str, state_dict_path: Optional[str] = None) -> None:
    """Offline converter: torch lpips checkpoint -> npz.

    With ``state_dict_path``: load a saved ``LPIPS(net='alex').state_dict()``
    (.pth) — needs only torch. Without it: instantiate the lpips package
    (downloads pretrained weights; run outside this sandbox).
    """
    import torch

    if state_dict_path is not None:
        sd = torch.load(state_dict_path, map_location="cpu")
    else:  # pragma: no cover — needs egress
        import lpips as lpips_pkg

        sd = lpips_pkg.LPIPS(net="alex").state_dict()
    np.savez(out_path, **convert_lpips_state_dict(sd))
