"""Swin-UNet pretrained-checkpoint surgery (reference ``load_from``).

Port of `/root/reference/models/Swim_Unet.py:1066-1101`: load a torch Swin
checkpoint into :class:`kmunet_tpu.models.swin_unet.SwinUNet` params with the
reference's exact semantics —

- a checkpoint WITH a ``"model"`` entry (the ImageNet swin-tiny release) is
  encoder-only: every encoder key ``layers.N...`` is ALSO mirrored into the
  decoder at ``layers_up.(3-N)...`` (Swim_Unet.py:1087-1091);
- a checkpoint WITHOUT ``"model"`` is a full-model dump whose keys carry a
  17-char prefix (``"module.swin_unet."``), which is stripped, and ``output``
  head keys are deleted (Swim_Unet.py:1073-1080);
- shape mismatches are dropped, unknown keys ignored (``strict=False``,
  Swim_Unet.py:1092-1097) — e.g. the 3-channel ImageNet ``patch_embed`` vs
  our 5-frame stem, or a window-7 relative-position table vs window 8.

Torch ``(out, in)`` linear weights transpose to flax ``(in, out)`` kernels;
convs transpose OIHW -> HWIO. Returns the updated params plus a report dict
(mirroring the ``msg`` the reference gets from ``load_state_dict``).
"""

from __future__ import annotations

import re
from typing import Mapping, Tuple

import numpy as np
import jax.numpy as jnp


def _translate(key: str):
    """torch SwinTransformerSys state-dict key -> (flax path tuple, kind).

    kind: 'linear' (transpose 2-D), 'conv' (OIHW->HWIO), 'direct', or None
    (buffers / keys with no flax analogue -> ignored, strict=False).
    """
    # buffers and heads that have no analogue in our tree
    if ("relative_position_index" in key or "attn_mask" in key
            or key.startswith("head.") or key.startswith("absolute_pos_embed")):
        return None, None

    if key == "patch_embed.proj.weight":
        return ("patch_embed", "kernel"), "conv"
    if key == "patch_embed.proj.bias":
        return ("patch_embed", "bias"), "direct"
    if key == "patch_embed.norm.weight":
        return ("patch_norm", "scale"), "direct"
    if key == "patch_embed.norm.bias":
        return ("patch_norm", "bias"), "direct"
    if key in ("norm.weight", "norm.bias"):
        return ("norm", {"weight": "scale", "bias": "bias"}[key.split(".")[1]]), "direct"
    if key in ("norm_up.weight", "norm_up.bias"):
        return ("norm_up", {"weight": "scale", "bias": "bias"}[key.split(".")[1]]), "direct"

    # final 4x expand (torch: up.expand / up.norm, Swim_Unet.py:624-650)
    m = re.fullmatch(r"up\.expand\.weight", key)
    if m:
        return ("final_expand", "expand", "kernel"), "linear"
    m = re.fullmatch(r"up\.norm\.(weight|bias)", key)
    if m:
        return ("final_expand", "norm", {"weight": "scale", "bias": "bias"}[m.group(1)]), "direct"
    if key == "output.weight":
        return ("output", "kernel"), "conv"

    # encoder blocks: layers.{i}.blocks.{d}.<sub>
    m = re.fullmatch(r"layers\.(\d)\.blocks\.(\d+)\.(.+)", key)
    if m:
        return _block_sub(f"enc{m.group(1)}_blk{m.group(2)}", m.group(3))
    # encoder downsample: layers.{i}.downsample.{norm,reduction}
    m = re.fullmatch(r"layers\.(\d)\.downsample\.norm\.(weight|bias)", key)
    if m:
        return ("merge" + m.group(1), "norm",
                {"weight": "scale", "bias": "bias"}[m.group(2)]), "direct"
    m = re.fullmatch(r"layers\.(\d)\.downsample\.reduction\.weight", key)
    if m:
        return ("merge" + m.group(1), "reduction", "kernel"), "linear"

    # decoder: layers_up.0 is the first PatchExpand (our 'up0')
    m = re.fullmatch(r"layers_up\.0\.expand\.weight", key)
    if m:
        return ("up0", "expand", "kernel"), "linear"
    m = re.fullmatch(r"layers_up\.0\.norm\.(weight|bias)", key)
    if m:
        return ("up0", "norm", {"weight": "scale", "bias": "bias"}[m.group(1)]), "direct"
    # decoder blocks: layers_up.{i}.blocks.{d} -> dec{i}_blk{d} (i = 1..3)
    m = re.fullmatch(r"layers_up\.(\d)\.blocks\.(\d+)\.(.+)", key)
    if m:
        return _block_sub(f"dec{m.group(1)}_blk{m.group(2)}", m.group(3))
    # decoder upsample: layers_up.{i}.upsample -> up{i} (i = 1, 2)
    m = re.fullmatch(r"layers_up\.(\d)\.upsample\.expand\.weight", key)
    if m:
        return (f"up{m.group(1)}", "expand", "kernel"), "linear"
    m = re.fullmatch(r"layers_up\.(\d)\.upsample\.norm\.(weight|bias)", key)
    if m:
        return (f"up{m.group(1)}", "norm",
                {"weight": "scale", "bias": "bias"}[m.group(2)]), "direct"
    # skip-fusion linears: concat_back_dim.{i}
    m = re.fullmatch(r"concat_back_dim\.(\d)\.weight", key)
    if m:
        return (f"concat_back_dim{m.group(1)}", "kernel"), "linear"
    m = re.fullmatch(r"concat_back_dim\.(\d)\.bias", key)
    if m:
        return (f"concat_back_dim{m.group(1)}", "bias"), "direct"
    return None, None


def _block_sub(block: str, sub: str):
    """Sub-key inside a SwinTransformerBlock -> our SwinBlock param path."""
    table = {
        "norm1.weight": (("norm1", "scale"), "direct"),
        "norm1.bias": (("norm1", "bias"), "direct"),
        "norm2.weight": (("norm2", "scale"), "direct"),
        "norm2.bias": (("norm2", "bias"), "direct"),
        "attn.qkv.weight": (("attn", "qkv", "kernel"), "linear"),
        "attn.qkv.bias": (("attn", "qkv", "bias"), "direct"),
        "attn.proj.weight": (("attn", "proj", "kernel"), "linear"),
        "attn.proj.bias": (("attn", "proj", "bias"), "direct"),
        "attn.relative_position_bias_table": (
            ("attn", "relative_position_bias_table"), "direct"),
        "mlp.fc1.weight": (("fc1", "kernel"), "linear"),
        "mlp.fc1.bias": (("fc1", "bias"), "direct"),
        "mlp.fc2.weight": (("fc2", "kernel"), "linear"),
        "mlp.fc2.bias": (("fc2", "bias"), "direct"),
    }
    if sub not in table:
        return None, None
    path, kind = table[sub]
    return (block,) + path, kind


def _convert(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return arr.T  # (out, in) -> (in, out)
    if kind == "conv":
        return arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return arr


def load_swin_state_dict(
    params, state_dict: Mapping[str, np.ndarray], n_layers: int = 4
) -> Tuple[dict, dict]:
    """Apply the reference's ``load_from`` surgery to flax SwinUNet params.

    ``state_dict``: either the raw torch checkpoint dict (with or without a
    ``"model"`` entry) or an already-unwrapped key->array mapping. Values may
    be torch tensors or numpy arrays. Returns ``(new_params, report)`` with
    ``report = {"loaded": [...], "shape_mismatch": [...], "unmatched": [...]}``.
    """
    if "model" in state_dict:
        # Encoder-only ImageNet checkpoint: mirror layers.N -> layers_up.(3-N)
        # (Swim_Unet.py:1085-1091).
        src = dict(state_dict["model"])
        for k, v in list(src.items()):
            if k.startswith("layers."):
                mirrored = f"layers_up.{n_layers - 1 - int(k[7])}" + k[8:]
                src.setdefault(mirrored, v)
    else:
        # Full-model dump: strip the 17-char "module.swin_unet." prefix and
        # drop the output head (Swim_Unet.py:1074-1079; the reference slices
        # k[17:] blindly — we strip only when the prefix is actually there so
        # already-unwrapped mappings load instead of silently mangling).
        pre = "module.swin_unet."
        src = {(k[len(pre):] if k.startswith(pre) else k): v
               for k, v in state_dict.items()}
        src = {k: v for k, v in src.items() if "output" not in k}

    flat = dict(params) if isinstance(params, dict) else params.unfreeze()  # shallow ok
    new = _tree_copy(flat)
    report = {"loaded": [], "shape_mismatch": [], "unmatched": []}
    for key, val in src.items():
        path, kind = _translate(key)
        if path is None:
            report["unmatched"].append(key)
            continue
        leaf_parent, leaf_key, exists = _descend(new, path)
        if not exists:
            report["unmatched"].append(key)
            continue
        arr = _convert(np.asarray(val), kind)
        cur = leaf_parent[leaf_key]
        if tuple(arr.shape) != tuple(cur.shape):
            report["shape_mismatch"].append(
                f"{key}: ckpt {tuple(arr.shape)} vs model {tuple(cur.shape)}")
            continue
        leaf_parent[leaf_key] = jnp.asarray(arr, dtype=cur.dtype)
        report["loaded"].append(key)
    return new, report


def load_swin_checkpoint(params, path: str):
    """Load a ``.pth`` torch checkpoint from disk (torch CPU unpickle) and
    apply :func:`load_swin_state_dict`."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in ckpt.items()} \
        if "model" not in ckpt else ckpt
    return load_swin_state_dict(params, sd)


def _tree_copy(tree):
    if isinstance(tree, Mapping):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree


def _descend(tree, path):
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            return None, None, False
        node = node[p]
    if not isinstance(node, dict) or path[-1] not in node:
        return None, None, False
    return node, path[-1], True
