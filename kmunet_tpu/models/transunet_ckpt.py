"""Load official R50+ViT-B/16 ``.npz`` checkpoints into TransUNet.

Parity with the reference's ``VisionTransformer.load_from``
(models/TransUnet.py:720-768), which ingests the *JAX-format* ViT
checkpoints released with the original ViT repo — convenient here, since our
parameters are already HWIO/row-major: no kernel transposes are needed
except splitting the fused attention heads.

Only the transformer + patch embedding + position embeddings + ResNet stem
are loaded (the decoder is task-specific and trained from scratch, exactly
as the reference does).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax


def _posembed(stored: np.ndarray, n_patches: int) -> np.ndarray:
    """Resize position embeddings (drop cls token; bilinear-grid zoom if the
    patch grid differs — TransUnet.py:739-757)."""
    if stored.shape[1] == n_patches + 1:
        stored = stored[:, 1:]
    if stored.shape[1] == n_patches:
        return stored
    import math

    old = int(math.sqrt(stored.shape[1]))
    new = int(math.sqrt(n_patches))
    grid = stored.reshape(old, old, -1)
    from kmunet_tpu.data.resize import Resizer

    r = Resizer((old, old), (new, new))
    # Resizer works on (..., H, W); move channels first
    zoomed = r(np.moveaxis(grid, -1, 0)).transpose(1, 2, 0)
    return zoomed.reshape(1, new * new, -1)


def load_vit_npz(params, npz_path: str, n_layers: int = 12):
    """Returns a new TransUNet param tree with ViT/R50 weights loaded."""
    w = np.load(npz_path)
    p = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)

    def put(path, value):
        node = p
        *parents, leaf = path
        for k in parents:
            node = node[k]
        assert node[leaf].shape == value.shape, (path, node[leaf].shape, value.shape)
        node[leaf] = jnp.asarray(value)

    put(["patch_embeddings", "kernel"], w["embedding/kernel"])
    put(["patch_embeddings", "bias"], w["embedding/bias"])
    put(["encoder_norm", "scale"], w["Transformer/encoder_norm/scale"])
    put(["encoder_norm", "bias"], w["Transformer/encoder_norm/bias"])
    n_patches = p["position_embeddings"].shape[1]
    put(["position_embeddings"],
        _posembed(w["Transformer/posembed_input/pos_embedding"], n_patches))

    for i in range(n_layers):
        root = f"Transformer/encoderblock_{i}"
        blk = p[f"block{i}"]
        att = f"{root}/MultiHeadDotProductAttention_1"
        for name, ours in [("query", "query"), ("key", "key"), ("value", "value")]:
            blk["attn"][ours]["kernel"] = jnp.asarray(w[f"{att}/{name}/kernel"])
            blk["attn"][ours]["bias"] = jnp.asarray(w[f"{att}/{name}/bias"])
        blk["attn"]["out"]["kernel"] = jnp.asarray(w[f"{att}/out/kernel"])
        blk["attn"]["out"]["bias"] = jnp.asarray(w[f"{att}/out/bias"])
        blk["fc1"]["kernel"] = jnp.asarray(w[f"{root}/MlpBlock_3/Dense_0/kernel"])
        blk["fc1"]["bias"] = jnp.asarray(w[f"{root}/MlpBlock_3/Dense_0/bias"])
        blk["fc2"]["kernel"] = jnp.asarray(w[f"{root}/MlpBlock_3/Dense_1/kernel"])
        blk["fc2"]["bias"] = jnp.asarray(w[f"{root}/MlpBlock_3/Dense_1/bias"])
        blk["attention_norm"]["scale"] = jnp.asarray(w[f"{root}/LayerNorm_0/scale"])
        blk["attention_norm"]["bias"] = jnp.asarray(w[f"{root}/LayerNorm_0/bias"])
        blk["ffn_norm"]["scale"] = jnp.asarray(w[f"{root}/LayerNorm_2/scale"])
        blk["ffn_norm"]["bias"] = jnp.asarray(w[f"{root}/LayerNorm_2/bias"])

    # ResNet stem (if hybrid checkpoint)
    if "conv_root/kernel" in w:
        hm = p["hybrid_model"]
        hm["root_conv"]["kernel"] = jnp.asarray(w["conv_root/kernel"])
        hm["root_gn"]["scale"] = jnp.asarray(w["gn_root/scale"]).reshape(-1)
        hm["root_gn"]["bias"] = jnp.asarray(w["gn_root/bias"]).reshape(-1)
        units = {1: 3, 2: 4, 3: 9}
        for b, n_units in units.items():
            for u in range(1, n_units + 1):
                src = f"block{b}/unit{u}"
                dst = hm[f"block{b}_unit{u}"]
                for conv in ("conv1", "conv2", "conv3"):
                    dst[conv]["kernel"] = jnp.asarray(w[f"{src}/{conv}/kernel"])
                for gn in ("gn1", "gn2", "gn3"):
                    dst[gn]["scale"] = jnp.asarray(w[f"{src}/{gn}/scale"]).reshape(-1)
                    dst[gn]["bias"] = jnp.asarray(w[f"{src}/{gn}/bias"]).reshape(-1)
                if f"{src}/conv_proj/kernel" in w:
                    dst["downsample"]["kernel"] = jnp.asarray(w[f"{src}/conv_proj/kernel"])
                    dst["gn_proj"]["scale"] = jnp.asarray(w[f"{src}/gn_proj/scale"]).reshape(-1)
                    dst["gn_proj"]["bias"] = jnp.asarray(w[f"{src}/gn_proj/bias"]).reshape(-1)
    return p
