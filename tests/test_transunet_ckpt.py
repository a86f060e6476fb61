"""TransUNet ViT-npz ingestion (reference load_from parity,
TransUnet.py:720-768) — synthesized checkpoint with official key layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.models.transunet import TransUNet
from kmunet_tpu.models.transunet_ckpt import load_vit_npz


def test_load_vit_npz_roundtrip(tmp_path, rng):
    model = TransUNet(num_classes=4, hidden=32, layers=2, heads=4, mlp_dim=64)
    x = jnp.zeros((1, 64, 64, 5))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    params = variables["params"]

    # Synthesize an npz with the official ViT/R50 key names, shaped from our
    # param tree (the official checkpoints are flax-format already).
    w = {}
    w["embedding/kernel"] = rng.normal(size=params["patch_embeddings"]["kernel"].shape).astype(np.float32)
    w["embedding/bias"] = rng.normal(size=params["patch_embeddings"]["bias"].shape).astype(np.float32)
    w["Transformer/encoder_norm/scale"] = rng.normal(size=(32,)).astype(np.float32)
    w["Transformer/encoder_norm/bias"] = rng.normal(size=(32,)).astype(np.float32)
    n_patches = params["position_embeddings"].shape[1]
    w["Transformer/posembed_input/pos_embedding"] = rng.normal(
        size=(1, n_patches + 1, 32)).astype(np.float32)  # with cls token
    for i in range(2):
        root = f"Transformer/encoderblock_{i}"
        blk = params[f"block{i}"]
        for nm in ("query", "key", "value", "out"):
            w[f"{root}/MultiHeadDotProductAttention_1/{nm}/kernel"] = rng.normal(
                size=blk["attn"][nm]["kernel"].shape).astype(np.float32)
            w[f"{root}/MultiHeadDotProductAttention_1/{nm}/bias"] = rng.normal(
                size=blk["attn"][nm]["bias"].shape).astype(np.float32)
        w[f"{root}/MlpBlock_3/Dense_0/kernel"] = rng.normal(size=(32, 64)).astype(np.float32)
        w[f"{root}/MlpBlock_3/Dense_0/bias"] = rng.normal(size=(64,)).astype(np.float32)
        w[f"{root}/MlpBlock_3/Dense_1/kernel"] = rng.normal(size=(64, 32)).astype(np.float32)
        w[f"{root}/MlpBlock_3/Dense_1/bias"] = rng.normal(size=(32,)).astype(np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            w[f"{root}/{ln}/scale"] = rng.normal(size=(32,)).astype(np.float32)
            w[f"{root}/{ln}/bias"] = rng.normal(size=(32,)).astype(np.float32)
    # ResNet root + one unit spot-check
    w["conv_root/kernel"] = rng.normal(
        size=params["hybrid_model"]["root_conv"]["kernel"].shape).astype(np.float32)
    w["gn_root/scale"] = rng.normal(size=(1, 1, 64)).astype(np.float32)
    w["gn_root/bias"] = rng.normal(size=(1, 1, 64)).astype(np.float32)
    units = {1: 3, 2: 4, 3: 9}
    for b, n_units in units.items():
        for u in range(1, n_units + 1):
            dst = params["hybrid_model"][f"block{b}_unit{u}"]
            src = f"block{b}/unit{u}"
            for conv in ("conv1", "conv2", "conv3"):
                w[f"{src}/{conv}/kernel"] = rng.normal(
                    size=dst[conv]["kernel"].shape).astype(np.float32)
            for gn in ("gn1", "gn2", "gn3"):
                c = dst[gn]["scale"].shape[0]
                w[f"{src}/{gn}/scale"] = rng.normal(size=(1, 1, c)).astype(np.float32)
                w[f"{src}/{gn}/bias"] = rng.normal(size=(1, 1, c)).astype(np.float32)
            if "downsample" in dst:
                w[f"{src}/conv_proj/kernel"] = rng.normal(
                    size=dst["downsample"]["kernel"].shape).astype(np.float32)
                c = dst["gn_proj"]["scale"].shape[0]
                w[f"{src}/gn_proj/scale"] = rng.normal(size=(1, 1, c)).astype(np.float32)
                w[f"{src}/gn_proj/bias"] = rng.normal(size=(1, 1, c)).astype(np.float32)

    path = str(tmp_path / "vit.npz")
    np.savez(path, **w)

    loaded = load_vit_npz(params, path, n_layers=2)
    np.testing.assert_array_equal(
        np.asarray(loaded["patch_embeddings"]["kernel"]), w["embedding/kernel"])
    np.testing.assert_array_equal(
        np.asarray(loaded["block1"]["fc1"]["kernel"]),
        w["Transformer/encoderblock_1/MlpBlock_3/Dense_0/kernel"])
    np.testing.assert_array_equal(
        np.asarray(loaded["hybrid_model"]["root_gn"]["scale"]),
        w["gn_root/scale"].reshape(-1))
    # position embedding: cls token dropped
    np.testing.assert_array_equal(
        np.asarray(loaded["position_embeddings"]),
        w["Transformer/posembed_input/pos_embedding"][:, 1:])

    # forward still runs with loaded params
    y = model.apply({"params": loaded, "batch_stats": variables["batch_stats"]},
                    jnp.zeros((1, 64, 64, 5)))
    assert y.shape == (1, 64, 64, 4)
