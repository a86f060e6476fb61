"""Swin-UNet pretrained-checkpoint surgery (Swim_Unet.py:1066-1101 port).

No pretrained .pth exists in this environment (no egress), so — as with the
LPIPS converter — the loader is exercised on FABRICATED torch-layout state
dicts: shapes derived from the real flax tree by inverting the documented
transposes, values random. That leaves only literal weight values untested.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmunet_tpu.models.swin_ckpt import load_swin_state_dict
from kmunet_tpu.models.swin_unet import SwinUNet


@pytest.fixture(scope="module")
def tiny_swin():
    model = SwinUNet(num_classes=4, patch_size=4, embed_dim=24, window=4,
                     depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24))
    x = jnp.zeros((1, 32, 32, 5))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def _enc_state_dict(params, rng, in_chans=3):
    """Fabricate the ImageNet-style encoder-only dump (torch layouts)."""
    sd = {}
    t = lambda a: np.asarray(a).T  # flax (in,out) -> torch (out,in)

    def rand_like_t(a):
        return rng.standard_normal(np.asarray(a).T.shape).astype(np.float32)

    # patch embed at ImageNet's 3 input channels (shape-mismatches our 5)
    e = params["patch_embed"]["kernel"].shape[-1]
    sd["patch_embed.proj.weight"] = rng.standard_normal((e, in_chans, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.standard_normal((e,)).astype(np.float32)
    sd["patch_embed.norm.weight"] = rng.standard_normal((e,)).astype(np.float32)
    sd["patch_embed.norm.bias"] = rng.standard_normal((e,)).astype(np.float32)

    for i in range(4):
        for d in range(2):
            blk = params[f"enc{i}_blk{d}"]
            p = f"layers.{i}.blocks.{d}."
            sd[p + "norm1.weight"] = rng.standard_normal(blk["norm1"]["scale"].shape).astype(np.float32)
            sd[p + "norm1.bias"] = rng.standard_normal(blk["norm1"]["bias"].shape).astype(np.float32)
            sd[p + "attn.qkv.weight"] = rand_like_t(blk["attn"]["qkv"]["kernel"])
            sd[p + "attn.qkv.bias"] = rng.standard_normal(blk["attn"]["qkv"]["bias"].shape).astype(np.float32)
            sd[p + "attn.proj.weight"] = rand_like_t(blk["attn"]["proj"]["kernel"])
            sd[p + "attn.proj.bias"] = rng.standard_normal(blk["attn"]["proj"]["bias"].shape).astype(np.float32)
            sd[p + "attn.relative_position_bias_table"] = rng.standard_normal(
                blk["attn"]["relative_position_bias_table"].shape).astype(np.float32)
            # buffer that must be ignored
            sd[p + "attn.relative_position_index"] = np.zeros((16, 16), np.int64)
            sd[p + "norm2.weight"] = rng.standard_normal(blk["norm2"]["scale"].shape).astype(np.float32)
            sd[p + "norm2.bias"] = rng.standard_normal(blk["norm2"]["bias"].shape).astype(np.float32)
            sd[p + "mlp.fc1.weight"] = rand_like_t(blk["fc1"]["kernel"])
            sd[p + "mlp.fc1.bias"] = rng.standard_normal(blk["fc1"]["bias"].shape).astype(np.float32)
            sd[p + "mlp.fc2.weight"] = rand_like_t(blk["fc2"]["kernel"])
            sd[p + "mlp.fc2.bias"] = rng.standard_normal(blk["fc2"]["bias"].shape).astype(np.float32)
        if i < 3:
            mg = params[f"merge{i}"]
            sd[f"layers.{i}.downsample.norm.weight"] = rng.standard_normal(
                mg["norm"]["scale"].shape).astype(np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = rng.standard_normal(
                mg["norm"]["bias"].shape).astype(np.float32)
            sd[f"layers.{i}.downsample.reduction.weight"] = rand_like_t(mg["reduction"]["kernel"])
    sd["norm.weight"] = rng.standard_normal(params["norm"]["scale"].shape).astype(np.float32)
    sd["norm.bias"] = rng.standard_normal(params["norm"]["bias"].shape).astype(np.float32)
    sd["head.weight"] = rng.standard_normal((1000, e * 8)).astype(np.float32)  # ignored
    return sd


def test_encoder_mirror_load(tiny_swin):
    """The 'model'-keyed ImageNet dump loads the encoder AND mirrors
    layers.N into layers_up.(3-N) (Swim_Unet.py:1085-1091)."""
    model, params = tiny_swin
    rng = np.random.default_rng(0)
    sd = _enc_state_dict(params, rng)
    new, report = load_swin_state_dict(params, {"model": sd})

    # encoder weights landed transposed
    got = np.asarray(new["enc1_blk0"]["attn"]["qkv"]["kernel"])
    want = sd["layers.1.blocks.0.attn.qkv.weight"].T
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    got = np.asarray(new["merge0"]["reduction"]["kernel"])
    np.testing.assert_allclose(got, sd["layers.0.downsample.reduction.weight"].T)

    # decoder mirror: dec{i}_blk{d} == encoder layers.(3-i) blocks
    for i in (1, 2, 3):
        src = sd[f"layers.{3 - i}.blocks.1.mlp.fc2.weight"].T
        got = np.asarray(new[f"dec{i}_blk1"]["fc2"]["kernel"])
        np.testing.assert_allclose(got, src)

    # 3-channel ImageNet patch embed vs our 5-frame stem: dropped, unchanged
    assert any("patch_embed.proj.weight" in s for s in report["shape_mismatch"])
    np.testing.assert_allclose(np.asarray(new["patch_embed"]["kernel"]),
                               np.asarray(params["patch_embed"]["kernel"]))
    # buffers/head ignored, not errors
    assert any("relative_position_index" in k for k in report["unmatched"])
    assert "head.weight" in report["unmatched"]
    assert len(report["loaded"]) > 50


def test_full_dump_prefix_strip(tiny_swin):
    """The non-'model' branch strips the 17-char prefix and deletes output
    keys (Swim_Unet.py:1074-1079)."""
    model, params = tiny_swin
    rng = np.random.default_rng(1)
    norm_up = rng.standard_normal(params["norm_up"]["scale"].shape).astype(np.float32)
    out_w = rng.standard_normal((4, 24, 1, 1)).astype(np.float32)
    sd = {
        "module.swin_unet." + "norm_up.weight": norm_up,
        "module.swin_unet." + "output.weight": out_w,  # must be deleted
    }
    new, report = load_swin_state_dict(params, sd)
    np.testing.assert_allclose(np.asarray(new["norm_up"]["scale"]), norm_up)
    # output head untouched
    np.testing.assert_allclose(np.asarray(new["output"]["kernel"]),
                               np.asarray(params["output"]["kernel"]))
    assert "output.weight" not in [k for k in report["loaded"]]


def test_loaded_params_still_run(tiny_swin):
    model, params = tiny_swin
    rng = np.random.default_rng(2)
    new, _ = load_swin_state_dict(params, {"model": _enc_state_dict(params, rng)})
    y = model.apply({"params": new}, jnp.ones((1, 32, 32, 5)) * 0.3)
    assert y.shape == (1, 32, 32, 4)
    assert bool(jnp.isfinite(y).all())
