"""DySample / DeformConv2d behavioral parity tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.nn.resample import DySample, DeformConv2d, pixel_shuffle, pixel_unshuffle

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_pixel_shuffle_matches_torch(rng):
    x = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2))
    np.testing.assert_allclose(back, x, atol=1e-6)


def _zero_offsets(params):
    p = jax.tree.map(lambda a: a, params)
    p["params"]["offset"]["kernel"] = jnp.zeros_like(p["params"]["offset"]["kernel"])
    p["params"]["offset"]["bias"] = jnp.zeros_like(p["params"]["offset"]["bias"])
    return p


@pytest.mark.parametrize("style", ["lp", "pl"])
def test_dysample_zero_offsets_is_bilinear_upsample(rng, style):
    """With zero predicted offsets, the static init positions make DySample
    exactly bilinear 2x upsampling (align_corners=False), per the
    init_pos/0.25 construction (DySample_md.py:45-47,67)."""
    B, H, W, C = 2, 6, 5, 8
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    mod = DySample(scale=2, style=style, groups=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(_zero_offsets(params), jnp.asarray(x)))

    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dysample_learned_offsets_shape(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    mod = DySample(scale=2, style="lp", groups=4, dyscope=True)
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 16, 16, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_deform_conv_zero_offsets_is_conv(rng):
    B, H, W, C, out_c = 1, 7, 7, 3, 5
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    offset = np.zeros((B, H, W, 18), np.float32)
    mod = DeformConv2d(features=out_c)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(offset))
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(offset)))

    kern = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    want = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(got, np.asarray(want) + bias, atol=1e-4)


def test_deform_conv_fractional_offset_matches_torch_grid_sample(rng):
    """Constant fractional offsets == sampling a shifted image: compare the
    deform branch against torch grid_sample-based shifted conv."""
    B, H, W, C, out_c = 1, 6, 6, 2, 3
    dy, dx = 0.3, -0.45
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    offset = np.zeros((B, H, W, 18), np.float32)
    offset[..., 0::2] = dy
    offset[..., 1::2] = dx
    mod = DeformConv2d(features=out_c, use_bias=False)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(offset))
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(offset)))

    # Oracle: bilinear-shift x by (dy, dx) with zero padding, then plain conv.
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = 2 * (xs + dx + 0.5) / W - 1
    gy = 2 * (ys + dy + 0.5) / H - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1)[None].astype(np.float32))
    shifted = F.grid_sample(xt, grid, mode="bilinear", align_corners=False,
                            padding_mode="zeros").permute(0, 2, 3, 1).numpy()
    kern = np.asarray(params["params"]["kernel"])
    want = jax.lax.conv_general_dilated(
        shifted, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    # Borders differ by construction (zero-pad of the shifted image vs
    # bilinear-into-zeros); compare the interior.
    np.testing.assert_allclose(
        got[:, 2:-2, 2:-2], np.asarray(want)[:, 2:-2, 2:-2], atol=1e-4
    )
