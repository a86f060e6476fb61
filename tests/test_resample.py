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


# ---------------------------------------------------------------------------
# Dense 3x3-window DySample formulation (round 5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("radius,lim", [(1, 0.74), (2, 1.7)])
def test_dysample_window_matches_exact_gather(rng, radius, lim):
    """Window path == exact grouped-gather path (fwd + all grads) for
    offsets anywhere inside the |e| < r exactness domain, incl. near the
    window edge and the image border. lim=1.7 covers the worst measured
    trained offset (dec2 1.11 px) with margin."""
    from kmunet_tpu.ops import sample as S

    B, h, w, C, G, s = 2, 9, 11, 8, 4, 2
    x = jnp.asarray(rng.normal(size=(B, h, w, C)), jnp.float32)
    off = rng.uniform(-lim, lim, (2, B, h, w, s, s, G)).astype(np.float32)
    sub = (np.arange(s) - (s - 1) / 2) / s
    ex = jnp.asarray(off[0] + sub[None, None, None, None, :, None])
    ey = jnp.asarray(off[1] + sub[None, None, None, :, None, None])

    def ref(x, ex, ey):
        ii = jnp.arange(h, dtype=jnp.float32)[None, :, None, None, None, None]
        jj = jnp.arange(w, dtype=jnp.float32)[None, None, :, None, None, None]
        xs = (ex + jj).transpose(0, 5, 1, 3, 2, 4).reshape(B, G, s * h, s * w)
        ys = (ey + ii).transpose(0, 5, 1, 3, 2, 4).reshape(B, G, s * h, s * w)
        return S.bilinear_gather_grouped_xla(x, xs, ys, "border")

    win = lambda *a: S.dysample_window_upsample(*a, radius=radius)  # noqa: E731
    got = win(x, ex, ey)
    want = ref(x, ex, ey)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    gw = jax.grad(lambda *a: jnp.sum(jnp.sin(win(*a))),
                  argnums=(0, 1, 2))(x, ex, ey)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2))(x, ex, ey)
    for a, b in zip(gw, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


@pytest.mark.parametrize("style", ["lp", "pl"])
def test_dysample_module_window_vs_exact(rng, style):
    """DySample(window=True) == DySample(window=False) with REAL learned-
    offset magnitudes (conv weights scaled so offsets ~0.1 px, 7.5 sigma inside the window domain)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    mod_w = DySample(scale=2, style=style, groups=4, window=True)
    mod_e = DySample(scale=2, style=style, groups=4, window=False)
    params = mod_w.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda a: a * 100.0 if a.ndim == 4 else a, params)

    got = mod_w.apply(params, x)
    want = mod_e.apply(params, x)
    assert float(jnp.abs(jnp.asarray(params["params"]["offset"]["kernel"])).max()) > 0.01
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    gw = jax.grad(lambda p: jnp.sum(jnp.cos(mod_w.apply(p, x))))(params)
    ge = jax.grad(lambda p: jnp.sum(jnp.cos(mod_e.apply(p, x))))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), gw, ge)


def test_dysample_window_out_of_domain_clamps(rng):
    """Offsets beyond the 3x3 window saturate at the window edge (the
    documented deviation) instead of producing garbage."""
    from kmunet_tpu.ops import sample as S

    B, h, w, C, G, s = 1, 6, 6, 4, 1, 2
    x = jnp.asarray(rng.normal(size=(B, h, w, C)), jnp.float32)
    big = jnp.full((B, h, w, s, s, G), 4.5, jnp.float32)   # way out of domain
    edge = jnp.full((B, h, w, s, s, G), 2.0 - 1e-3, jnp.float32)
    got = S.dysample_window_upsample(x, big, big)
    want = S.dysample_window_upsample(x, edge, edge)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert np.isfinite(np.asarray(got)).all()
