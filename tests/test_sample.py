"""grid_sample parity vs torch (CPU) — the reference's native gather op
(DySample_md.py:60, models/TrajGru.py:56)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmunet_tpu.ops import grid_sample_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_matches_torch(rng, align_corners, padding_mode):
    B, H, W, C = 2, 9, 11, 4
    Ho, Wo = 13, 7
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(B, Ho, Wo, 2)).astype(np.float32)

    got = np.asarray(
        grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(grid),
            align_corners=align_corners, padding_mode=padding_mode,
        )
    )
    want = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        align_corners=align_corners,
        padding_mode=padding_mode,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_far_outside(rng, padding_mode):
    """Coords many pixels outside the image: exercises the clipped-gather
    aliasing + per-tap masks of the single-gather patch formulation."""
    B, H, W, C = 2, 6, 5, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-4.0, 4.0, size=(B, 8, 9, 2)).astype(np.float32)

    got = np.asarray(
        grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(grid),
            align_corners=False, padding_mode=padding_mode,
        )
    )
    want = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", align_corners=False, padding_mode=padding_mode,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(14, 22), (5, 6)])  # up / down
def test_resize_bilinear_matches_torch_interpolate(rng, align_corners, size):
    """resize_bilinear (separable two-matmul formulation) == F.interpolate.

    The skip-attention path resizes with align_corners=True
    (KM_UNetV3_SH.py:493-495); the LAPS decoder upsamples the same way."""
    from kmunet_tpu.ops.sample import resize_bilinear

    B, H, W, C = 2, 7, 11, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), size,
                                     align_corners=align_corners))
    want = (
        F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
                      mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_resize_bilinear_grad_is_transpose(rng):
    """The separable resize must be natively differentiable (no custom VJP):
    grad wrt img of sum(R(img)*g) == Ry^T g Rx."""
    import jax

    from kmunet_tpu.ops.sample import resize_bilinear

    img = jnp.asarray(rng.normal(size=(1, 5, 6, 2)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 9, 11, 2)).astype(np.float32))
    grad = jax.grad(
        lambda i: jnp.sum(resize_bilinear(i, (9, 11), align_corners=True) * g)
    )(img)
    # finite-difference spot check
    eps = 1e-3
    d = jnp.zeros_like(img).at[0, 2, 3, 1].set(eps)
    f = lambda i: float(jnp.sum(resize_bilinear(i, (9, 11), align_corners=True) * g))  # noqa: E731
    fd = (f(img + d) - f(img - d)) / (2 * eps)
    np.testing.assert_allclose(float(grad[0, 2, 3, 1]), fd, rtol=1e-3)
