"""Selective-scan parity vs a sequential numpy oracle (the recurrence the
mamba_ssm CUDA kernel implements), plus Mamba block/UNet smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.ops.scan import selective_scan
from kmunet_tpu.nn.mamba import MambaBlock
from kmunet_tpu.models.mamba_unet import Mamba_UNet, DMFMLayer


def sequential_oracle(x, dt, A, B, C, D):
    """h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t ; y = C_t . h_t + D x_t."""
    Bb, L, Dd = x.shape
    N = A.shape[1]
    y = np.zeros_like(x, dtype=np.float64)
    for b in range(Bb):
        h = np.zeros((Dd, N))
        for t in range(L):
            decay = np.exp(dt[b, t][:, None] * A)
            h = decay * h + (dt[b, t] * x[b, t])[:, None] * B[b, t][None, :]
            y[b, t] = h @ C[b, t] + D * x[b, t]
    return y


def test_selective_scan_matches_sequential(rng):
    Bb, L, Dd, N = 2, 17, 6, 4
    x = rng.normal(size=(Bb, L, Dd)).astype(np.float32)
    dt = rng.uniform(0.001, 0.1, (Bb, L, Dd)).astype(np.float32)
    A = -rng.uniform(0.5, 4.0, (Dd, N)).astype(np.float32)
    Bm = rng.normal(size=(Bb, L, N)).astype(np.float32)
    Cm = rng.normal(size=(Bb, L, N)).astype(np.float32)
    D = rng.normal(size=(Dd,)).astype(np.float32)
    got = np.asarray(selective_scan(*map(jnp.asarray, (x, dt, A, Bm, Cm, D))))
    want = sequential_oracle(x, dt, A, Bm, Cm, D)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mamba_block_shapes_and_grad(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 24)).astype(np.float32))
    mod = MambaBlock(d_model=24)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_mamba_block_is_causal(rng):
    """Changing a late token must not affect earlier outputs."""
    x = rng.normal(size=(1, 32, 16)).astype(np.float32)
    mod = MambaBlock(d_model=16)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y1 = np.asarray(mod.apply(params, jnp.asarray(x)))
    x2 = x.copy()
    x2[0, 20:] += 1.0
    y2 = np.asarray(mod.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[0, :20], y2[0, :20], atol=1e-5)
    assert np.abs(y1[0, 20:] - y2[0, 20:]).max() > 1e-3


def test_dmfm_and_mamba_unet_forward(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 24)).astype(np.float32))
    dm = DMFMLayer(output_dim=32)
    v = dm.init(jax.random.PRNGKey(0), x)
    assert dm.apply(v, x).shape == (1, 8, 8, 32)

    # 32^2 keeps every stage >= 2x2 through the 4 maxpools while making the
    # deep DMFM scans (L = H*W) 4x shorter — the CPU harness's hot spot.
    model = Mamba_UNet(predicted_frames=3)
    xin = jnp.asarray(rng.random((1, 32, 32, 5)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), xin)
    y = model.apply(v, xin)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
