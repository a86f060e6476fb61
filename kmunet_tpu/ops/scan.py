"""Selective SSM scan — the TPU replacement for mamba_ssm's CUDA kernel.

The recurrence (Mamba / S6):

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is a first-order linear recurrence, solved in log-depth with
``jax.lax.associative_scan`` over (decay, increment) pairs — mathematically
identical to the sequential CUDA scan in `mamba_ssm` (used by
`/root/reference/models/Mamba_UNet.py:51-52`). State is carried in fp32 (the
reference forces fp32 into Mamba, Mamba_UNet.py:25-26); a Pallas chunked
variant can replace this for long L (kernels/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Pallas fused-scan fast path (kernels/scan_pallas.py): None = auto (TPU
# only, supported shapes); True/False to force. The XLA associative-scan
# formulation below materializes the (B, L, D, N) state expansion in HBM
# log2(L) times; the kernel streams it through VMEM instead (measured 28x
# on the Mamba-UNet refinement-layer shape, BASELINE.md round 2).
USE_PALLAS_SCAN: bool | None = None


def _pallas_scan_ok(x, A) -> bool:
    if USE_PALLAS_SCAN is not None:
        return USE_PALLAS_SCAN
    if jax.default_backend() != "tpu":
        return False
    from kmunet_tpu.kernels import scan_pallas

    B, L, D = x.shape
    return scan_pallas.supported(L, D, A.shape[-1])


def selective_scan(
    x: jnp.ndarray,      # (B, L, D)   input sequence (post-conv, pre-gate)
    dt: jnp.ndarray,     # (B, L, D)   positive step sizes (softplus'd)
    A: jnp.ndarray,      # (D, N)      negative-real state matrix
    Bmat: jnp.ndarray,   # (B, L, N)   input projection (input-dependent)
    Cmat: jnp.ndarray,   # (B, L, N)   output projection (input-dependent)
    D: jnp.ndarray,      # (D,)        skip weights
) -> jnp.ndarray:
    """Returns y: (B, L, D)."""
    if _pallas_scan_ok(x, A):
        from kmunet_tpu.kernels.scan_pallas import selective_scan_pallas

        return selective_scan_pallas(x, dt, A, Bmat, Cmat, D)
    return _selective_scan_xla(x, dt, A, Bmat, Cmat, D)


def _selective_scan_xla(x, dt, A, Bmat, Cmat, D):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    decay = jnp.exp(dtf[..., None] * A.astype(jnp.float32))           # (B,L,D,N)
    inc = (dtf * xf)[..., None] * Bmat.astype(jnp.float32)[:, :, None, :]  # (B,L,D,N)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (decay, inc), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cmat.astype(jnp.float32))
    y = y + xf * D.astype(jnp.float32)
    return y.astype(dtype)


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def selective_scan_sharded(x, dt, A, Bmat, Cmat, D, mesh, axis: str = "spatial",
                           batch_axis: str | None = None):
    """Sequence-parallel selective scan: L sharded across a mesh axis.

    The reference cannot scale sequence length at all (SURVEY.md §5); here
    the token axis is sharded and the scan decomposes as a two-level prefix
    scan:

      1. each device runs a local associative scan over its L-chunk,
      2. chunk carries (decay product, final state) are prefix-combined
         across devices with log2(n) ``ppermute`` hops over ICI,
      3. the incoming prefix state is folded into the local chunk.

    Implemented with shard_map so the collective schedule is explicit.
    Inputs/outputs as ``selective_scan``; arrays must be sharded (or
    shardable) with L on ``axis``. ``batch_axis`` additionally shards the
    batch dim (pass the mesh's data axis when calling from inside a
    data-parallel jit so shard_map doesn't all-gather the batch).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]
    # Static-shape eligibility (shapes are known at trace time): L must split
    # evenly over the axis — else run the plain scan (e.g. deep-stage token
    # grids smaller than the mesh). The batch axis is optional sugar: drop it
    # when B doesn't divide (flax init traces with B=1).
    if x.shape[1] % n_shards != 0 or n_shards == 1:
        return selective_scan(x, dt, A, Bmat, Cmat, D)
    if batch_axis is not None and x.shape[0] % mesh.shape[batch_axis] != 0:
        batch_axis = None

    def local(x, dt, Bm, Cm, A, D):
        xf = x.astype(jnp.float32)
        dtf = dt.astype(jnp.float32)
        decay = jnp.exp(dtf[..., None] * A.astype(jnp.float32))
        inc = (dtf * xf)[..., None] * Bm.astype(jnp.float32)[:, :, None, :]
        a_cum, h_local = jax.lax.associative_scan(_combine, (decay, inc), axis=1)

        # chunk summary: total decay product and final state of this chunk
        a_tot = a_cum[:, -1]
        h_tot = h_local[:, -1]

        # Inclusive prefix-combine of chunk transforms across devices
        # (Hillis-Steele, log2(n) ppermute hops). Transform T_i maps an
        # incoming state h to a_i*h + b_i; combining with the *older*
        # received segment: a <- a_cur*a_recv, b <- a_cur*b_recv + b_cur.
        idx = jax.lax.axis_index(axis)
        ca, cb = a_tot, h_tot
        shift = 1
        while shift < n_shards:
            perm = [(i, i + shift) for i in range(n_shards - shift)]
            ra = jax.lax.ppermute(ca, axis, perm)
            rb = jax.lax.ppermute(cb, axis, perm)
            use = (idx >= shift)
            new_ca = jnp.where(use, ca * ra, ca)
            new_cb = jnp.where(use, ca * rb + cb, cb)
            ca, cb = new_ca, new_cb
            shift *= 2
        # exclusive prefix state entering this chunk = inclusive of i-1
        pb = jax.lax.ppermute(cb, axis, [(i, i + 1) for i in range(n_shards - 1)])
        pb = jnp.where(idx == 0, jnp.zeros_like(pb), pb)

        # fold the incoming prefix state into local results:
        # h_t <- h_t + a_cum_t * pb
        h = h_local + a_cum * pb[:, None]
        y = jnp.einsum("bldn,bln->bld", h, Cm.astype(jnp.float32))
        y = y + xf * D.astype(jnp.float32)
        return y.astype(x.dtype)

    spec_l = P(batch_axis, axis, None)
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_l, spec_l, spec_l, spec_l, P(None, None), P(None)),
        out_specs=spec_l,
    )(x, dt, Bmat, Cmat, A, D)
    return out
