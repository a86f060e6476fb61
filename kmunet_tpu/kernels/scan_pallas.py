"""Pallas selective-scan kernel — the mamba_ssm CUDA-kernel replacement.

The XLA path (ops/scan.py::selective_scan) solves the S6 recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t        # h: (D, N)
    y_t = C_t . h_t + D * x_t

with ``jax.lax.associative_scan``, which MATERIALIZES the (B, L, D, N)
state expansion in HBM and rewrites it log2(L) times — at Mamba-UNet's
full-resolution refinement layers (L = 16384, D*N ~ 256..2048 — reference
runs 4 DMFM layers at H/1, models/Mamba_UNet.py:80-84,333) that is tens of
GB of traffic and ~45 ms per scan call.

This kernel never lets the expansion touch HBM. Per (batch, L-chunk) grid
step it:

  1. loads x/dt (Q, D) and B/C (Q, N) tiles (the ONLY HBM traffic:
     3D+2N lanes per token instead of log2(L) * D*N),
  2. expands to lane-packed (Q, D*N) work arrays with one-hot MXU matmuls
     (E1: d -> d*N+n block-repeat, E2: n -> cyclic repeat; iota-built, so
     no relayout/transpose of the VPU arrays),
  3. runs a Hillis-Steele log2(Q) scan on (decay, inc) pairs in VMEM —
     shifted operands are (1, 0)-padded, which IS the combine identity, so
     no masking is needed,
  4. folds in the running carry h (VMEM scratch, persists across the
     sequential chunk grid), and
  5. contracts back to y (Q, D) with the transposed one-hot (MXU) plus the
     D*x skip.

fp32 state throughout (the reference forces fp32 into mamba_ssm,
Mamba_UNet.py:25-26); bf16 inputs are upcast on load, outputs written in
the input dtype.

Backward: a second Pallas kernel (``_bwd_kernel``), same chunked VMEM
streaming in two phases over a (B, 2, n_chunks) grid:

  phase 0 (forward chunk order): re-run the forward scan, storing only the
      per-chunk ENTRY state h_{chunk_start-1} into a VMEM checkpoint array
      ((n_chunks, D*N) f32) — the (B, L, D, N) expansion still never
      touches HBM.
  phase 1 (REVERSE chunk order): per chunk, rebuild the in-chunk states
      from the checkpoint (forward Hillis-Steele), then solve the cotangent
      recurrence  hhat_t = g_t (x) C_t + a_{t+1} * hhat_{t+1}  with a
      mirrored *suffix* Hillis-Steele (shift-up instead of shift-down; the
      boundary message  M = a_0*hhat_0  of each chunk is the carry walked
      backward). All six input gradients fall out as lane-packed products
      contracted through the same one-hot matmuls as the forward.

The XLA VJP (associative scan, log2(L) HBM rewrites of (B,L,D,N), OOM at
B64 128^2) remains the fallback for unsupported shapes.

Measured (v5e, B16 L=16384 D=16 N=16, the Mamba-UNet refine-layer shape):
see BASELINE.md round-2 — the in-model effect is the headline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the four (Q, D*N) fp32 work arrays + tiles.
_VMEM_BUDGET = 10 * 2**20
_MAX_DN = 4096


def _pick_chunk(L: int, DN: int) -> int:
    for q in (512, 256, 128, 64, 32, 16, 8):
        if L % q:
            continue
        if 6 * q * DN * 4 < _VMEM_BUDGET:
            return q
    return 0


def supported(L: int, D: int, N: int) -> bool:
    DN = D * N
    return DN <= _MAX_DN and _pick_chunk(L, DN) >= 8


def _kernel(x_ref, dt_ref, b_ref, c_ref, a_ref, d_ref, y_ref, carry_ref,
            *, Q, D, N, n_chunks):
    i = pl.program_id(1)
    DN = D * N

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[0].astype(jnp.float32)      # (Q, D)
    dt = dt_ref[0].astype(jnp.float32)    # (Q, D)
    Bm = b_ref[0].astype(jnp.float32)     # (Q, N)
    Cm = c_ref[0].astype(jnp.float32)     # (Q, N)

    # One-hot expansions (flat index k = d*N + n, matching A.reshape(D*N)).
    e1 = (
        jax.lax.broadcasted_iota(jnp.int32, (D, DN), 1) // N
        == jax.lax.broadcasted_iota(jnp.int32, (D, DN), 0)
    ).astype(jnp.float32)                 # (D, DN): k//N == d
    e2 = (
        jax.lax.broadcasted_iota(jnp.int32, (N, DN), 1) % N
        == jax.lax.broadcasted_iota(jnp.int32, (N, DN), 0)
    ).astype(jnp.float32)                 # (N, DN): k%N == n

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    dt_e = dot(dt, e1)                    # (Q, DN)
    dx_e = dot(dt * x, e1)                # (Q, DN)
    b_e = dot(Bm, e2)                     # (Q, DN)

    a = jnp.exp(dt_e * a_ref[...])        # decay, a_ref broadcasts (1, DN)
    b = dx_e * b_e                        # increment

    # Hillis-Steele inclusive scan of h_t = a_t h_{t-1} + b_t over Q rows.
    # Shifted-in rows are (a=1, b=0) — the combine identity — so no mask.
    s = 1
    while s < Q:
        a_sh = jnp.pad(a, ((s, 0), (0, 0)), constant_values=1.0)[:Q]
        b_sh = jnp.pad(b, ((s, 0), (0, 0)))[:Q]
        b = a * b_sh + b
        a = a * a_sh
        s *= 2

    h = b + a * carry_ref[...]            # fold carry from previous chunks
    carry_ref[...] = h[Q - 1:Q, :]

    c_e = dot(Cm, e2)                     # (Q, DN)
    y = dot(h * c_e, e1.T)                # (Q, D): sum over n within d-block
    y_ref[0] = (y + x * d_ref[...]).astype(y_ref.dtype)


def _forward(x, dt, A, Bmat, Cmat, Dp, interpret):
    B, L, D = x.shape
    N = A.shape[-1]
    DN = D * N
    Q = _pick_chunk(L, DN)
    assert Q >= 8, f"unsupported scan shape L={L} D={D} N={N}"

    a_flat = A.astype(jnp.float32).reshape(1, DN)
    d_row = Dp.astype(jnp.float32).reshape(1, D)

    kern = functools.partial(_kernel, Q=Q, D=D, N=N, n_chunks=L // Q)
    return pl.pallas_call(
        kern,
        grid=(B, L // Q),
        in_specs=[
            pl.BlockSpec((1, Q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DN), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, DN), jnp.float32)],
        interpret=interpret,
    )(x, dt, Bmat, Cmat, a_flat, d_row)


def _bwd_kernel(x_ref, dt_ref, b_ref, c_ref, g_ref, a_ref, d_ref,
                dx_ref, ddt_ref, db_ref, dc_ref, da_ref, dd_ref,
                carry_ref, ckpt_ref, m_ref, daacc_ref, ddacc_ref,
                *, Q, D, N, n_chunks):
    p = pl.program_id(1)
    j = pl.program_id(2)
    DN = D * N

    x = x_ref[0].astype(jnp.float32)      # (Q, D)
    dt = dt_ref[0].astype(jnp.float32)    # (Q, D)
    Bm = b_ref[0].astype(jnp.float32)     # (Q, N)

    e1 = (
        jax.lax.broadcasted_iota(jnp.int32, (D, DN), 1) // N
        == jax.lax.broadcasted_iota(jnp.int32, (D, DN), 0)
    ).astype(jnp.float32)                 # (D, DN): k//N == d
    e2 = (
        jax.lax.broadcasted_iota(jnp.int32, (N, DN), 1) % N
        == jax.lax.broadcasted_iota(jnp.int32, (N, DN), 0)
    ).astype(jnp.float32)                 # (N, DN): k%N == n

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    dt_e = dot(dt, e1)                    # (Q, DN)
    x_e = dot(x, e1)                      # (Q, DN)
    b_e = dot(Bm, e2)                     # (Q, DN)
    a0 = jnp.exp(dt_e * a_ref[...])       # decay (pre-scan), kept
    inc = dt_e * x_e * b_e                # increment

    @pl.when(p == 0)
    def _phase0():
        # forward scan; checkpoint the chunk-ENTRY state, keep running carry
        @pl.when(j == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        ckpt_ref[j, :] = carry_ref[0]
        a, b = a0, inc
        s = 1
        while s < Q:
            a_sh = jnp.pad(a, ((s, 0), (0, 0)), constant_values=1.0)[:Q]
            b_sh = jnp.pad(b, ((s, 0), (0, 0)))[:Q]
            b = a * b_sh + b
            a = a * a_sh
            s *= 2
        h_last = b[Q - 1:Q] + a[Q - 1:Q] * carry_ref[...]
        carry_ref[...] = h_last

    @pl.when(p == 1)
    def _phase1():
        @pl.when(j == 0)
        def _():
            m_ref[...] = jnp.zeros_like(m_ref)
            daacc_ref[...] = jnp.zeros_like(daacc_ref)
            ddacc_ref[...] = jnp.zeros_like(ddacc_ref)

        Cm = c_ref[0].astype(jnp.float32)     # (Q, N)
        g = g_ref[0].astype(jnp.float32)      # (Q, D)
        # rebuild in-chunk states from the checkpoint
        h_in = ckpt_ref[n_chunks - 1 - j, :][None, :]
        a, b = a0, inc
        s = 1
        while s < Q:
            a_sh = jnp.pad(a, ((s, 0), (0, 0)), constant_values=1.0)[:Q]
            b_sh = jnp.pad(b, ((s, 0), (0, 0)))[:Q]
            b = a * b_sh + b
            a = a * a_sh
            s *= 2
        h = b + a * h_in                      # (Q, DN) states of this chunk
        h_prev = jnp.concatenate([h_in, h[:Q - 1]], axis=0)

        # cotangent suffix scan: hhat_t = G_t + a_{t+1} hhat_{t+1}
        c_e = dot(Cm, e2)                     # (Q, DN)
        g_e = dot(g, e1)                      # (Q, DN)
        G = g_e * c_e
        d = jnp.pad(a0, ((0, 1), (0, 0)), constant_values=1.0)[1:]  # d_t=a_{t+1}
        Gs, ds = G, d
        s = 1
        while s < Q:
            G_sh = jnp.pad(Gs, ((0, s), (0, 0)))[s:]
            d_sh = jnp.pad(ds, ((0, s), (0, 0)), constant_values=1.0)[s:]
            Gs = Gs + ds * G_sh
            ds = ds * d_sh
            s *= 2
        hhat = Gs + ds * m_ref[...]
        m_ref[...] = a0[0:1] * hhat[0:1]      # message to the previous chunk

        # gradients (lane-packed -> compacted through the one-hot matmuls)
        S1 = hhat * b_e                       # d(inc)路B paths
        P = hhat * h_prev * a0                # d(decay) path
        dx = dot(dt_e * S1, e1.T) + g * d_ref[...]
        ddt = dot(x_e * S1 + P * a_ref[...], e1.T)
        db = dot(hhat * dt_e * x_e, e2.T)     # (Q, N)
        dc = dot(g_e * h, e2.T)               # (Q, N)
        daacc_ref[...] = daacc_ref[...] + jnp.sum(dt_e * P, axis=0)[None, :]
        ddacc_ref[...] = ddacc_ref[...] + jnp.sum(g * x, axis=0)[None, :]

        dx_ref[0] = dx.astype(dx_ref.dtype)
        ddt_ref[0] = ddt.astype(ddt_ref.dtype)
        db_ref[0] = db.astype(db_ref.dtype)
        dc_ref[0] = dc.astype(dc_ref.dtype)

        @pl.when(j == n_chunks - 1)
        def _():
            da_ref[0] = daacc_ref[...].astype(da_ref.dtype)
            dd_ref[0] = ddacc_ref[...].astype(dd_ref.dtype)


def _pick_chunk_bwd(L: int, DN: int) -> int:
    # ~16 live (Q, DN) fp32 work arrays in phase 1 (vs 6 in the forward)
    for q in (512, 256, 128, 64, 32, 16, 8):
        if L % q:
            continue
        if 16 * q * DN * 4 < _VMEM_BUDGET:
            return q
    return 0


def _backward(x, dt, A, Bmat, Cmat, Dp, g, interpret):
    B, L, D = x.shape
    N = A.shape[-1]
    DN = D * N
    Q = _pick_chunk_bwd(L, DN)
    assert Q >= 8, f"unsupported backward scan shape L={L} D={D} N={N}"
    n_chunks = L // Q

    a_flat = A.astype(jnp.float32).reshape(1, DN)
    d_row = Dp.astype(jnp.float32).reshape(1, D)

    fwd_idx = lambda b, p, j: (b, j * (1 - p) + (n_chunks - 1 - j) * p, 0)  # noqa: E731
    # C and g are only read in phase 1; pinning their index to block 0 while
    # p == 0 makes consecutive phase-0 steps revisit the same block, so
    # Pallas skips the per-chunk re-fetch (~2/5 of input bytes) during the
    # checkpointing sweep.
    p1_idx = lambda b, p, j: (b, (n_chunks - 1 - j) * p, 0)  # noqa: E731
    kern = functools.partial(_bwd_kernel, Q=Q, D=D, N=N, n_chunks=n_chunks)
    dx, ddt, db, dc, da, dd = pl.pallas_call(
        kern,
        grid=(B, 2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, Q, D), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, D), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), p1_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, D), p1_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DN), lambda b, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q, D), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, D), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), fwd_idx, memory_space=pltpu.VMEM),
            # (B, 1, DN)/(B, 1, D) with a (1, 1, *) block: real-TPU lowering
            # requires the block's last two dims be (8, 128)-divisible OR
            # equal to the array dims — a (1, DN) block on a (B, DN) array
            # violates that (caught on first silicon contact, round 4).
            pl.BlockSpec((1, 1, DN), lambda b, p, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, p, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((B, L, D), dt.dtype),
            jax.ShapeDtypeStruct((B, L, N), Bmat.dtype),
            jax.ShapeDtypeStruct((B, L, N), Cmat.dtype),
            jax.ShapeDtypeStruct((B, 1, DN), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, DN), jnp.float32),         # fwd carry
            pltpu.VMEM((n_chunks, DN), jnp.float32),  # chunk-entry checkpoints
            pltpu.VMEM((1, DN), jnp.float32),         # cotangent message
            pltpu.VMEM((1, DN), jnp.float32),         # dA accumulator
            pltpu.VMEM((1, D), jnp.float32),          # dD accumulator
        ],
        interpret=interpret,
    )(x, dt, Bmat, Cmat, g, a_flat, d_row)
    dA = jnp.sum(da[:, 0], axis=0).reshape(D, N).astype(A.dtype)
    dD = jnp.sum(dd[:, 0], axis=0).astype(Dp.dtype)
    return dx, ddt, dA, db, dc, dD


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(x, dt, A, Bmat, Cmat, Dp, interpret=False):
    """Fused selective scan; args/semantics of ops.scan.selective_scan."""
    from kmunet_tpu.utils.flops import record_custom_flops

    # Useful FLOPs of the sequential recurrence (what a minimal
    # implementation performs — NOT this kernel's one-hot-matmul internals):
    # per (b,l,d,n): decay=exp(dt*A) 2, dt*B*x 2, h=decay*h+inc 2, y=C.h 2;
    # plus the D*x skip 2 per (b,l,d).
    B, L, D = x.shape
    N = A.shape[-1]
    record_custom_flops(8.0 * B * L * D * N + 2.0 * B * L * D)
    return _forward(x, dt, A, Bmat, Cmat, Dp, interpret)


def _fwd(x, dt, A, Bmat, Cmat, Dp, interpret):
    return _forward(x, dt, A, Bmat, Cmat, Dp, interpret), (x, dt, A, Bmat, Cmat, Dp)


def _bwd(interpret, res, g):
    x, dt, A, Bmat, Cmat, Dp = res
    L, D = x.shape[1:]
    if _pick_chunk_bwd(L, D * A.shape[-1]) >= 8:
        return _backward(x, dt, A, Bmat, Cmat, Dp, g, interpret)
    # Fallback: XLA associative-scan VJP. NB: ops.scan.selective_scan would
    # dispatch back to this kernel; go through the XLA formulation directly.
    from kmunet_tpu.ops.scan import _selective_scan_xla

    _, vjp = jax.vjp(_selective_scan_xla, *res)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)
