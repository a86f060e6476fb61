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

Backward: custom VJP through the XLA associative-scan formulation
(identical math). Training the Mamba baseline therefore still pays the XLA
cost on the backward; a reverse-scan kernel (same structure, reversed
chunk order) is the natural follow-up if that matters.

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(x, dt, A, Bmat, Cmat, Dp, interpret=False):
    """Fused selective scan; args/semantics of ops.scan.selective_scan."""
    return _forward(x, dt, A, Bmat, Cmat, Dp, interpret)


def _fwd(x, dt, A, Bmat, Cmat, Dp, interpret):
    return _forward(x, dt, A, Bmat, Cmat, Dp, interpret), (x, dt, A, Bmat, Cmat, Dp)


def _bwd(interpret, res, g):
    # NB: ops.scan.selective_scan would dispatch back to this kernel; the
    # backward must go through the XLA formulation explicitly.
    from kmunet_tpu.ops.scan import _selective_scan_xla

    _, vjp = jax.vjp(_selective_scan_xla, *res)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)
