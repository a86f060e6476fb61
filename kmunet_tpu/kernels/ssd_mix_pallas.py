"""Fully-fused HSM-SSD mixer (Pallas): softmax + compress + MLP + scatter.

The HSM-SSD mixer (nn/ssd.py, re-deriving efficient_vim_init.py:33-61) is the
dominant cost of KM_UNetV3's EnhancedViM blocks: at B64 128^2 C16 bf16 the
XLA path spends 7.7 ms per instance, split across four *memory-bound* passes
over (B, L, N)-sized tensors (profile, scripts/profile_vim.py):

    softmax_L(dt + A)            2.0 ms   (reads+writes (B,L,N) twice)
    A*B + compress einsum        1.5 ms   (materializes (B,L,N) product)
    scatter einsum               1.2 ms
    (+ BCdt conv 2.1 ms, kept in XLA — it is a real MXU conv)

This kernel fuses the three into ONE pass over the BCdt tensor plus one
re-read of its C-slice:

    phase 0 (per L-tile):  online-softmax statistics (running max/denom) and
        the unnormalized compress  hT += xT @ (exp(dt+A-m) * B)   [MXU]
        -> on the last tile: normalize by the denom, apply the tiny gated
           MLP (h*silu(z) + h*D) @ Wout in-register
    phase 1 (per L-tile):  yT_tile = h2T @ Cm_tile^T              [MXU]

Softmax normalization never materializes: softmax_L(s)[l,n] = e[l,n]/d[n]
and h is linear in A, so dividing the accumulated hT rows by d afterwards is
exact. HBM traffic drops to: read x once, read dt/B once, read Cm once,
write y once (~0.5 GB at B64 stage 1 vs ~1.3 GB for XLA).

Layout: tokens ride TRANSPOSED (B, C, L) — C=16/32/64 would waste 8x/4x/2x
VMEM as (L, C) lane-padded blocks; (C, TILE) blocks are compact and feed the
MXU directly (dims: (C,TILE)@(TILE,N) and (C,N)@(N,TILE)... via dot_general).
dt/B/C stay (L, N): their HBM DMA is compact either way and N=64 only pads
VMEM 2x. The (B,C,L) transposes of x/y happen in XLA outside (~32 MB each).

Backward: custom VJP recomputes through the XLA reference (exact same math),
so training semantics are unchanged.

Perf status (v5e via tunnel, B64 C16 L=16384 N64 bf16, chained timing):
  this kernel 5.69 ms  vs  XLA softmax+einsum chain 3.04 ms  (loses)
Ablations (scripts/ablate_mix_kernel.py) show the kernel is DMA-floor-bound:
a compute-free variant that only streams the same blocks costs 5.45 ms, and
a lane-packed skeleton ((L/2, 128) blocks, parity-split matmuls, no softmax
stats at all) still costs 3.50 ms. Raw Pallas streaming reads measure only
~40-70 GB/s in this environment (vs ~130 GB/s effective for XLA's fused
softmax chain), so the HBM-traffic savings the fusion buys (~3x) do not
overcome the per-block DMA throughput gap. XLA's fusion of this chain is
already at the environment's effective-bandwidth roofline; the kernel is
kept correct + tested (exact vs reference, incl. VJP) as a base for
hardware/toolchain revisions where Pallas DMA reaches spec, and the model
keeps the XLA formulation (nn/ssd.py) as its fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xt_ref, dt_ref, bm_ref, cm_ref, a_ref, whzt_ref, woutt_ref, d_ref,
            yt_ref, h2out_ref, m_ref, den_ref, h_ref, h2_ref, *, n_tiles, c, n):
    p = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((p == 0) & (i == 0))
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        den_ref[...] = jnp.zeros_like(den_ref)
        h_ref[...] = jnp.zeros_like(h_ref)

    @pl.when(p == 0)
    def _phase0():
        s = dt_ref[0].astype(jnp.float32) + a_ref[0].astype(jnp.float32)  # (T, N)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
        scale = jnp.exp(m_old - m_new)                                    # (N,)
        e = jnp.exp(s - m_new[None, :])
        den_ref[0] = den_ref[0] * scale + jnp.sum(e, axis=0)
        w = (e * bm_ref[0].astype(jnp.float32)).astype(xt_ref.dtype)      # (T, N)
        contrib = jax.lax.dot_general(
            xt_ref[0], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                                 # (C, N)
        h_ref[...] = h_ref[...] * scale[None, :] + contrib
        m_ref[0] = m_new
        yt_ref[0] = jnp.zeros_like(yt_ref[0])  # overwritten in phase 1

        @pl.when(i == n_tiles - 1)
        def _finalize():
            # normalize: h[c, n] /= denom[n], then the gated MLP on N states.
            hT = h_ref[...] / den_ref[0][None, :]                         # (C, N)
            hz = jax.lax.dot_general(
                whzt_ref[...].astype(jnp.float32), hT,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                             # (2C, N)
            h_part = hz[:c]
            z = hz[c:]
            gated = h_part * jax.nn.sigmoid(z) * z + h_part * d_ref[0, 0]
            h2_ref[...] = jax.lax.dot_general(
                woutt_ref[...].astype(jnp.float32), gated,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                             # (C, N)
            h2out_ref[0] = h2_ref[...].astype(h2out_ref.dtype)

    @pl.when(p == 1)
    def _phase1():
        yt_ref[0] = jax.lax.dot_general(
            h2_ref[...].astype(xt_ref.dtype), cm_ref[0],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(yt_ref.dtype)                                            # (C, T)


def _pick_tile(L: int) -> int:
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if L % t == 0:
            return t
    return L


def hsmssd_mix(xt, dt, Bm, Cm, A_param, w_hz, w_out, D, interpret=False):
    """Fused mixer forward.

    Args:
      xt: (B, C, L) transposed normed tokens.
      dt, Bm, Cm: (B, L, N) splits of the BCdt conv output.
      A_param: (N,).
      w_hz: (C, 2C) hz_proj kernel; w_out: (C, C) out_proj kernel (both as
        stored by the module, i.e. contracting the FIRST dim with channels).
      D: scalar skip weight.

    Returns:
      yt: (B, C, L) transposed mixer output, h2t: (B, C, N) mixed states.
    """
    B, C, L = xt.shape
    N = dt.shape[-1]
    TILE = _pick_tile(L)
    n_tiles = L // TILE
    dtp = xt.dtype

    whzt = w_hz.T  # (2C, C): rows produce hz entries
    woutt = w_out.T  # (C, C)
    d_smem = jnp.reshape(D.astype(jnp.float32), (1, 1))

    kern = functools.partial(_kernel, n_tiles=n_tiles, c=C, n=N)
    grid = (B, 2, n_tiles)
    yt, h2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # phase 1 keeps the phase-0 final index -> no re-DMA of x/dt/B.
            pl.BlockSpec((1, C, TILE),
                         lambda b, p, i: (b, 0, i * (1 - p) + (n_tiles - 1) * p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, N),
                         lambda b, p, i: (b, i * (1 - p) + (n_tiles - 1) * p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, N),
                         lambda b, p, i: (b, i * (1 - p) + (n_tiles - 1) * p, 0),
                         memory_space=pltpu.VMEM),
            # Cm is only consumed in phase 1.
            pl.BlockSpec((1, TILE, N), lambda b, p, i: (b, i * p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, C), lambda b, p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, p, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, TILE), lambda b, p, i: (b, 0, i * p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, p, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, L), dtp),
            jax.ShapeDtypeStruct((B, C, N), dtp),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, N), jnp.float32),   # running max
            pltpu.VMEM((1, N), jnp.float32),   # running denom
            pltpu.VMEM((C, N), jnp.float32),   # unnormalized hT
            pltpu.VMEM((C, N), jnp.float32),   # post-MLP h2T
        ],
        interpret=interpret,
    )(xt, dt, Bm, Cm, A_param[None, :], whzt, woutt, d_smem)
    return yt, h2


def hsmssd_mix_reference(xt, dt, Bm, Cm, A_param, w_hz, w_out, D):
    """XLA formulation (matches nn/ssd.py::HSMSSD post-conv math)."""
    x = jnp.swapaxes(xt, 1, 2)  # (B, L, C)
    A = jax.nn.softmax(dt + A_param[None, None, :], axis=1)
    h = jnp.einsum("blc,bln->bnc", x, A * Bm)
    hz = h @ w_hz  # (B, N, 2C)
    C_ = xt.shape[1]
    h_, z = hz[..., :C_], hz[..., C_:]
    h2 = (h_ * jax.nn.silu(z) + h_ * D) @ w_out
    y = jnp.einsum("bnc,bln->blc", h2, Cm)
    return jnp.swapaxes(y, 1, 2), jnp.swapaxes(h2, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def hsmssd_mix_op(xt, dt, Bm, Cm, A_param, w_hz, w_out, D, interpret=False):
    return hsmssd_mix(xt, dt, Bm, Cm, A_param, w_hz, w_out, D, interpret)


def _fwd(xt, dt, Bm, Cm, A_param, w_hz, w_out, D, interpret):
    return (
        hsmssd_mix(xt, dt, Bm, Cm, A_param, w_hz, w_out, D, interpret),
        (xt, dt, Bm, Cm, A_param, w_hz, w_out, D),
    )


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(hsmssd_mix_reference, *res)
    return vjp(g)


hsmssd_mix_op.defvjp(_fwd, _bwd)
