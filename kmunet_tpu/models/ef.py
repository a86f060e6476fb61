"""Encoder-Forecaster recurrent baselines: ConvLSTM and TrajGRU.

Re-derivations of `/root/reference/models/convlstm.py` and
`models/TrajGru.py` with the recurrences as ``nn.scan`` over time (the
reference runs python loops per step, convlstm.py:45-65 /
TrajGru.py:182-207) and without the reference's shape-baked construction
(states are sized from the input, not from a global ``b_h_w`` — fixing
convlstm.py:27-29's device-bound globals).

Architecture (both models, Shanghai config):
  encoder   conv(1->8,k6,s4,p1)+leaky -> RNN@64^2 -> conv(64->192,k4,s4,p1)
            -> RNN@16^2 -> conv(192->192,k3,s2,p1) -> RNN@8^2
  forecaster RNN@8^2 -> deconv(192->192,k4,s2,p1) -> RNN@16^2 ->
            deconv(192->64,k6,s4,p1) -> RNN@64^2 ->
            deconv(64->8,k6,s4,p1)+conv(8->8)+conv(8->1)

Reference quirks handled:
- ConvLSTM peepholes: the reference creates ``nn.Parameter(...).to(device)``
  (convlstm.py:27-29) which *unregisters* them on CUDA — they stay constant
  zero and untrained. We keep real zero-init peephole parameters but make
  them per-channel (shape-agnostic) instead of per-pixel; at init and on the
  reference's actual CUDA behavior the functions are identical.
- TrajGRU with no decoder inputs skips the i2h term entirely (including its
  bias, TrajGru.py:199-201) — modeled with a static ``use_input`` flag.
- TrajGRU's ``wrap`` warps with align_corners=True grid_sample
  (TrajGru.py:52-56) via our shared bilinear gather.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.sample import bilinear_gather_multiview


def leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


def conv_t(features, kernel, stride, padding, name=None):
    """torch ConvTranspose2d(k, s, p) equivalent: out = (in-1)*s - 2p + k."""
    return nn.ConvTranspose(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel - 1 - padding, kernel - 1 - padding)] * 2,
        transpose_kernel=True, kernel_init=kaiming_uniform_torch(), name=name,
    )


def conv(features, kernel, stride, padding, name=None):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding)] * 2, kernel_init=kaiming_uniform_torch(),
        name=name,
    )


class ConvLSTMCell(nn.Module):
    """Peephole ConvLSTM cell over NHWC states (convlstm.py:15-66)."""

    filters: int

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        z = conv(4 * self.filters, 3, 1, 1, name="conv")(jnp.concatenate([x, h], -1))
        i, f, g, o = jnp.split(z, 4, axis=-1)
        wci = self.param("Wci", nn.initializers.zeros, (self.filters,))
        wcf = self.param("Wcf", nn.initializers.zeros, (self.filters,))
        wco = self.param("Wco", nn.initializers.zeros, (self.filters,))
        i = jax.nn.sigmoid(i + wci * c)
        f = jax.nn.sigmoid(f + wcf * c)
        c = f * c + i * jnp.tanh(g)
        o = jax.nn.sigmoid(o + wco * c)
        h = o * jnp.tanh(c)
        return (h, c), h


class TrajGRUCell(nn.Module):
    """Flow-warping GRU cell (TrajGru.py:94-210)."""

    filters: int
    L: int = 5
    h2h_kernel: int = 5
    use_input: bool = True

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        B, H, W, C = h.shape

        f = conv(32, 5, 1, 2, name="h2f_conv1")(h)
        if self.use_input:
            f = f + conv(32, 5, 1, 2, name="i2f_conv1")(x)
        flows = conv(2 * self.L, 5, 1, 2, name="flows_conv")(leaky(f))
        flows = flows.reshape(B, H, W, self.L, 2)

        # wrap(prev_h, -flow): sample h at grid - flow. The reference's
        # grid_sample(align_corners=True) normalize/denormalize round-trip
        # is the identity in pixel space, so we sample at vx/vy directly —
        # ONE multiview gather of the shared h at all L flow fields
        # (ops/sample.py::bilinear_gather_multiview; view l lands in channel
        # block l, matching the reference's (L, C) concat order).
        xx = jnp.arange(W, dtype=h.dtype)[None, None, :, None]
        yy = jnp.arange(H, dtype=h.dtype)[None, :, None, None]
        vx = (xx - flows[..., 0]).transpose(0, 3, 1, 2)  # (B, L, H, W)
        vy = (yy - flows[..., 1]).transpose(0, 3, 1, 2)
        warped = bilinear_gather_multiview(h, vx, vy, padding_mode="zeros")

        h2h = nn.Conv(
            3 * self.filters, (1, 1), kernel_init=kaiming_uniform_torch(), name="ret"
        )(warped)
        hr, hu, hm = jnp.split(h2h, 3, axis=-1)
        if self.use_input:
            i2h = conv(3 * self.filters, 3, 1, 1, name="i2h")(x)
            ir, iu, im = jnp.split(i2h, 3, axis=-1)
            reset = jax.nn.sigmoid(ir + hr)
            update = jax.nn.sigmoid(iu + hu)
            new_mem = leaky(im + reset * hm)
        else:
            reset = jax.nn.sigmoid(hr)
            update = jax.nn.sigmoid(hu)
            new_mem = leaky(reset * hm)
        next_h = update * h + (1 - update) * new_mem
        return next_h, next_h


def _scan(cell_cls, name, unroll=1, **kwargs):
    return nn.scan(
        cell_cls,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
        unroll=unroll,
    )(name=name, **kwargs)


class _EF(nn.Module):
    """Shared encoder-forecaster scaffold; cell=('convlstm'|'trajgru')."""

    out_frames: int = 20
    cell: str = "convlstm"
    # lax.scan unroll factor. Training/inference keep 1 (compact while
    # loops); FLOP counting clones with unroll >= seq length so HLO cost
    # analysis sees every timestep's ops (while bodies are otherwise
    # counted once — the zoo-MFU undercount VERDICT r2 flagged).
    unroll: int = 1

    # (filters, L, h2h_kernel) per level; L/h2h only used by trajgru.
    enc_rnn: Sequence[tuple] = ((64, 13, 5), (192, 13, 5), (192, 9, 3))
    fore_rnn: Sequence[tuple] = ((192, 13, 3), (192, 13, 5), (64, 9, 5))

    def _cell(self, spec, name, use_input):
        filters, L, hk = spec
        if self.cell == "convlstm":
            return _scan(ConvLSTMCell, name, unroll=self.unroll, filters=filters)
        return _scan(TrajGRUCell, name, unroll=self.unroll, filters=filters,
                     h2h_kernel=hk, L=L, use_input=use_input)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, S, H, W) input frames -> (B, out_frames, H, W)."""
        B, S, H, W = x.shape
        seq = x.reshape(B * S, H, W, 1)

        def fold(y, s):
            return y.reshape(B, s, *y.shape[1:]).swapaxes(0, 1)  # time-major

        # ---- encoder ----
        e = conv(8, 6, 4, 1, name="enc_stage1")(seq)
        e = leaky(e)
        e_t = fold(e, S)
        zeros = lambda ref, c: jnp.zeros(ref.shape[1:-1] + (c,), ref.dtype)  # noqa: E731

        def run_rnn(cell, xs, carry0):
            carry, ys = cell(carry0, xs)
            return ys, carry

        c1 = self._cell(self.enc_rnn[0], "enc_rnn1", True)
        carry0 = (zeros(e_t, 64), zeros(e_t, 64)) if self.cell == "convlstm" else zeros(e_t, 64)
        ys, s1 = run_rnn(c1, e_t, carry0)

        y = ys.swapaxes(0, 1).reshape(B * S, *ys.shape[2:])
        y = leaky(conv(192, 4, 4, 1, name="enc_stage2")(y))
        y_t = fold(y, S)
        c2 = self._cell(self.enc_rnn[1], "enc_rnn2", True)
        carry0 = (zeros(y_t, 192), zeros(y_t, 192)) if self.cell == "convlstm" else zeros(y_t, 192)
        ys, s2 = run_rnn(c2, y_t, carry0)

        y = ys.swapaxes(0, 1).reshape(B * S, *ys.shape[2:])
        y = leaky(conv(192, 3, 2, 1, name="enc_stage3")(y))
        y_t = fold(y, S)
        c3 = self._cell(self.enc_rnn[2], "enc_rnn3", True)
        carry0 = (zeros(y_t, 192), zeros(y_t, 192)) if self.cell == "convlstm" else zeros(y_t, 192)
        ys, s3 = run_rnn(c3, y_t, carry0)

        # ---- forecaster (rnn3 -> rnn1 with None inputs) ----
        T = self.out_frames

        def dec_rnn(spec, name, state, inp, in_ch):
            cell = self._cell(spec, name, inp is not None)
            if self.cell == "convlstm":
                # reference feeds explicit zeros when input is None
                xs = inp if inp is not None else jnp.zeros(
                    (T, B) + state[0].shape[1:-1] + (in_ch,), x.dtype
                )
                carry = state
            else:
                xs = inp if inp is not None else jnp.zeros(
                    (T, B) + state.shape[1:-1] + (0,), x.dtype
                )
                carry = state
            _, ys = cell(carry, xs)
            return ys

        d = dec_rnn(self.fore_rnn[0], "fore_rnn3", s3, None, 192)
        d = d.swapaxes(0, 1).reshape(B * T, *d.shape[2:])
        d = leaky(conv_t(192, 4, 2, 1, name="fore_stage3")(d))
        d_t = fold(d, T)

        d = dec_rnn(self.fore_rnn[1], "fore_rnn2", s2, d_t, 192)
        d = d.swapaxes(0, 1).reshape(B * T, *d.shape[2:])
        d = leaky(conv_t(64, 6, 4, 1, name="fore_stage2")(d))
        d_t = fold(d, T)

        d = dec_rnn(self.fore_rnn[2], "fore_rnn1", s1, d_t, 64)
        d = d.swapaxes(0, 1).reshape(B * T, *d.shape[2:])
        d = leaky(conv_t(8, 6, 4, 1, name="fore_stage1_deconv")(d))
        d = leaky(conv(8, 3, 1, 1, name="fore_stage1_conv1")(d))
        d = nn.Conv(1, (1, 1), kernel_init=kaiming_uniform_torch(),
                    name="fore_stage1_conv2")(d)
        d = d.reshape(B, T, H, W)
        return d


class ConvLSTM_EF(_EF):
    cell: str = "convlstm"


class TrajGRU_EF(_EF):
    cell: str = "trajgru"
