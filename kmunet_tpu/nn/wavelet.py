"""Intelligent Wavelet Pooling (IWP) — DWT downsampling with HF attention.

Re-derivation of `/root/reference/WPL/iwp.py:116-132`. The Haar DWT is a
fixed stride-2 filter bank (see ops/dwt.py) instead of the reference's
per-forward numpy matrix construction + dense matmuls.

Reference quirk kept faithfully: ``high_freq_conv`` projects the 3C
high-frequency channels to a *single* channel and applies Softmax2d —
softmax over a 1-channel axis is identically 1.0, so the "attention" is a
constant and that conv receives no gradient. We reproduce the computation
(and the parameter) exactly since it's load-bearing for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.dwt import haar_dwt2d


class IntelligentWaveletPooling(nn.Module):
    """2x spatial downsampling: DWT + attention-weighted HF fusion (NHWC)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        LL, LH, HL, HH = haar_dwt2d(x)
        high = jnp.concatenate([LH, HL, HH], axis=-1)  # (B, h, w, 3C)

        logits = nn.Conv(
            1, (1, 1), kernel_init=kaiming_uniform_torch(), name="high_freq_conv"
        )(high)
        attention = jax.nn.softmax(logits, axis=-1)  # 1-channel softmax == 1.0
        enhanced = high * attention
        hf_avg = jnp.mean(enhanced, axis=-1, keepdims=True)

        combined = jnp.concatenate([LL, hf_avg], axis=-1)
        return nn.Conv(
            C, (1, 1), kernel_init=kaiming_uniform_torch(), name="fusion_conv"
        )(combined)
