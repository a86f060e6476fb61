"""Analytic FLOP accounting (VERDICT r2 item 9).

Proves the three legs of the zoo-MFU fix:
1. pre-compile ``lowered_flops`` equals plain operation-count math (exact
   on a conv whose formula we hand-derive),
2. unrolled RNN counting scales affinely with trip count (while bodies are
   otherwise counted once),
3. Pallas kernels report their useful FLOPs through the trace-time tally.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kmunet_tpu.utils.flops import lowered_flops, tally_custom_flops


def _conv_taps(Hin, k, s, p):
    """Per-axis count of in-bounds kernel taps summed over output positions
    (XLA HloCostAnalysis excludes padding taps). Returns (Hout, taps)."""
    Hout = (Hin + 2 * p - k) // s + 1
    t = sum(1 for o in range(Hout) for j in range(k) if 0 <= o * s - p + j < Hin)
    return Hout, t


def _deconv_taps(Hin, k, s, p):
    """Transposed conv (torch ConvTranspose2d(k,s,p) semantics): XLA counts
    only taps hitting real (non-dilation-zero, in-bounds) input positions."""
    Hout = (Hin - 1) * s - 2 * p + k
    t = sum(
        1
        for o in range(Hout)
        for j in range(k)
        if (o + p - j) % s == 0 and 0 <= (o + p - j) // s < Hin
    )
    return Hout, t


def test_conv_flops_match_hand_formula():
    # conv: B2, 16x16x8 -> k3 s1 SAME(p1), 32 out ch; exact valid-tap count.
    B, H, Cin, Cout, k = 2, 16, 8, 32, 3
    x = jnp.zeros((B, H, H, Cin))
    w = jnp.zeros((k, k, Cin, Cout))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = lowered_flops(f, x, w)["flops"]
    _, t = _conv_taps(H, k, 1, 1)
    np.testing.assert_allclose(got, 2 * B * t * t * Cin * Cout, rtol=1e-6)


def test_unrolled_convlstm_counts_every_timestep():
    from kmunet_tpu.models.ef import ConvLSTM_EF

    B, S, H = 1, 2, 32
    x = jnp.zeros((B, S, H, H))

    def count(T):
        m = ConvLSTM_EF(out_frames=T, unroll=64)
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
        return lowered_flops(lambda v, xx: m.apply(v, xx), v, x)["flops"]

    f2, f4, f6 = count(2), count(4), count(6)
    # affine in decoder length: equal increments, and the per-step slope is
    # the decoder ladder (a material share of the total)
    np.testing.assert_allclose(f6 - f4, f4 - f2, rtol=1e-6)
    assert (f4 - f2) / 2 > 0.05 * f2

    # non-unrolled lowering counts the while body once -> strictly less
    m1 = ConvLSTM_EF(out_frames=6, unroll=1)
    v = jax.eval_shape(lambda: m1.init(jax.random.PRNGKey(0), x))
    v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
    f_loop = lowered_flops(lambda v, xx: m1.apply(v, xx), v, x)["flops"]
    assert f_loop < f6


def test_convlstm_unrolled_matches_hand_derivation():
    """Full hand derivation of the ConvLSTM EF ladder at (B1, S2, 64^2),
    T=4: exact valid-tap conv math + bias adds. Elementwise gate/state math
    is <1% and covered by the tolerance."""
    from kmunet_tpu.models.ef import ConvLSTM_EF

    B, S, H, T = 1, 2, 64, 4
    x = jnp.zeros((B, S, H, H))
    m = ConvLSTM_EF(out_frames=T, unroll=64)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
    v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
    got = lowered_flops(lambda v, xx: m.apply(v, xx), v, x)["flops"]

    def conv(hin, k, s, p, cin, cout, frames):
        hout, t = _conv_taps(hin, k, s, p)
        return frames * B * (2 * t * t * cin * cout + hout * hout * cout)

    def deconv(hin, k, s, p, cin, cout, frames):
        hout, t = _deconv_taps(hin, k, s, p)
        return frames * B * (2 * t * t * cin * cout + hout * hout * cout)

    h1, h2, h3 = H // 4, H // 16, H // 32
    want = (
        conv(H, 6, 4, 1, 1, 8, S)                  # enc_stage1
        + conv(h1, 3, 1, 1, 8 + 64, 4 * 64, S)     # enc_rnn1 cell conv x S
        + conv(h1, 4, 4, 1, 64, 192, S)            # enc_stage2
        + conv(h2, 3, 1, 1, 192 + 192, 4 * 192, S)  # enc_rnn2
        + conv(h2, 3, 2, 1, 192, 192, S)           # enc_stage3
        + conv(h3, 3, 1, 1, 192 + 192, 4 * 192, S)  # enc_rnn3
        + conv(h3, 3, 1, 1, 192 + 192, 4 * 192, T)  # fore_rnn3 (zero inputs)
        + deconv(h3, 4, 2, 1, 192, 192, T)         # fore_stage3
        + conv(h2, 3, 1, 1, 192 + 192, 4 * 192, T)  # fore_rnn2
        + deconv(h2, 6, 4, 1, 192, 64, T)          # fore_stage2
        + conv(h1, 3, 1, 1, 64 + 64, 4 * 64, T)    # fore_rnn1
        + deconv(h1, 6, 4, 1, 64, 8, T)            # fore_stage1 deconv
        + conv(H, 3, 1, 1, 8, 8, T)                # fore_stage1 conv1
        + conv(H, 1, 1, 0, 8, 1, T)                # fore_stage1 conv2
    )
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_scan_kernel_reports_useful_flops():
    from kmunet_tpu.kernels.scan_pallas import selective_scan_pallas

    B, L, D, N = 2, 64, 8, 4
    args = (jnp.zeros((B, L, D)), jnp.zeros((B, L, D)), jnp.zeros((D, N)),
            jnp.zeros((B, L, N)), jnp.zeros((B, L, N)), jnp.zeros((D,)))
    with tally_custom_flops() as t:
        jax.eval_shape(lambda *a: selective_scan_pallas(*a, interpret=True), *args)
    assert t.total == 8.0 * B * L * D * N + 2.0 * B * L * D

    # nested tallies don't leak
    with tally_custom_flops() as outer:
        with tally_custom_flops() as inner:
            jax.eval_shape(lambda *a: selective_scan_pallas(*a, interpret=True), *args)
        assert inner.total > 0
    assert outer.total == 0.0


def test_bilinear_kernel_reports_useful_flops():
    from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border

    B, H, W, C, Ho, Wo = 1, 16, 16, 8, 8, 8
    img = jnp.zeros((B, H, W, C), jnp.bfloat16)
    xs = jnp.zeros((B, Ho, Wo), jnp.bfloat16)
    with tally_custom_flops() as t:
        jax.eval_shape(lambda i, xx, yy: gather_bilinear_border(i, xx, yy, True),
                       img, xs, xs)
    assert t.total == 8.0 * B * Ho * Wo * C
