"""Fused three-direction ViM chain for EnhancedViMBlock (the flagship hot path).

``EnhancedViMBlock`` (KM_UNetV3_SH.py:97-151) evaluates three independent
``DirectionViM`` branches — height / width / channel projections, each an
EfficientViM block (efficient_vim_init.py:64-97) plus a DirectionAttention
(KM_UNetV3_SH.py:215-263) — and softmax-gates the results. Run separately
(round-2 default) the branches are ~45 small HBM-bound passes over C-channel
tensors with C = 16..64: every conv/matmul is MXU lane-starved (the MXU is
128 wide) and every elementwise pass pays launch + memory overhead three
times.

``FusedDirectionViM`` evaluates all three branches as ONE chain over a
channel-stacked (B, H, W, 3C) tensor with per-branch parameters:

- the three direction projections ((3,1), (1,3), (1,1) convs) become one
  3x3 conv C -> 3C whose kernel embeds each branch's taps in its support
  (zero elsewhere) — exact, since SAME padding of the small kernels matches
  the centered embedding;
- per-branch dense layers become stacked einsums over a leading branch axis
  (batched matmuls, MXU batch 3B);
- per-branch 1x1/3x3 convs become ONE grouped conv (``feature_group_count=3``,
  ``packing='grouped'``) or one dense conv with an explicit block-diagonal
  kernel (``packing='blockdiag'`` — 3x the FLOPs, all landing in otherwise
  idle MXU lanes);
- depthwise convs and BatchNorms concatenate trivially (both are
  per-channel);
- the per-branch ChannelLayerNorm keeps exact per-branch statistics by
  normalizing (B, L, 3, C) over the last axis only.

Numerics are identical to the separate path (same math, same parameter
distributions); ``fuse_direction_params`` maps a separate-path parameter
tree onto this layout and the parity test asserts equality at fp32.

Reference: KM_UNetV3_SH.py:97-263 + efficient_vim_init.py:14-97 semantics,
re-laid-out for the TPU; see nn/ssd.py for the single-branch derivation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kmunet_tpu.nn.init import _fan_in_out, kaiming_uniform_torch


def _stacked_kaiming(scale: float = 1.0):
    """kaiming_uniform_torch over ``shape[1:]`` — the leading axis is the
    branch stack, not part of any one layer's fan."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape[1:])
        bound = scale / np.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _uniform_range(lo, hi):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)

    return init


def _gconcat(k):
    """(G, kh, kw, I, O) per-branch kernels -> (kh, kw, I, G*O) grouped-conv
    kernel (XLA grouped convs take per-group kernels concatenated on O)."""
    return jnp.concatenate([k[g] for g in range(k.shape[0])], axis=-1)


def _blockdiag(k):
    """(G, kh, kw, I, O) per-branch kernels -> (kh, kw, G*I, G*O) dense
    block-diagonal kernel (off-diagonal zeros feed idle MXU lanes)."""
    G, kh, kw, I, O = k.shape
    out = jnp.zeros((kh, kw, G * I, G * O), k.dtype)
    for g in range(G):
        out = out.at[:, :, g * I:(g + 1) * I, g * O:(g + 1) * O].set(k[g])
    return out


class FusedDirectionViM(nn.Module):
    """Height/width/channel DirectionViM branches as one (B, H, W, 3C) chain.

    Returns the three branch features stacked as (B, H, W, 3, C) — the
    caller (EnhancedViMBlock) applies the softmax gate.

    ``state_dim`` is accepted but the inner blocks use 64, replicating the
    reference quirk (KM_UNetV3_SH.py:166).
    """

    state_dim: int = 64
    packing: str = "grouped"  # 'grouped' | 'blockdiag'

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        G, N = 3, 64
        L = H * W
        dt_ = x.dtype
        assert self.packing in ("grouped", "blockdiag")

        def bconv(u, k_stack, groups_dw=False, bias=None):
            """Per-branch conv over the fused (B, H, W, G*I) tensor.
            k_stack: (G, kh, kw, I, O); depthwise when groups_dw."""
            if groups_dw:
                k = _gconcat(k_stack)  # (kh, kw, 1, G*C): depthwise
                fg = u.shape[-1]
            elif self.packing == "grouped":
                k = _gconcat(k_stack)
                fg = G
            else:
                k = _blockdiag(k_stack)
                fg = 1
            # cast to the CURRENT operand dtype (BatchNorm's fp32 params
            # promote activations to f32 in mixed-precision trees; casting
            # the kernel to match keeps the conv well-typed).
            y = jax.lax.conv_general_dilated(
                u, k.astype(u.dtype), (1, 1), "SAME",
                feature_group_count=fg,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.reshape(-1).astype(y.dtype)
            return y

        def bn(name, u, scale_init=1.0):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=nn.initializers.constant(scale_init), name=name,
            )(u)

        # --- direction projections: one sparse 3x3 conv C -> 3C -----------
        ph = self.param("proj_h_kernel", kaiming_uniform_torch(), (3, 1, C, C))
        pw = self.param("proj_w_kernel", kaiming_uniform_torch(), (1, 3, C, C))
        pc = self.param("proj_c_kernel", kaiming_uniform_torch(), (1, 1, C, C))
        pb = self.param("proj_bias", nn.initializers.zeros, (G, C))
        K = jnp.concatenate([
            jnp.pad(ph, ((0, 0), (1, 1), (0, 0), (0, 0))),
            jnp.pad(pw, ((1, 1), (0, 0), (0, 0), (0, 0))),
            jnp.pad(pc, ((1, 1), (1, 1), (0, 0), (0, 0))),
        ], axis=-1)  # (3, 3, C, 3C)
        u = jax.lax.conv_general_dilated(
            x, K.astype(dt_), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pb.reshape(-1).astype(dt_)

        # --- EfficientViM block x3 (efficient_vim_init.py:64-97) ----------
        alpha = self.param("alpha", nn.initializers.constant(1e-4), (G, 4, C))
        a = jax.nn.sigmoid(alpha).astype(dt_)  # (G, 4, C)
        a_of = lambda i: a[:, i, :].reshape(-1)  # noqa: E731  fused-channel order

        # bn_weight_init=0 as in the separate path (nn/ssd.py dwconv1/2 via
        # ConvBNAct): the residual stages start as identity at init.
        dw1 = self.param("dw1_kernel", _stacked_kaiming(), (G, 3, 3, 1, C))
        u = (1 - a_of(0)) * u + a_of(0) * bn("bn1", bconv(u, dw1, groups_dw=True), scale_init=0.0)

        u_prev = u
        # per-branch ChannelLayerNorm: stats over each branch's C channels
        ln_s = self.param("ln_scale", nn.initializers.ones, (G, C))
        ln_b = self.param("ln_bias", nn.initializers.zeros, (G, C))
        t = u.reshape(B, H, W, G, C)
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
        t = (t - mu) * jax.lax.rsqrt(var + 1e-5)
        t = t * ln_s.astype(dt_) + ln_b.astype(dt_)
        tok = t.reshape(B, H, W, G * C)

        # HSM-SSD mixer x3 (nn/ssd.py derivation, branch-stacked)
        proj_k = self.param("BCdt_proj_kernel", _stacked_kaiming(), (G, C, 3 * N))
        dw_k = self.param("BCdt_dw_kernel", _stacked_kaiming(), (G, 3, 3, 1, 3 * N))
        comp = proj_k[:, None, None] * dw_k  # (G, 3, 3, C, 3N) rank-1 composed
        bcdt = bconv(tok, comp).reshape(B, L, G, 3 * N)
        Bm, Cm, dtv = jnp.split(bcdt, 3, axis=-1)  # (B, L, G, N)

        A = self.param("A", _uniform_range(1.0, 16.0), (G, N))
        s = dtv + A[None, None].astype(dt_)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1)  # (B, G, N)
        xt = t  # normalized tokens, (B, H, W, G, C)
        h = jnp.einsum("bhwgc,bhwgn->bgnc", xt, e.reshape(B, H, W, G, N) * Bm.reshape(B, H, W, G, N))
        h = h / denom[..., None]

        hz_k = self.param("hz_kernel", _stacked_kaiming(), (G, C, 2 * C))
        hz = jnp.einsum("bgnc,gcd->bgnd", h, hz_k.astype(dt_))
        h_, z = jnp.split(hz, 2, axis=-1)
        Dp = self.param("D", nn.initializers.ones, (G, 1))
        gated = h_ * jax.nn.silu(z) + h_ * Dp[None, :, None].astype(dt_)
        out_k = self.param("out_kernel", _stacked_kaiming(), (G, C, C))
        h2 = jnp.einsum("bgnc,gcd->bgnd", gated, out_k.astype(dt_))
        y = jnp.einsum("bgnc,blgn->blgc", h2, Cm).reshape(B, H, W, G * C)
        u = (1 - a_of(1)) * u_prev + a_of(1) * y

        dw2 = self.param("dw2_kernel", _stacked_kaiming(), (G, 3, 3, 1, C))
        u = (1 - a_of(2)) * u + a_of(2) * bn("bn2", bconv(u, dw2, groups_dw=True), scale_init=0.0)

        # FFN x3: expand (BN+ReLU) -> project (BN scale 0)
        f1 = self.param("ffn1_kernel", _stacked_kaiming(), (G, 1, 1, C, 4 * C))
        f2 = self.param("ffn2_kernel", _stacked_kaiming(), (G, 1, 1, 4 * C, C))
        f = nn.relu(bn("ffn_bn1", bconv(u, f1)))
        f = bn("ffn_bn2", bconv(f, f2), scale_init=0.0)
        u = (1 - a_of(3)) * u + a_of(3) * f

        # --- DirectionAttention x3 (KM_UNetV3_SH.py:215-263) --------------
        pooled = jnp.mean(u, axis=(1, 2)).reshape(B, G, C)
        g1k = self.param("gate1_kernel", _stacked_kaiming(), (G, C, C // 4))
        g1b = self.param("gate1_bias", nn.initializers.zeros, (G, C // 4))
        g2k = self.param("gate2_kernel", _stacked_kaiming(), (G, C // 4, C))
        g2b = self.param("gate2_bias", nn.initializers.zeros, (G, C))
        w = jnp.einsum("bgc,gcd->bgd", pooled, g1k.astype(dt_)) + g1b.astype(dt_)
        w = nn.gelu(w, approximate=False)
        w = jnp.einsum("bgd,gdc->bgc", w, g2k.astype(dt_)) + g2b.astype(dt_)
        w = jax.nn.sigmoid(w)

        qkv_k = self.param("qkv_kernel", _stacked_kaiming(), (G, 1, 1, C, 3 * C))
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (G, 3 * C))
        qkv = bconv(u, qkv_k, bias=qkv_b).reshape(B, H, W, G, 3, C)
        q, k_, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        attn = (jax.nn.sigmoid(q * k_) * v).reshape(B, H, W, G * C)

        adw = self.param("attn_dw_kernel", _stacked_kaiming(), (G, 3, 3, 1, C))
        adb = self.param("attn_dw_bias", nn.initializers.zeros, (G, C))
        attn = bconv(attn, adw, groups_dw=True, bias=adb)
        attn = attn * w.reshape(B, 1, 1, G * C)
        return attn.reshape(B, H, W, G, C)


def fuse_direction_params(unfused: dict) -> dict:
    """Map an EnhancedViMBlock 'separate' param tree (height_block /
    width_block / channel_block submodules) onto the FusedDirectionViM
    layout. Returns {'params': ..., 'batch_stats': ...} for the fused
    module. Used by the parity test and for migrating checkpoints."""
    p = unfused["params"]
    bs = unfused.get("batch_stats", {})
    branches = ["height_block", "width_block", "channel_block"]

    def stack(path):
        out = []
        for b in branches:
            node = p[b]
            for k in path:
                node = node[k]
            out.append(node)
        return jnp.stack(out)

    vm = lambda *k: ("vit_mamba",) + k  # noqa: E731

    params = {
        "proj_h_kernel": p["height_block"]["proj"]["kernel"],
        "proj_w_kernel": p["width_block"]["proj"]["kernel"],
        "proj_c_kernel": p["channel_block"]["proj"]["kernel"],
        "proj_bias": stack(("proj", "bias")),
        "alpha": stack(vm("alpha")),
        "dw1_kernel": stack(vm("dwconv1", "Conv_0", "kernel")),
        "ln_scale": stack(vm("norm", "scale")),
        "ln_bias": stack(vm("norm", "bias")),
        "BCdt_proj_kernel": stack(vm("mixer", "BCdt_proj_kernel")),
        "BCdt_dw_kernel": stack(vm("mixer", "dw_kernel")),
        "A": stack(vm("mixer", "A")),
        "hz_kernel": stack(vm("mixer", "hz_proj", "kernel")),
        "D": stack(vm("mixer", "D")),
        "out_kernel": stack(vm("mixer", "out_proj", "kernel")),
        "dw2_kernel": stack(vm("dwconv2", "Conv_0", "kernel")),
        "ffn1_kernel": stack(vm("ffn", "ConvBNAct_0", "Conv_0", "kernel")),
        "ffn2_kernel": stack(vm("ffn", "ConvBNAct_1", "Conv_0", "kernel")),
        "gate1_kernel": stack(("attn", "Dense_0", "kernel")),
        "gate1_bias": stack(("attn", "Dense_0", "bias")),
        "gate2_kernel": stack(("attn", "Dense_1", "kernel")),
        "gate2_bias": stack(("attn", "Dense_1", "bias")),
        "qkv_kernel": stack(("attn", "qkv", "kernel")),
        "qkv_bias": stack(("attn", "qkv", "bias")),
        "attn_dw_kernel": stack(("attn", "conv", "kernel")),
        "attn_dw_bias": stack(("attn", "conv", "bias")),
    }
    def _get(node, path):
        for k in path:
            node = node[k]
        return node

    for fused_name, path in [
        ("bn1", vm("dwconv1", "BatchNorm_0")),
        ("bn2", vm("dwconv2", "BatchNorm_0")),
        ("ffn_bn1", vm("ffn", "ConvBNAct_0", "BatchNorm_0")),
        ("ffn_bn2", vm("ffn", "ConvBNAct_1", "BatchNorm_0")),
    ]:
        params[fused_name] = {
            "scale": jnp.concatenate([_get(p[b], path)["scale"] for b in branches], -1),
            "bias": jnp.concatenate([_get(p[b], path)["bias"] for b in branches], -1),
        }
    batch_stats = {}
    for fused_name, path in [
        ("bn1", vm("dwconv1", "BatchNorm_0")),
        ("bn2", vm("dwconv2", "BatchNorm_0")),
        ("ffn_bn1", vm("ffn", "ConvBNAct_0", "BatchNorm_0")),
        ("ffn_bn2", vm("ffn", "ConvBNAct_1", "BatchNorm_0")),
    ]:
        if bs:
            batch_stats[fused_name] = {
                "mean": jnp.concatenate([_get(bs[b], path)["mean"] for b in branches], -1),
                "var": jnp.concatenate([_get(bs[b], path)["var"] for b in branches], -1),
            }
    return {"params": params, "batch_stats": batch_stats}


def unfuse_direction_params(fused: dict) -> dict:
    """Inverse of :func:`fuse_direction_params`: map a FusedDirectionViM
    param tree back onto the EnhancedViMBlock 'separate' layout
    (height_block / width_block / channel_block submodules).

    Exact round trip — every fused parameter is a stack (leading branch
    axis) or concat (channel axis) of the separate ones, so unstack/split
    recovers them bit-for-bit. Lets checkpoints saved while 'fused' was the
    model default (the 0106562..4f1f683 window) restore into the current
    'separate' default.
    """
    p = fused["params"]
    bs = fused.get("batch_stats", {})
    branches = ["height_block", "width_block", "channel_block"]
    vm = lambda *k: ("vit_mamba",) + k  # noqa: E731

    # (fused leaf name, per-branch path under the branch submodule)
    stacked = [
        ("proj_bias", ("proj", "bias")),
        ("alpha", vm("alpha")),
        ("dw1_kernel", vm("dwconv1", "Conv_0", "kernel")),
        ("ln_scale", vm("norm", "scale")),
        ("ln_bias", vm("norm", "bias")),
        ("BCdt_proj_kernel", vm("mixer", "BCdt_proj_kernel")),
        ("BCdt_dw_kernel", vm("mixer", "dw_kernel")),
        ("A", vm("mixer", "A")),
        ("hz_kernel", vm("mixer", "hz_proj", "kernel")),
        ("D", vm("mixer", "D")),
        ("out_kernel", vm("mixer", "out_proj", "kernel")),
        ("dw2_kernel", vm("dwconv2", "Conv_0", "kernel")),
        ("ffn1_kernel", vm("ffn", "ConvBNAct_0", "Conv_0", "kernel")),
        ("ffn2_kernel", vm("ffn", "ConvBNAct_1", "Conv_0", "kernel")),
        ("gate1_kernel", ("attn", "Dense_0", "kernel")),
        ("gate1_bias", ("attn", "Dense_0", "bias")),
        ("gate2_kernel", ("attn", "Dense_1", "kernel")),
        ("gate2_bias", ("attn", "Dense_1", "bias")),
        ("qkv_kernel", ("attn", "qkv", "kernel")),
        ("qkv_bias", ("attn", "qkv", "bias")),
        ("attn_dw_kernel", ("attn", "conv", "kernel")),
        ("attn_dw_bias", ("attn", "conv", "bias")),
    ]
    out = {b: {} for b in branches}

    def _set(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for i, b in enumerate(branches):
        _set(out[b], ("proj", "kernel"),
             p[{"height_block": "proj_h_kernel",
                "width_block": "proj_w_kernel",
                "channel_block": "proj_c_kernel"}[b]])
        for fused_name, path in stacked:
            _set(out[b], path, p[fused_name][i])

    bn_paths = [
        ("bn1", vm("dwconv1", "BatchNorm_0")),
        ("bn2", vm("dwconv2", "BatchNorm_0")),
        ("ffn_bn1", vm("ffn", "ConvBNAct_0", "BatchNorm_0")),
        ("ffn_bn2", vm("ffn", "ConvBNAct_1", "BatchNorm_0")),
    ]
    for fused_name, path in bn_paths:
        for field in ("scale", "bias"):
            parts = jnp.split(p[fused_name][field], 3, axis=-1)
            for b, part in zip(branches, parts):
                _set(out[b], path + (field,), part)
    out_bs = {b: {} for b in branches}
    if bs:
        for fused_name, path in bn_paths:
            for field in ("mean", "var"):
                parts = jnp.split(bs[fused_name][field], 3, axis=-1)
                for b, part in zip(branches, parts):
                    _set(out_bs[b], path + (field,), part)
    return {"params": out, "batch_stats": out_bs}
