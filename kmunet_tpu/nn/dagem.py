"""DAGEM — deformable-attention graph edge-aggregation bridge module.

Re-derivation of `/root/reference/DAGEM_md.py:7-111`. Treats the H x W grid
as a graph with 4-neighbor edges built from *circular* shifts (the reference
uses torch.cat wrap-around, not zero padding — kept faithfully via jnp.roll):

    edge[.., k]      = roll_k(x) * x                       (4 directions)
    aggregated_edge  = MLP_{4->1}(edge rows) per (b,h,w,c)
    update_vertex    = MLP_{2C->C/2}([x, aggregated_edge])
    update_edge      = MLP_{4->1}(MLP_{2C->C/2}([x(x4), edge]))
    update_feature   = update_vertex * update_edge
    deform branch    = DeformConv3x3(x, offsets=Conv3x3(x)) + x
    out              = Conv1x1+BN+ReLU([deform, update_feature])

The per-pixel MLPs are dense layers over the last axis (rows = every
(b,h,w[,k]) position); their BatchNorm1d normalizes over all rows, which in
NHWC is exactly flax BatchNorm with feature axis -1.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.nn.layers import ConvBNAct
from kmunet_tpu.nn.resample import DeformConv2d


class _RowMLP(nn.Module):
    """Linear + BatchNorm(features) + ReLU over the last axis."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, kernel_init=kaiming_uniform_torch())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class DAGEM(nn.Module):
    """Graph-edge-aggregation bridge with a deformable-conv branch (NHWC)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape

        # 4-neighbor circular-shift edges (DAGEM_md.py:62-69), scaled by x.
        edge = jnp.stack(
            [
                jnp.roll(x, 1, axis=1),
                jnp.roll(x, -1, axis=1),
                jnp.roll(x, 1, axis=2),
                jnp.roll(x, -1, axis=2),
            ],
            axis=-1,
        ) * x[..., None]  # (B, H, W, C, 4)

        aggregated_edge = _RowMLP(1, name="edge_aggregation")(edge, train)[..., 0]

        vertex_in = jnp.concatenate([x, aggregated_edge], axis=-1)  # (B,H,W,2C)
        update_vertex = _RowMLP(C // 2, name="vertex_update")(vertex_in, train)

        # Edge update: per direction, rows of [x, edge_k] (2C features).
        edge_in = jnp.concatenate(
            [jnp.broadcast_to(x[..., None], edge.shape), edge], axis=-2
        )  # (B,H,W,2C,4)
        edge_rows = edge_in.transpose(0, 1, 2, 4, 3)  # (B,H,W,4,2C)
        upd = _RowMLP(C // 2, name="edge_update")(edge_rows, train)  # (B,H,W,4,C/2)
        upd = upd.transpose(0, 1, 2, 4, 3)  # (B,H,W,C/2,4)
        update_edge = _RowMLP(1, name="edge_reduce")(upd, train)[..., 0]  # (B,H,W,C/2)

        update_feature = update_vertex * update_edge

        offset = nn.Conv(
            18, (3, 3), padding="SAME", kernel_init=kaiming_uniform_torch(),
            name="offset_conv",
        )(x)
        deformed = DeformConv2d(C, name="deform_conv")(x, offset) + x

        combined = jnp.concatenate([deformed, update_feature], axis=-1)
        return ConvBNAct(C, (1, 1), name="final_aggregation")(combined, train)
