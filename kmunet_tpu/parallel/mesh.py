"""Mesh construction and sharding rules — the framework's "distributed backend".

The reference has no distributed layer at all (single ``model.cuda()``,
train_shanghai.py:333; zero ``torch.distributed`` usage). On TPU, parallelism
is a first-class component: we define an explicit device mesh with axes

    data    — batch (data parallel; gradients psum over ICI automatically
              under GSPMD when the batch is sharded on this axis)
    spatial — image rows (H). A "context parallel" axis for 2D nowcasting:
              256x256 activations dominate memory, and every conv/SSD
              contraction either is local or reduces over L = H*W, so
              XLA inserts halo exchanges / psums over ICI.
    model   — reserved for FSDP-style parameter sharding / tensor parallel.

All sharding flows through NamedSharding; compute stays inside one ``jit``
so XLA (GSPMD) inserts the collectives. No NCCL analogue exists or is needed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. Axis size -1 means "absorb remaining devices"."""

    data: int = -1
    spatial: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        sizes = [self.data, self.spatial, self.model]
        free = [i for i, s in enumerate(sizes) if s == -1]
        fixed = math.prod(s for s in sizes if s != -1)
        if n_devices % fixed:
            raise ValueError(f"{n_devices} devices not divisible by fixed axes {sizes}")
        if len(free) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if free:
            sizes[free[0]] = n_devices // fixed
        if math.prod(sizes) != n_devices:
            raise ValueError(f"mesh {sizes} != {n_devices} devices")
        return tuple(sizes)


def make_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
    allow_spatial_with_model: bool = False,
) -> Mesh:
    """Build a ('data', 'spatial', 'model') mesh over the available devices.

    Meshes with BOTH spatial>1 and model>1 are refused by default: the XLA
    SPMD partitioner (jax 0.9) silently doubles halo-exchange conv weight
    gradients in that layout (see ``param_sharding_rules`` docstring and
    tests/test_sharding_parity.py::test_sp2_model2_upstream_miscompile).
    Pass ``allow_spatial_with_model=True`` only to reproduce/diagnose that.
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    d, s, m = spec.resolve(len(devices))
    if s > 1 and m > 1 and not allow_spatial_with_model:
        raise ValueError(
            f"mesh (data={d}, spatial={s}, model={m}): combining spatial>1 "
            "with model>1 is disabled — the XLA SPMD partitioner miscompiles "
            "halo-exchange conv weight grads (exactly 2x) in this layout. "
            "Use dp x spatial or dp x model, or pass "
            "allow_spatial_with_model=True to override."
        )
    arr = np.array(devices).reshape(d, s, m)
    return Mesh(arr, axis_names=("data", "spatial", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) across the 'data' axis; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int = 4, h_axis: int = 1) -> NamedSharding:
    """Shard batch on 'data' and image rows (H) on 'spatial' (NHWC: axis 1)."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(
    mesh: Mesh, params: Any, fsdp: bool = False, min_size: int = 4096
) -> Any:
    """Sharding pytree for parameters.

    With ``fsdp=False`` (the v1 default) every parameter is replicated: the
    models are small (<2M params) so DP + replicated params is optimal.
    With ``fsdp=True``, parameters with ndim >= 2 and at least ``min_size``
    elements whose largest dim is divisible by the 'model' axis size are
    sharded along it (ZeRO-3 style); the rest stay replicated. XLA
    all-gathers them at use sites.

    The ndim/min_size guard is standard FSDP practice: sharding a bias or a
    720-element stem kernel saves nothing and costs an all-gather.

    KNOWN UPSTREAM LIMITATION (jax 0.9 / XLA SPMD partitioner, observed on
    the 8-virtual-CPU mesh): combining spatial>1 AND model>1 in one mesh
    miscompiles the weight gradients of halo-exchange convolutions (spatial
    kernels > 1x1 on H-sharded activations) to EXACTLY 2x — even when every
    parameter is replicated and the 'model' axis is completely unused; the
    forward/loss stays bit-correct, which makes it silent. dp x spatial and
    dp x model(FSDP) meshes are each numerically proven
    (tests/test_sharding_parity.py); ``make_mesh`` refuses the combined
    layout unless explicitly overridden.
    """
    model_size = mesh.shape["model"]

    def rule(p):
        if (
            not fsdp or model_size == 1 or not hasattr(p, "shape")
            or p.ndim < 2 or p.size < min_size
        ):
            return replicated(mesh)
        dims = list(p.shape)
        axis = int(np.argmax(dims))
        if dims[axis] % model_size == 0 and dims[axis] >= 2 * model_size:
            spec = [None] * p.ndim
            spec[axis] = "model"
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree.map(rule, params)


def shard_params(params: Any, shardings: Any) -> Any:
    """Place a parameter pytree according to a sharding pytree."""
    return jax.device_put(params, shardings)
