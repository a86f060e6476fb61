from kmunet_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    spatial_sharding,
    replicated,
    shard_params,
    param_sharding_rules,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "spatial_sharding",
    "replicated",
    "shard_params",
    "param_sharding_rules",
]
