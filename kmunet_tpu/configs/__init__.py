from kmunet_tpu.configs.base import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    MeshConfig,
    ExperimentConfig,
    shanghai_km_unet,
    laps_km_unet,
    parse_overrides,
)

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "MeshConfig",
    "ExperimentConfig",
    "shanghai_km_unet",
    "laps_km_unet",
    "parse_overrides",
]
