from kmunet_tpu.models.km_unet import (
    KM_UNetV3,
    KM_UNetV3_SH,
    KM_UNetV3_LAPS,
    StableHybridKANConv,
    EnhancedViMBlock,
    DirectionViM,
)

__all__ = [
    "KM_UNetV3",
    "KM_UNetV3_SH",
    "KM_UNetV3_LAPS",
    "StableHybridKANConv",
    "EnhancedViMBlock",
    "DirectionViM",
]
