from kmunet_tpu.losses.losses import (
    hybrid_loss,
    rainfall_loss,
    en_rainfall_loss,
    rain_loss,
    weighted_mse_mae,
)

__all__ = [
    "hybrid_loss",
    "rainfall_loss",
    "en_rainfall_loss",
    "rain_loss",
    "weighted_mse_mae",
]
