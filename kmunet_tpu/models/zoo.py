"""Model zoo registry — maps config names to constructors.

Replicates the reference's model lineup (SURVEY.md §2.2) through one factory
instead of 16 cloned train scripts. Models register here as they land.
"""

from __future__ import annotations

from kmunet_tpu.models.ef import ConvLSTM_EF, TrajGRU_EF
from kmunet_tpu.models.km_unet import KM_UNetV3
from kmunet_tpu.models.mamba_unet import Mamba_UNet
from kmunet_tpu.models.smaat_unet import SmaAt_UNet


def build(model_cfg):
    """model_cfg: configs.ModelConfig."""
    name = model_cfg.name
    n = model_cfg.num_classes
    extra = dict(model_cfg.extra)
    if name == "km_unet_v3":
        return KM_UNetV3(num_classes=n, embed_dims=tuple(model_cfg.embed_dims),
                         variant=model_cfg.variant, **extra)
    if name == "smaat_unet":
        return SmaAt_UNet(n_classes=n, **extra)
    if name == "convlstm":
        return ConvLSTM_EF(out_frames=n)
    if name == "trajgru":
        return TrajGRU_EF(out_frames=n)
    if name == "mamba_unet":
        return Mamba_UNet(predicted_frames=n, **extra)
    if name == "lptqpn":
        from kmunet_tpu.models.lptqpn import LPTQPN

        return LPTQPN(out_frames=n, **extra)
    if name == "sceca_net":
        from kmunet_tpu.models.sceca_net import SCECANet

        return SCECANet(out_channels=n, **extra)
    if name == "transunet":
        from kmunet_tpu.models.transunet import TransUNet

        return TransUNet(num_classes=n, **extra)
    if name == "swin_unet":
        from kmunet_tpu.models.swin_unet import SwinUNet

        return SwinUNet(num_classes=n, **extra)
    raise ValueError(f"unknown model {name!r}")


# Which models take (B, S, H, W) sequences vs (B, H, W, C) frame-stacks.
SEQUENCE_MODELS = {"convlstm", "trajgru"}
