from kmunet_tpu.nn.layers import (
    ConvBNAct,
    Conv1x1,
    ChannelLayerNorm,
    FFN,
    DropPath,
    Stem,
    PatchMerging,
    SqueezeExcite,
)
from kmunet_tpu.nn.kan import KANLinear, KANConv2d, kan_regularization_loss
from kmunet_tpu.nn.ssd import HSMSSD, EfficientViMBlock
from kmunet_tpu.nn.wavelet import IntelligentWaveletPooling
from kmunet_tpu.nn.resample import DySample, DeformConv2d
from kmunet_tpu.nn.dagem import DAGEM
from kmunet_tpu.nn.attention import (
    ChannelAttention,
    LocalContrastAttention,
    MultiScaleFusion,
    TripleNorm,
    DirectionAttention,
)

__all__ = [
    "ConvBNAct",
    "Conv1x1",
    "ChannelLayerNorm",
    "FFN",
    "DropPath",
    "Stem",
    "PatchMerging",
    "SqueezeExcite",
    "KANLinear",
    "KANConv2d",
    "HSMSSD",
    "EfficientViMBlock",
    "IntelligentWaveletPooling",
    "DySample",
    "DeformConv2d",
    "DAGEM",
    "ChannelAttention",
    "LocalContrastAttention",
    "MultiScaleFusion",
    "TripleNorm",
    "DirectionAttention",
]
