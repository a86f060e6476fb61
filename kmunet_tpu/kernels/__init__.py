from kmunet_tpu.kernels.kanconv_pallas import fused_kanconv, kanconv_reference
from kmunet_tpu.kernels.ssd_pallas import hsmssd_compress_op, hsmssd_compress_reference

__all__ = [
    "fused_kanconv",
    "kanconv_reference",
    "hsmssd_compress_op",
    "hsmssd_compress_reference",
]
