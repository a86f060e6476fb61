from kmunet_tpu.kernels.kanconv_pallas import fused_kanconv, kanconv_reference

__all__ = ["fused_kanconv", "kanconv_reference"]
