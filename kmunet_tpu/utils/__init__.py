from kmunet_tpu.utils.seed import set_seed
from kmunet_tpu.utils.logging import get_logger, CSVLogger
from kmunet_tpu.utils.flops import flops_of

__all__ = ["set_seed", "get_logger", "CSVLogger", "flops_of"]
