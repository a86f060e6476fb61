from kmunet_tpu.metrics.evaluator import Evaluator, batch_metrics
from kmunet_tpu.metrics.scatter_eval import scatter_evaluate
from kmunet_tpu.metrics.lpips import make_lpips_fn

__all__ = ["Evaluator", "batch_metrics", "scatter_evaluate", "make_lpips_fn"]
