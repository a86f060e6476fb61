from kmunet_tpu.metrics.evaluator import Evaluator, batch_metrics

__all__ = ["Evaluator", "batch_metrics"]
