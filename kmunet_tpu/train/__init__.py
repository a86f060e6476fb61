from kmunet_tpu.train.engine import (
    TrainState,
    build_model,
    build_loss,
    build_optimizer,
    make_train_step,
    make_eval_step,
    train_and_evaluate,
)

__all__ = [
    "TrainState",
    "build_model",
    "build_loss",
    "build_optimizer",
    "make_train_step",
    "make_eval_step",
    "train_and_evaluate",
]
