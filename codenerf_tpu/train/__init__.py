from codenerf_tpu.train.optim import build_optimizer, lr_at_step
from codenerf_tpu.train.state import TrainState, init_train_state
from codenerf_tpu.train.step import make_train_step
from codenerf_tpu.train import checkpoint

__all__ = [
    "build_optimizer",
    "lr_at_step",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "checkpoint",
]
