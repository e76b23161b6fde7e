"""L4 training/eval: losses, optimizers, pjit train step, checkpoints."""

from snerf_tpu.train import losses  # noqa: F401
from snerf_tpu.train.trainer import (  # noqa: F401
    TrainConfig, TrainState, create_train_state, make_train_step)
