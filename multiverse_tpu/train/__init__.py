from multiverse_tpu.train.trainer import (  # noqa: F401
    TrainState,
    build_optimizer,
    make_train_step,
    make_eval_step,
)
from multiverse_tpu.train.evaluate import evaluate  # noqa: F401
from multiverse_tpu.train.checkpoints import CheckpointManager  # noqa: F401
