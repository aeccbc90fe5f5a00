"""Training engine: config, optimizers, jitted step, fit/eval loops,
Orbax checkpointing."""

from .config import TrainingConfig, DataConfig, training_config_parser  # noqa: F401
from .engine import (  # noqa: F401
    TrainState,
    Trainer,
    create_train_state,
    make_train_step,
    make_eval_step,
    fit,
    eval_loop,
    PreemptionGuard,
)
from .checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    restore_latest,
    latest_step,
)
