"""Observability: console/W&B scalar logging, box-overlay images,
validation mAP accumulation."""

from .training_logging import train_log, valid_log  # noqa: F401
from .wandb_logging import WandbSender  # noqa: F401
