"""Evaluation metrics: COCO-style mAP."""

from .ap import APAccumulator, MeanAPEvaluator, DEFAULT_IOU_THRESHOLDS  # noqa: F401
