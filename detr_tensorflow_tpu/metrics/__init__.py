"""Evaluation metrics: COCO-style mAP, panoptic quality."""

from .ap import APAccumulator, MeanAPEvaluator, DEFAULT_IOU_THRESHOLDS  # noqa: F401
from .coco_protocol import COCOProtocolEvaluator  # noqa: F401
from .pq import panoptic_quality, panoptic_quality_from_outputs  # noqa: F401
