"""Host-side data pipelines: COCO / VOC / CSV loaders, augmentation,
normalization, fixed-size target packing, and a threaded prefetcher."""

from .processing import (  # noqa: F401
    MAX_TARGETS,
    normalized_images,
    denormalize_image,
    pad_targets,
    pad_labels,
    pad_image_to_bucket,
    unpack_labels,
)
from .coco import load_coco_dataset, COCO_CLASS_NAME  # noqa: F401
from .voc import load_voc_dataset, VOC_CLASS_NAME  # noqa: F401
from .tfcsv import load_tfcsv_dataset  # noqa: F401
from .pipeline import HostDataset, prefetch_to_device  # noqa: F401
from .transforms import detr_transform  # noqa: F401
from .synthetic import make_synthetic_coco  # noqa: F401
from .panoptic import load_coco_panoptic  # noqa: F401
