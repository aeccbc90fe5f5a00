"""Host-side data pipelines: COCO / VOC / CSV loaders, augmentation,
normalization, fixed-size target packing, and a threaded prefetcher."""

from .processing import (  # noqa: F401
    MAX_TARGETS,
    normalized_images,
    denormalize_image,
    pad_targets,
    pad_labels,
    unpack_labels,
)
