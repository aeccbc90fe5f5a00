"""detr_tensorflow_tpu — a TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Visual-Behavior/detr-tensorflow (reference mounted at /root/reference):
DETR-R50/R101 models, COCO/VOC/CSV data pipelines, Hungarian set-loss
training (fully on-device), COCO-style mAP evaluation, fused single-image
inference, data-parallel training over a `jax.sharding.Mesh`, Orbax
checkpointing, and Pallas flash-attention kernels.

Design principles (TPU-first, not a port):
  * everything in the compute path is jit-compiled with static shapes;
  * batch-first (B, S, D) layouts feeding the MXU, NHWC convs;
  * the Hungarian matcher runs on-device (no host round trip, unlike the
    reference's ``tf.numpy_function`` hop at
    ``detr_tf/loss/hungarian_matching.py:197``);
  * scaling is expressed with `jax.sharding` + collectives over ICI, not
    host-side gradient loops.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import data  # noqa: F401
from . import train  # noqa: F401
from . import parallel  # noqa: F401
from . import metrics  # noqa: F401
from . import logger  # noqa: F401
from . import utils  # noqa: F401
from . import inference  # noqa: F401
from .predictor import Predictor, Detection  # noqa: F401
from .export import export_predictor, load_predictor  # noqa: F401
