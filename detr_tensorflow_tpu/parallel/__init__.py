"""Device-mesh parallelism: data-parallel sharding over ICI via
`jax.sharding` (the reference has none — 'Multi GPU training comming
soon', README.md:135; its only scaling device is host-side gradient
aggregation, optimizers.py:137-163)."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from .tp import detr_param_shardings, shard_params  # noqa: F401
from . import elastic, multihost  # noqa: F401
from .detr_1f1b import detr_1f1b_value_and_grad  # noqa: F401
from .pp import (  # noqa: F401
    PipelineSpec,
    pipeline_forward,
    pipeline_train_1f1b,
    pipeline_transformer_encoder,
    scan_layers,
    split_layers_into_stages,
    stack_stage_params,
)
