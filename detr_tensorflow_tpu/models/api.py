"""User-facing model construction API.

``get_detr_model`` mirrors the reference entry point
(detr_tf/networks/detr.py:116-204) — the include_top / headless /
new-heads variants, optional pretrained weights, and the ``tf_backbone``
normalization switch — returning a ``DetrModel`` bundle (module +
variables + cached jitted apply) instead of a Keras graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .detr import DETR
from . import weights as weights_lib


class DetrModel:
    """A model bundle: flax module + variables + jit cache.

    Callable like the reference Keras model: ``model(images)`` returns
    the output dict. ``variables`` plug directly into the Trainer.
    """

    def __init__(self, module: DETR, variables: Dict[str, Any],
                 normalized_method: str = "torch_resnet"):
        self.module = module
        self.variables = variables
        self.normalized_method = normalized_method
        self._jitted = {}

    def _get_apply(self, train: bool, with_mask: bool):
        key = (train, with_mask)
        if key not in self._jitted:
            if with_mask:
                def fn(variables, images, pixel_mask, rngs=None):
                    return self.module.apply(
                        variables, images, pixel_mask=pixel_mask,
                        train=train, rngs=rngs,
                    )
            else:
                def fn(variables, images, rngs=None):
                    return self.module.apply(
                        variables, images, train=train, rngs=rngs
                    )
            # Both modes are jitted; a train=True call with dropout active
            # just needs its rngs dict passed through (PRNG keys are
            # ordinary traced arrays).
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def __call__(self, images, pixel_mask=None, training: bool = False, rngs=None):
        images = jnp.asarray(images)
        fn = self._get_apply(training, pixel_mask is not None)
        if pixel_mask is not None:
            return fn(self.variables, images, jnp.asarray(pixel_mask), rngs=rngs)
        return fn(self.variables, images, rngs=rngs)

    @property
    def params(self):
        return self.variables["params"]

    @property
    def frozen(self):
        return self.variables.get("frozen", {})

    def save(self, path: str) -> None:
        """Save the variables to our native .npz format (loadable back via
        ``weights='<path>'`` or ``DetrModel.load``) — weight *saving* is a
        capability the reference lacks entirely (SURVEY.md §5)."""
        import jax

        weights_lib.save_variables_npz(jax.device_get(self.variables), path)

    def load(self, path_or_name: str, **convert_kwargs) -> "DetrModel":
        """Replace this bundle's variables from a local checkpoint
        (.npz native format or torch .pth/.bin, auto-converted)."""
        loaded = weights_lib.load_weights(path_or_name, **convert_kwargs)
        self.variables = jax.tree.map(jnp.asarray, loaded)
        self._jitted = {}
        return self


def build_detr(
    num_classes: int = 92,
    num_queries: int = 100,
    head: str = "detr",
    nb_class: Optional[int] = None,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
    backbone_depth: int = 50,
    backbone_stage_sizes=None,
    dilation: bool = False,
    dtype: str = "float32",
    attn_impl: str = "auto",
    weights: Optional[str] = None,
    backbone_weights: Optional[str] = None,
    image_size=(376, 672),
    seed: int = 42,
    normalized_method: str = "torch_resnet",
    **model_kwargs,
) -> DetrModel:
    """Construct a DETR bundle, optionally loading converted weights.

    Extra keyword args (model_dim, num_heads, dim_feedforward, dropout,
    remat, fuse_residual, ...) pass straight through to the DETR module.
    """
    module = DETR(
        num_classes=num_classes,
        num_queries=num_queries,
        num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers,
        backbone_depth=backbone_depth,
        backbone_stage_sizes=backbone_stage_sizes,
        dilation=dilation,
        head=head,
        nb_class=nb_class,
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype],
        attn_impl=attn_impl,
        **model_kwargs,
    )
    h, w = image_size
    # jit(init): one XLA program instead of hundreds of eager initializer
    # dispatches — ~10x faster cold through the remote-TPU relay.
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3))
    )

    if weights is not None:
        loaded = weights_lib.load_weights(
            weights,
            backbone_depth=backbone_depth,
            num_encoder_layers=num_encoder_layers,
            num_decoder_layers=num_decoder_layers,
        )
        loaded = jax.tree.map(jnp.asarray, loaded)
        if head == "detr":
            # Merge: converted checkpoints cover the detection model; any
            # module the checkpoint lacks (e.g. the segmentation head,
            # which no public DETR-R50 detection checkpoint carries)
            # keeps its fresh initialization.
            params = dict(variables["params"])
            params.update(loaded["params"])
            variables = {"params": params, "frozen": loaded["frozen"]}
        else:
            # Keep pretrained trunk, fresh heads (reference
            # include_top=False + load_weights path, detr.py:137-179).
            params = dict(variables["params"])
            for key in ("backbone", "transformer", "input_proj", "query_embed"):
                params[key] = loaded["params"][key]
            variables = {"params": params, "frozen": loaded["frozen"]}

    if backbone_weights is not None:
        # ImageNet backbone init from a local torchvision checkpoint —
        # offline equivalent of the reference's tf_backbone=True Keras
        # ImageNet load (detr_tf/networks/detr.py:148).
        bb = weights_lib.load_backbone_weights(
            backbone_weights, depth=backbone_depth
        )
        variables = weights_lib.apply_backbone_weights(
            variables, jax.tree.map(jnp.asarray, bb)
        )

    return DetrModel(module, variables, normalized_method=normalized_method)


def get_detr_model(
    config=None,
    include_top: bool = False,
    nb_class: Optional[int] = None,
    weights: Optional[str] = None,
    tf_backbone: bool = False,
    num_decoder_layers: int = 6,
    num_encoder_layers: int = 6,
    **kwargs,
) -> DetrModel:
    """Reference-signature model factory (detr.py:116).

    * ``include_top=True`` — pretrained 92-class heads;
    * ``include_top=False, nb_class=None`` — headless (returns hs stack);
    * ``include_top=False, nb_class=N`` — fresh finetuning heads.

    ``tf_backbone=True`` switches the expected input normalization to the
    caffe-style ``tf_resnet`` method (reference detr.py:147-148; the
    ImageNet-pretrained TF backbone itself is not downloadable in this
    egress-free environment — the architecture is identical, weights
    random unless provided).
    """
    if include_top:
        head = "detr"
    elif nb_class is not None:
        head = "finetune"
    else:
        head = "none"
    normalized_method = "tf_resnet" if tf_backbone else "torch_resnet"
    # Explicit kwargs win over config-derived defaults.
    kwargs.setdefault(
        "image_size",
        getattr(config, "image_size", (376, 672)) if config is not None else (376, 672),
    )
    kwargs.setdefault("dtype", getattr(config, "compute_dtype", "float32"))
    kwargs.setdefault("attn_impl", getattr(config, "attn_impl", "auto"))
    kwargs.setdefault("num_queries", getattr(config, "num_queries", 100))
    kwargs.setdefault(
        "backbone_weights", getattr(config, "backbone_weights", None)
    )
    # Model family from config: DETR-R101 / DC5 eval and training
    # protocols (the reference hardcodes R50, detr.py:31).
    kwargs.setdefault("backbone_depth", getattr(config, "backbone_depth", 50))
    kwargs.setdefault("dilation", getattr(config, "dilation", False))
    return build_detr(
        head=head,
        nb_class=nb_class,
        weights=weights,
        num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers,
        normalized_method=normalized_method,
        **kwargs,
    )
