"""DETR model assembly and the user-facing model API.

Mirrors the capability surface of the reference ``detr_tf/networks/
detr.py``: the full ``DETR`` module (detr.py:19-92), the three
``get_detr_model`` variants — pretrained top, headless, and
new-finetuning-heads (detr.py:94-204) — and zero-mask default behavior
(detr.py:172). Assembly is a single flax module whose jitted apply is
the whole forward pass: backbone -> mask downsample -> sine positions ->
1x1 projection -> transformer -> heads.

Outputs are stacked, static-shape pytrees: ``aux_logits``/``aux_boxes``
carry the auxiliary decoder layers as one (A, B, Q, .) array instead of
the reference's list of dicts, so the loss vmaps over them; ``as_aux_list``
converts back for API parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import MLP
from .position import sine_position_embedding
from .resnet import ResNetBackbone
from .transformer import Transformer

Dtype = Any


class DETR(nn.Module):
    """End-to-end DETR: images -> set predictions.

    head:
      * ``"detr"``     — pretrained-style heads: Dense(num_classes) class
        head + shared 3-layer sigmoid box MLP (reference detr.py:49-54);
      * ``"finetune"`` — fresh heads for transfer learning:
        Dense(nb_class) + fresh 3-layer MLP applied to every decoder layer
        (reference add_heads_nlayers, detr.py:94-114);
      * ``"none"``     — headless, returns the (L, B, Q, D) decoder stack
        (reference include_top=False, detr.py:177-179).
    """

    num_classes: int = 92
    num_queries: int = 100
    model_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    backbone_depth: int = 50  # 50 | 101
    backbone_stage_sizes: Optional[tuple] = None  # override (tests/custom)
    dilation: bool = False
    head: str = "detr"
    nb_class: Optional[int] = None  # for head == "finetune"
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"  # shape-dispatched flash attention: the
    # Pallas kernel at >=1024-key call sites on TPU (where it measures
    # faster full-model), XLA everywhere else — see
    # models/transformer.py:resolve_attn_impl. "xla"/"pallas" force.
    remat: bool = False  # rematerialize transformer layers (memory saver)
    backbone_remat: int = 0  # leading ResNet stages to rematerialize in
    # the backward pass (see ResNetBackbone.remat_stages): a memory
    # lever for larger per-chip batches (measured round 4: it *adds*
    # HBM traffic at b8, so keep 0 unless activation memory binds)
    stem_s2d: Any = "auto"  # space-to-depth stem conv (see StemConv).
    # "auto" (default): S2D in training calls — measured 25.05 -> 24.55
    # ms full-step device time at b8 376x672 (the C_in=3 stem conv and
    # its filter-gradient conv are MXU-starved; S2D's 12 channels fix
    # both) — and the direct conv for inference, where XLA's own layout
    # tricks measured faster (docs/performance.md). True/False force.
    fuse_residual: bool = False  # Pallas fused bottleneck tails (inference)
    fuse_bottleneck: bool = False  # Pallas whole-block bottleneck fusion
    # (inference; identity blocks without a pixel mask)
    masks: bool = False  # instance-segmentation head (beyond the
    # reference, whose mask AP row is a zero placeholder — eval.py:54)
    backbone_quant: bool = False  # int8 PTQ backbone (inference): reads
    # the qtree from the "quant" collection (models/quantized.py)
    pipeline: Optional[Any] = None  # parallel/pp.PipelineSpec: GPipe-
    # pipeline the encoder stack over the spec's mesh stage axis

    @nn.compact
    def __call__(self, images, pixel_mask=None, train=False):
        """Args:
          images: (B, H, W, 3) normalized images, NHWC.
          pixel_mask: optional (B, H, W) bool, True for valid pixels. When
            omitted, everything is valid — identical to the reference's
            all-zeros padding mask (detr.py:172).
        """
        stage_sizes = self.backbone_stage_sizes or {
            50: (3, 4, 6, 3), 101: (3, 4, 23, 3)
        }[self.backbone_depth]
        if self.backbone_quant:
            # int8 post-training-quantized backbone: the folded/quantized
            # qtree is supplied as variables["quant"]["backbone"]
            # (models/quantized.py: calibrate_backbone + quantize_backbone).
            from .quantized import quant_backbone_forward

            qtree = self.variable(
                "quant", "backbone",
                lambda: (_ for _ in ()).throw(ValueError(
                    "backbone_quant=True needs variables['quant']"
                    "['backbone'] — build it with models.quantized."
                    "quantize_backbone"
                )),
            ).value
            backbone_out = quant_backbone_forward(
                qtree, images,
                stage_sizes=stage_sizes, dilation=self.dilation,
                pixel_mask=pixel_mask, return_interm=self.masks,
                compute_dtype=self.dtype,
            )
        else:
            backbone_out = ResNetBackbone(
                stage_sizes=stage_sizes,
                replace_stride_with_dilation=(False, False, self.dilation),
                dtype=self.dtype,
                fuse_residual=self.fuse_residual,
                fuse_bottleneck=self.fuse_bottleneck and pixel_mask is None,
                return_interm=self.masks,
                remat_stages=self.backbone_remat,
                stem_s2d=(self.stem_s2d if isinstance(self.stem_s2d, bool)
                          else bool(train)),
                name="backbone",
            )(images.astype(self.dtype), pixel_mask=pixel_mask)
        feats, fpn_feats = backbone_out if self.masks else (backbone_out, None)
        b, fh, fw, _ = feats.shape

        if pixel_mask is None:
            valid = jnp.ones((b, fh, fw), jnp.float32)
            key_padding_mask = None
        else:
            # Validity at the feature resolution by exact conv arithmetic
            # (layers.feature_valid_mask) — the role the reference fills
            # with a nearest-neighbor mask downsample (detr.py:57-63),
            # which misses the last valid cell for odd extents.
            from .layers import feature_valid_mask

            valid = feature_valid_mask(pixel_mask, fh, fw, dtype=jnp.float32)
            key_padding_mask = (valid < 0.5).reshape(b, fh * fw)

        pos = sine_position_embedding(
            valid, num_pos_features=self.model_dim // 2, dtype=self.dtype
        )

        proj = nn.Conv(
            self.model_dim, (1, 1), dtype=self.dtype, name="input_proj"
        )(feats)

        src = proj.reshape(b, fh * fw, self.model_dim)
        pos = pos.reshape(b, fh * fw, self.model_dim)

        query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.model_dim),
            jnp.float32,
        )

        hs, memory = Transformer(
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            pipeline=self.pipeline,
            name="transformer",
        )(src, pos, query_embed, key_padding_mask=key_padding_mask, train=train)

        pred_masks = None
        if self.masks:
            from .segmentation import MHAttentionMap, MaskHead

            attn_maps = MHAttentionMap(
                model_dim=self.model_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                dtype=self.dtype,
                name="bbox_attention",
            )(
                hs[-1],
                memory.reshape(b, fh, fw, self.model_dim),
                key_padding_mask=key_padding_mask,
                train=train,
            )
            pred_masks = MaskHead(
                model_dim=self.model_dim,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name="mask_head",
            )(proj, attn_maps, fpn_feats, pixel_mask=pixel_mask)

        if self.head == "none":
            out = {"hs": hs, "memory": memory.reshape(b, fh, fw, self.model_dim)}
            if pred_masks is not None:
                out["pred_masks"] = pred_masks
            return out

        if self.head == "detr":
            logits = nn.Dense(
                self.num_classes, dtype=self.dtype, name="class_embed"
            )(hs)  # (L, B, Q, C) in one matmul
            boxes = MLP(
                self.model_dim, 4, dtype=self.dtype, name="bbox_embed"
            )(hs)
        elif self.head == "finetune":
            assert self.nb_class is not None, "finetune head needs nb_class"
            logits = nn.Dense(
                self.nb_class, dtype=self.dtype, name="cls_layer"
            )(hs)
            boxes = MLP(
                self.model_dim, 4, dtype=self.dtype, name="pos_layer"
            )(hs)
        else:
            raise ValueError(f"unknown head: {self.head}")

        logits = logits.astype(jnp.float32)
        boxes = boxes.astype(jnp.float32)
        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "aux_logits": logits[:-1],
            "aux_boxes": boxes[:-1],
        }
        if pred_masks is not None:
            out["pred_masks"] = pred_masks
        return out


def as_aux_list(outputs):
    """Convert stacked aux outputs to the reference's list-of-dicts form
    (detr.py:195-202)."""
    out = {"pred_logits": outputs["pred_logits"], "pred_boxes": outputs["pred_boxes"]}
    if "aux_logits" in outputs:
        n = outputs["aux_logits"].shape[0]
        out["aux"] = [
            {
                "pred_logits": outputs["aux_logits"][i],
                "pred_boxes": outputs["aux_boxes"][i],
            }
            for i in range(n)
        ]
    return out
