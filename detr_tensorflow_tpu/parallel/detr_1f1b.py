"""The 1F1B schedule wired to the real DETR as a usable training path.

``pp.pipeline_train_1f1b`` is the generic primitive;
``detr_1f1b_value_and_grad`` is its DETR integration: it decomposes the
model the way the schedule needs —

* **prefix** (backbone + input_proj + sine positions), run once and
  linearized with ``jax.vjp`` so the pipeline's input cotangent ``dx``
  drives its backward;
* **staged encoder**: the ``encoder_layer_{i}`` parameters split into
  contiguous stages over the mesh's stage axis (identical parameter
  tree to the sequential model, like the GPipe path);
* **suffix as the pipelined loss**: decoder stack + heads + Hungarian
  set loss run per-microbatch at the last stage (``loss_params``),
  with the batch-global loss normalizers
  (``ops.losses.global_loss_normalizers``) computed upfront so the
  microbatched sum equals the standard whole-batch ``detr_loss``
  exactly.

Returns ``(loss, grads)`` with ``grads`` shaped exactly like
``variables["params"]`` — plug into any optax optimizer. Equality with
``jax.value_and_grad`` of the sequential model is asserted in
tests/test_pipeline_parallel.py (TestFullDetr1F1B covers the wiring;
test_detr_1f1b_value_and_grad covers this function).

Scope (v1): ``head="detr"``, no pixel mask, no segmentation head, and
dropout must be 0 (inference-style determinism inside the schedule —
the GPipe flag path handles dropout; plumb per-stage RNG like
models/transformer.py does there if needed). Use it when the encoder
depth is what outgrows HBM: memory is bounded by pipeline depth, so
``n_micro`` can grow until the bubble is negligible.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.losses import detr_loss, global_loss_normalizers
from .pp import (
    choose_n_micro,
    pipeline_train_1f1b,
    scan_layers,
    split_layers_into_stages,
)

Pytree = Any


def detr_1f1b_value_and_grad(
    model,
    variables: Dict[str, Pytree],
    batch: Dict[str, jnp.ndarray],
    mesh,
    *,
    background_class: int,
    n_micro: int = None,
    stage_axis: str = "stage",
    data_axis: str = None,
    dropout_rng: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Pytree]:
    """Full-DETR loss + gradients through the 1F1B pipeline schedule.

    Args:
      model: a ``models.DETR`` instance (``head="detr"``, ``masks=False``,
        ``dropout=0.0``; its ``pipeline`` field is ignored here).
      variables: the model's ``{"params", "frozen"}`` tree — the SAME
        tree the sequential model uses (checkpoints interchange).
      batch: dict with ``images`` (B,H,W,3), ``boxes`` (B,T,4),
        ``classes`` (B,T), ``mask`` (B,T) — the Trainer's batch layout.
      mesh: mesh carrying ``stage_axis`` (and optionally ``data_axis``).
      background_class: the "no object" class id.
      n_micro: microbatches (default: 2 × stages, clipped to divide B).
      dropout_rng: PRNG key enabling dropout (required when
        ``model.dropout > 0``). Per-layer encoder keys ride with the
        stage parameters (``stage_aux`` — replayed exactly in the
        backward re-linearization, so gradients stay exact for the
        masks drawn); the decoder draws a distinct key per microbatch
        (threaded through the targets pytree). RNG-stream caveats vs
        the sequential model: encoder mask *patterns* repeat across
        microbatches within a step (one key per layer; per-microbatch
        encoder keys would have to ride the differentiated activation
        pytree, where integer leaves break the vjp), and the decoder
        stream differs from a single whole-batch draw — so a dropout
        run is deterministic given the key but not bitwise-comparable
        to the sequential model; the dropout-free path is unchanged
        (exact equality tests).

    Returns ``(loss, grads)``; ``grads`` matches ``variables["params"]``.
    """
    train = model.dropout > 0.0
    if train and dropout_rng is None:
        raise ValueError(
            "model.dropout > 0 requires dropout_rng= (or use the "
            "GPipe path, DETR(pipeline=...))"
        )
    if model.masks or model.head != "detr":
        raise NotImplementedError(
            "the 1F1B schedule supports head='detr' without the "
            "segmentation head; masks/non-detr variants pipeline via "
            "the GPipe path — DETR(pipeline=spec) — which the Trainer "
            "selects automatically (train/engine.py)"
        )
    from flax import linen as nn

    from ..models.layers import MLP
    from ..models.position import sine_position_embedding
    from ..models.resnet import ResNetBackbone
    from ..models.transformer import DecoderLayer, EncoderLayer

    params, frozen = variables["params"], variables.get("frozen", {})
    D, heads = model.model_dim, model.num_heads
    Q, C = model.num_queries, model.num_classes
    n_enc, n_dec = model.num_encoder_layers, model.num_decoder_layers
    S = mesh.shape[stage_axis]
    b = batch["images"].shape[0]
    if n_micro is None:
        n_micro = choose_n_micro(
            b, S, mesh.shape[data_axis] if data_axis else 1
        )

    stage_sizes = model.backbone_stage_sizes or {
        50: (3, 4, 6, 3), 101: (3, 4, 23, 3)
    }[model.backbone_depth]
    backbone = ResNetBackbone(
        stage_sizes=stage_sizes,
        replace_stride_with_dilation=(False, False, model.dilation),
        dtype=model.dtype,
    )
    proj = nn.Conv(D, (1, 1), dtype=model.dtype)
    drop = model.dropout if train else 0.0
    enc_template = EncoderLayer(
        D, heads, model.dim_feedforward, drop, model.dtype,
        model.attn_impl)
    dec_template = DecoderLayer(
        D, heads, model.dim_feedforward, drop, model.dtype,
        model.attn_impl)
    final_norm = nn.LayerNorm(epsilon=1e-5, dtype=model.dtype)
    class_embed = nn.Dense(C, dtype=model.dtype)
    bbox_embed = MLP(D, 4, dtype=model.dtype)

    def pre_fn(pre_p, images):
        feats = backbone.apply(
            {"params": pre_p["backbone"],
             "frozen": frozen.get("backbone", {})},
            images.astype(model.dtype))
        bb, fh, fw, _ = feats.shape
        valid = jnp.ones((bb, fh, fw), jnp.float32)
        pos = sine_position_embedding(
            valid, num_pos_features=D // 2, dtype=model.dtype)
        src = proj.apply({"params": pre_p["input_proj"]}, feats)
        return {"src": src.reshape(bb, fh * fw, D),
                "pos": pos.reshape(bb, fh * fw, D)}

    def stage_one(p, t):
        return {**t, "src": enc_template.apply(
            {"params": p}, t["src"], t["pos"])}

    def stage_scan_train(stacked_p, keys, t):
        """One stage = scan over its layers, each with its own dropout
        key (replayed exactly in the backward re-linearization)."""
        def body(carry, xs):
            p_l, k_l = xs
            src = enc_template.apply(
                {"params": p_l}, carry["src"], carry["pos"], None, True,
                rngs={"dropout": k_l})
            return {**carry, "src": src}, None

        out, _ = jax.lax.scan(body, t, (stacked_p, keys))
        return out

    gnorm = global_loss_normalizers(batch["mask"], Q)

    def post_loss(lp, y, tgt):
        memory, pos = y["src"], y["pos"]
        bb = memory.shape[0]
        query_pos = jnp.broadcast_to(
            lp["query_embed"][None], (bb, Q, D)).astype(model.dtype)
        h = jnp.zeros_like(query_pos)
        intermediate = []
        for i in range(n_dec):
            if train:
                # Distinct key per microbatch (rode in with the
                # targets), folded per decoder layer.
                rngs = {"dropout": jax.random.fold_in(tgt["rng"][0], i)}
            else:
                rngs = None
            h = dec_template.apply(
                {"params": lp[f"decoder_layer_{i}"]},
                h, memory, pos, query_pos, None, train, rngs=rngs)
            intermediate.append(final_norm.apply(
                {"params": lp["decoder_norm"]}, h))
        hs = jnp.stack(intermediate, axis=0)
        logits = class_embed.apply(
            {"params": lp["class_embed"]}, hs).astype(jnp.float32)
        bxs = bbox_embed.apply(
            {"params": lp["bbox_embed"]}, hs).astype(jnp.float32)
        out = {
            "pred_logits": logits[-1], "pred_boxes": bxs[-1],
            "aux_logits": logits[:-1], "aux_boxes": bxs[:-1],
        }
        total, _ = detr_loss(
            out, tgt["boxes"], tgt["classes"], tgt["tmask"],
            background_class, norm=gnorm)
        return total

    tr = params["transformer"]
    enc_params = [tr[f"encoder_layer_{i}"] for i in range(n_enc)]
    pre_params = {"backbone": params["backbone"],
                  "input_proj": params["input_proj"]}
    lp = {"decoder_norm": tr["decoder_norm"],
          "class_embed": params["class_embed"],
          "bbox_embed": params["bbox_embed"],
          "query_embed": params["query_embed"]}
    for i in range(n_dec):
        lp[f"decoder_layer_{i}"] = tr[f"decoder_layer_{i}"]

    targets = {"boxes": batch["boxes"], "classes": batch["classes"],
               "tmask": batch["mask"]}
    if train:
        enc_keys = jax.vmap(
            lambda i: jax.random.fold_in(
                jax.random.fold_in(dropout_rng, 1), i)
        )(jnp.arange(n_enc))
        stage_aux = enc_keys.reshape((S, n_enc // S) + enc_keys.shape[1:])
        targets["rng"] = jax.vmap(
            lambda i: jax.random.fold_in(
                jax.random.fold_in(dropout_rng, 2), i)
        )(jnp.arange(b))
        stage_fn, aux = stage_scan_train, stage_aux
    else:
        stage_fn, aux = scan_layers(stage_one), None
    y, pre_vjp = jax.vjp(lambda pp_: pre_fn(pp_, batch["images"]),
                         pre_params)
    loss, enc_g, dx, lp_g = pipeline_train_1f1b(
        stage_fn, post_loss,
        split_layers_into_stages(enc_params, S), y, targets, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
        loss_params=lp, stage_aux=aux)
    (pre_g,) = pre_vjp(dx)

    # Reassemble into the variables["params"] layout.
    grads_tr = {"decoder_norm": lp_g["decoder_norm"]}
    for i in range(n_dec):
        grads_tr[f"decoder_layer_{i}"] = lp_g[f"decoder_layer_{i}"]
    per = n_enc // S
    for i in range(n_enc):
        grads_tr[f"encoder_layer_{i}"] = jax.tree.map(
            lambda a: a[i // per, i % per], enc_g)
    grads = {
        "backbone": pre_g["backbone"],
        "input_proj": pre_g["input_proj"],
        "transformer": grads_tr,
        "class_embed": lp_g["class_embed"],
        "bbox_embed": lp_g["bbox_embed"],
        "query_embed": lp_g["query_embed"],
    }
    return loss, grads
