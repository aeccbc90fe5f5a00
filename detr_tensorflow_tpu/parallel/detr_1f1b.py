"""The 1F1B schedule wired to the real DETR as a usable training path.

``pp.pipeline_train_1f1b`` is the generic primitive;
``detr_1f1b_value_and_grad`` is its DETR integration: it decomposes the
model the way the schedule needs —

* **prefix** (backbone + input_proj + sine positions + query-embed
  broadcast), run once and linearized with ``jax.vjp`` so the
  pipeline's input cotangent ``dx`` drives its backward;
* **staged encoder AND decoder**: all ``n_enc + n_dec`` transformer
  layers flatten into one sequence of *layer slots* split contiguously
  over the mesh's stage axis. The rotating activation tree carries the
  encoder sequence (``src``/``pos``), the decoder queries
  (``tgt``/``qpos``) and the per-layer decoder output stack (``hs``)
  together; each slot applies its encoder layer, its decoder layer, or
  the identity, selected by a per-slot kind flag via ``lax.switch``.
  Because all encoder slots precede all decoder slots, ``src`` holds
  the final encoder memory by the time the first decoder slot runs —
  cross-attention cotangents flow backward through the same rotation,
  stage by stage, into the encoder layers' backward. SPMD homogeneity
  (every stage runs one traced program) costs two things: each slot
  carries BOTH an encoder-layer and a decoder-layer parameter tree
  (zeros where unused — ~2.4x the transformer's weight storage), and a
  layer count that does not divide the stage count pads with identity
  slots at the END of the sequence (deliberately: the last stage also
  runs the loss suffix, so it gets the idle slots);
* **suffix as the pipelined loss**: shared decoder norm + class/box
  heads + Hungarian set loss run per-microbatch at the last stage
  (``loss_params``), with the batch-global loss normalizers
  (``ops.losses.global_loss_normalizers``) computed upfront so the
  microbatched sum equals the standard whole-batch ``detr_loss``
  exactly. Applying the shared final LayerNorm to the whole ``hs``
  stack at the suffix equals the sequential per-layer normalization
  exactly (it is elementwise over the model dim).

Returns ``(loss, grads)`` with ``grads`` shaped exactly like
``variables["params"]`` — plug into any optax optimizer. Equality with
``jax.value_and_grad`` of the sequential model is asserted in
tests/test_pipeline_parallel.py (TestFullDetr1F1B covers the wiring;
TestDetr1F1BValueAndGrad covers this function, including an 8-stage
enc+dec staged case).

Scope: ``head="detr"`` without the segmentation head (masks/non-detr
variants pipeline via the GPipe path, which the Trainer selects
automatically — train/engine.py). Dropout TRAINS through the schedule:
one PRNG key per layer slot rides with the stages (``stage_aux``) and
is replayed exactly in the backward re-linearization, so gradients are
exact for the masks drawn. RNG-stream caveat vs the sequential model:
mask *patterns* repeat across microbatches within a step (one key per
layer), so a dropout run is deterministic given the key but not
bitwise-comparable to the sequential model; the dropout-free path is
unchanged (exact equality tests). Use 1F1B when transformer depth is
what outgrows HBM: live memory is bounded by pipeline depth, so
``n_micro`` can grow until the bubble is negligible.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.losses import detr_loss, global_loss_normalizers
from .pp import choose_n_micro, pipeline_train_1f1b

Pytree = Any

_KIND_IDENTITY, _KIND_ENC, _KIND_DEC = 0, 1, 2


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
      model: a ``models.DETR`` instance (``head="detr"``,
        ``masks=False``; its ``pipeline`` field is ignored here).
      variables: the model's ``{"params", "frozen"}`` tree — the SAME
        tree the sequential model uses (checkpoints interchange).
      batch: dict with ``images`` (B,H,W,3), ``boxes`` (B,T,4),
        ``classes`` (B,T), ``mask`` (B,T) — the Trainer's batch layout.
      mesh: mesh carrying ``stage_axis`` (and optionally ``data_axis``).
      background_class: the "no object" class id.
      n_micro: microbatches (default: 2 x stages, clipped to divide B).
      dropout_rng: PRNG key enabling dropout (required when
        ``model.dropout > 0``). One key per layer slot rides with the
        stage parameters (``stage_aux``) — replayed exactly in the
        backward re-linearization, so gradients stay exact for the
        masks drawn (see the module docstring for the RNG-stream
        caveat vs the sequential model).

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
    assert n_enc >= 1 and n_dec >= 1, (n_enc, n_dec)
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

    # ---- layer slots: enc_0..enc_{E-1}, dec_0..dec_{D-1}, identity pad
    tr = params["transformer"]
    enc_params = [tr[f"encoder_layer_{i}"] for i in range(n_enc)]
    dec_params = [tr[f"decoder_layer_{i}"] for i in range(n_dec)]
    enc_zero = jax.tree.map(jnp.zeros_like, enc_params[0])
    dec_zero = jax.tree.map(jnp.zeros_like, dec_params[0])
    L = n_enc + n_dec
    per = -(-L // S)  # ceil: identity slots pad the tail
    n_slots = S * per
    slot_enc, slot_dec, slot_kind, slot_hs = [], [], [], []
    for i in range(n_slots):
        if i < n_enc:
            slot_enc.append(enc_params[i])
            slot_dec.append(dec_zero)
            slot_kind.append(_KIND_ENC)
            slot_hs.append(0)
        elif i < L:
            slot_enc.append(enc_zero)
            slot_dec.append(dec_params[i - n_enc])
            slot_kind.append(_KIND_DEC)
            slot_hs.append(i - n_enc)
        else:
            slot_enc.append(enc_zero)
            slot_dec.append(dec_zero)
            slot_kind.append(_KIND_IDENTITY)
            slot_hs.append(0)

    def stack_slots(trees):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        return jax.tree.map(
            lambda a: a.reshape((S, per) + a.shape[1:]), stacked
        )

    stage_params = {"enc": stack_slots(slot_enc),
                    "dec": stack_slots(slot_dec)}
    stage_aux = {
        "kind": jnp.asarray(slot_kind, jnp.int32).reshape(S, per),
        "hs_idx": jnp.asarray(slot_hs, jnp.int32).reshape(S, per),
    }
    if train:
        keys = jax.vmap(
            lambda i: jax.random.fold_in(dropout_rng, i)
        )(jnp.arange(n_slots))
        stage_aux["keys"] = keys.reshape((S, per) + keys.shape[1:])

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
        qpos = jnp.broadcast_to(
            pre_p["query_embed"][None], (bb, Q, D)).astype(model.dtype)
        return {
            "src": src.reshape(bb, fh * fw, D),
            "pos": pos.reshape(bb, fh * fw, D),
            "tgt": jnp.zeros((bb, Q, D), model.dtype),
            "qpos": qpos,
            "hs": jnp.zeros((bb, n_dec, Q, D), model.dtype),
        }

    def apply_slot(p, key, t):
        """One layer slot: identity / encoder layer / decoder layer,
        chosen by the slot's kind flag. All branches take and return
        the full activation tree, so lax.switch stays shape-stable;
        only the selected branch executes (and only it is
        re-linearized in the backward)."""
        rngs = {"dropout": key} if train else None

        def do_identity(t):
            return t

        def do_enc(t):
            src = enc_template.apply(
                {"params": p["enc"]}, t["src"], t["pos"], None, train,
                rngs=rngs)
            return {**t, "src": src}

        def do_dec(t):
            h = dec_template.apply(
                {"params": p["dec"]}, t["tgt"], t["src"], t["pos"],
                t["qpos"], None, train, rngs=rngs)
            hs = jax.lax.dynamic_update_index_in_dim(
                t["hs"], h, key_idx, 1)
            return {**t, "tgt": h, "hs": hs}

        key_idx = p["_hs_idx"]
        return jax.lax.switch(
            p["_kind"], [do_identity, do_enc, do_dec], t)

    def stage_fn(pr, aux, t):
        """One stage = scan over its layer slots. The integer slot
        metadata (kind, hs index, dropout key) rides in ``aux`` —
        OUTSIDE the differentiated stage parameters, so the vjp never
        sees integer leaves — and is zipped into the per-slot params
        under underscore keys for apply_slot."""
        def body(carry, xs):
            p_l, kind, hs_idx, key = xs
            p_full = {**p_l, "_kind": kind, "_hs_idx": hs_idx}
            return apply_slot(p_full, key, carry), None

        keys = aux.get("keys")
        if keys is None:
            keys = jnp.zeros((per, 2), jnp.uint32)
        out, _ = jax.lax.scan(
            body, t,
            ({"enc": pr["enc"], "dec": pr["dec"]},
             aux["kind"], aux["hs_idx"], keys),
        )
        return out

    gnorm = global_loss_normalizers(batch["mask"], Q)

    def post_loss(lp, y, tgt):
        # The shared final LayerNorm over the whole (mb, L, Q, D) stack
        # equals the sequential per-layer normalization exactly
        # (elementwise over D).
        hs = final_norm.apply({"params": lp["decoder_norm"]}, y["hs"])
        hs = jnp.moveaxis(hs, 1, 0)  # (L, mb, Q, D)
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

    pre_params = {"backbone": params["backbone"],
                  "input_proj": params["input_proj"],
                  "query_embed": params["query_embed"]}
    lp = {"decoder_norm": tr["decoder_norm"],
          "class_embed": params["class_embed"],
          "bbox_embed": params["bbox_embed"]}

    targets = {"boxes": batch["boxes"], "classes": batch["classes"],
               "tmask": batch["mask"]}
    y, pre_vjp = jax.vjp(lambda pp_: pre_fn(pp_, batch["images"]),
                         pre_params)
    loss, slot_g, dx, lp_g = pipeline_train_1f1b(
        stage_fn, post_loss, stage_params, y, targets, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
        loss_params=lp, stage_aux=stage_aux)
    (pre_g,) = pre_vjp(dx)

    # Reassemble into the variables["params"] layout: slot (s, j) holds
    # layer s*per + j; unused halves of each slot carry zero grads.
    grads_tr = {"decoder_norm": lp_g["decoder_norm"]}
    for i in range(n_enc):
        s, j = divmod(i, per)
        grads_tr[f"encoder_layer_{i}"] = jax.tree.map(
            lambda a: a[s, j], slot_g["enc"])
    for i in range(n_dec):
        s, j = divmod(n_enc + i, per)
        grads_tr[f"decoder_layer_{i}"] = jax.tree.map(
            lambda a: a[s, j], slot_g["dec"])
    grads = {
        "backbone": pre_g["backbone"],
        "input_proj": pre_g["input_proj"],
        "transformer": grads_tr,
        "class_embed": lp_g["class_embed"],
        "bbox_embed": lp_g["bbox_embed"],
        "query_embed": pre_g["query_embed"],
    }
    return loss, grads
