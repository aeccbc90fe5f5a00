"""DETR transformer: post-norm encoder-decoder over batch-first tensors.

Functional twin of the reference (detr_tf/networks/transformer.py):
model_dim 256, 8 heads, FFN 2048, relu, dropout 0.1, 6+6 layers,
positional encodings added to Q and K at every layer (encoder
:161-164; decoder self-attn Q=K=target+query_embed :218-221, cross-attn
Q=target+query_embed / K=memory+pos), decoder target initialized to
zeros (:45), and the final decoder LayerNorm applied to each
intermediate layer output (:121-128).

TPU-native differences from the reference:
  * batch-first (B, S, D) everywhere — no seq-first transposes
    (the reference reshapes to (HW, B, D), transformer.py:31-43);
  * attention is one fused einsum pipeline with fp32 softmax, optionally
    dispatched to a Pallas flash-attention kernel;
  * key-padding masking actually works (the reference's branch is
    commented out, transformer.py:322-337) — with the default all-valid
    mask the masking code is skipped entirely, matching the reference's
    zero-mask behavior bit for bit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_NEG_INF = -1e9

# attn_impl="auto": dispatch to the Pallas flash kernel when the KEY
# sequence is at least this long (and the backend is TPU). The kernel's
# win is loading K/V once into VMEM and never materializing the (Lq,Lk)
# score matrix in HBM. Full-model A/B on the chip (scripts/attn_bench.py
# --full, interleaved best-of-3, r4):
#
#   size (keys)      xla        pallas     auto
#   608×896  (532)   47.1 ms    52.0 ms    51.1 ms  -> xla wins
#   736×1120 (805)   73.5 ms    77.2 ms    76.4 ms  -> xla wins
#   800×1344 (1050)  101.2 ms   100.5 ms   100.0 ms -> kernel wins
#
# The crossover sits between 805 and 1050 keys: below it XLA's fused
# softmax+matmul is already bandwidth-optimal and the kernel's 128-pad
# overhead dominates; at the 800×1344 eval bucket the (L×L) score
# matrix stops fitting the fusion and the kernel's VMEM residency wins.
# 1024 routes exactly the measured-win region to the kernel.
AUTO_PALLAS_MIN_KEYS = 1024

# The TRAIN crossover sits far lower: differentiating XLA attention
# materializes the (B*H, Lq, Lk) score matrices in HBM on the forward
# AND re-reads them on the backward, bytes the flash kernel (custom VJP,
# in-kernel recompute) never writes. Full train step A/B on the chip
# (scripts/attn_train_probe.py, b8 376x672 = 252 keys, dropout 0.1,
# interleaved best-of-3 + 3-step device-time traces, r5):
#
#   variant    wall ms   device ms   HBM GB
#   xla        27.93     24.16       20.97
#   pallas     27.41     23.61       19.71   (100-key decoder self-attn
#                                             pays the 128-pad tax)
#   auto@128   27.30     23.53       19.71   -> kernel wins from ~128
#
# 128 routes encoder self-attn + decoder cross-attn to the kernel at
# every realistic training size while decoder self-attn (num_queries
# = 100 keys) stays on XLA's fused softmax.
AUTO_PALLAS_MIN_KEYS_TRAIN = 128


def resolve_attn_impl(attn_impl: str, lk: int,
                      return_weights: bool = False,
                      train: bool = False) -> str:
    """Resolve "auto" to a concrete implementation for one call site.

    Pure shape logic + a backend check, so the dispatch is unit-testable
    off-TPU: "auto" means the Pallas flash kernel exactly when the key
    length crosses ``AUTO_PALLAS_MIN_KEYS`` (``_TRAIN`` when
    ``train=True`` — the backward's score-matrix HBM traffic moves the
    crossover from ~1024 down to ~128 keys, measured in
    scripts/attn_train_probe.py), attention weights aren't requested,
    and the default backend is TPU (the kernel only pays off on
    hardware; the CPU interpreter would be orders slower).
    """
    if attn_impl != "auto":
        return attn_impl
    min_keys = AUTO_PALLAS_MIN_KEYS_TRAIN if train else AUTO_PALLAS_MIN_KEYS
    if return_weights or lk < min_keys:
        return "xla"
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


class MultiHeadAttention(nn.Module):
    """Multi-head attention with separate Q/K/V inputs.

    Equivalent math to the reference MHA (transformer.py:237-356): scale
    ``head_dim ** -0.5`` applied to Q after projection (:307), softmax
    over keys, dropout on the attention weights (:340-341), output
    projection. Parameters are stored flax-style ``(in, out)``; the
    weight converter splits/transposes torch's packed ``in_proj``.
    """

    model_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"  # "xla" | "pallas" | "auto" (flash kernel
    # when the key sequence is long enough to pay — resolve_attn_impl)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_weights: bool = False,
    ):
        d, h = self.model_dim, self.num_heads
        dh = d // h
        b, lq = query.shape[0], query.shape[1]
        lk = key.shape[1]

        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, lq, h, dh) * jnp.asarray(dh**-0.5, self.dtype)
        k = k.reshape(b, lk, h, dh)
        v = v.reshape(b, lk, h, dh)

        # The Pallas kernel covers masks, gradients (custom VJP) and
        # attention-weight dropout (in-kernel counter-based PRNG whose
        # mask the backward kernel replays by re-seeding) — the full
        # reference training recipe runs through the flash path.
        impl = resolve_attn_impl(self.attn_impl, lk, return_weights, train)
        use_pallas = impl == "pallas" and not return_weights
        if use_pallas:
            import jax as _jax

            from ..ops.pallas import flash_attention

            rate = self.dropout if train else 0.0
            seed = None
            if rate > 0.0:
                # One int32 seed per call, folded from flax's dropout rng
                # (each MHA instance gets a distinct stream).
                seed = _jax.random.randint(
                    self.make_rng("dropout"), (1,),
                    minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
                )
            out = flash_attention.mha(
                q, k, v, key_padding_mask=key_padding_mask,
                dropout_rate=float(rate), dropout_seed=seed,
            )  # (B, Lq, H, Dh), pre-scaled q
            attn = None
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            if key_padding_mask is not None:
                pad = key_padding_mask[:, None, None, :]  # True = padded
                logits = jnp.where(pad, _NEG_INF, logits)
            attn = nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)

        out = out.reshape(b, lq, d)
        out = nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        if return_weights:
            # Head-averaged weights, like the reference's need_weights path
            # (transformer.py:349-354).
            return out, jnp.mean(attn, axis=1)
        return out


class EncoderLayer(nn.Module):
    """Post-norm encoder layer (reference transformer.py:136-179)."""

    model_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, train=False):
        qk = src + pos
        attn = MultiHeadAttention(
            self.model_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, name="self_attn",
        )(qk, qk, src, key_padding_mask=key_padding_mask, train=train)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(attn)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)

        x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.model_dim, dtype=self.dtype, name="linear2")(x)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    """Post-norm decoder layer: query self-attn, cross-attn to memory, FFN
    (reference transformer.py:183-234)."""

    model_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self, tgt, memory, pos, query_pos, memory_key_padding_mask=None, train=False
    ):
        qk = tgt + query_pos
        attn = MultiHeadAttention(
            self.model_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, name="self_attn",
        )(qk, qk, tgt, train=train)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(attn)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        attn = MultiHeadAttention(
            self.model_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, name="cross_attn",
        )(
            tgt + query_pos, memory + pos, memory,
            key_padding_mask=memory_key_padding_mask, train=train,
        )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(attn)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.model_dim, dtype=self.dtype, name="linear2")(x)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


class Transformer(nn.Module):
    """Encoder-decoder returning the stack of per-layer decoder outputs.

    Inputs are batch-first: src (B, S, D) flattened feature map, pos
    (B, S, D), query_embed (Q, D). Output hs is (L, B, Q, D) — every
    decoder layer's output through the shared final LayerNorm
    (reference transformer.py:121-128) — plus the encoder memory.
    """

    model_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False  # rematerialize layer activations (trade FLOPs
    # for HBM when training with very large batches/resolutions)
    # GPipe pipeline-parallel transformer (parallel/pp.PipelineSpec):
    # the encoder stack — and, when num_decoder_layers divides the
    # stage count, the decoder stack too — runs staged over the spec's
    # mesh axis; params, outputs and gradients are identical trees
    # (verified by tests/test_pipeline_parallel.py::TestDetrPipelined).
    # A decoder depth that doesn't divide the stages falls back to the
    # sequential decoder (encoder still staged). None = off.
    pipeline: Optional[Any] = None

    @nn.compact
    def __call__(self, src, pos, query_embed, key_padding_mask=None, train=False):
        b = src.shape[0]

        enc_cls = EncoderLayer
        dec_cls = DecoderLayer
        if self.remat:
            enc_cls = nn.remat(EncoderLayer, static_argnums=(4,))
            dec_cls = nn.remat(DecoderLayer, static_argnums=(6,))

        if self.pipeline is not None and not self.is_initializing():
            memory = self._pipelined_encoder(
                src, pos, key_padding_mask, train
            )
        else:
            memory = src
            for i in range(self.num_encoder_layers):
                memory = enc_cls(
                    self.model_dim, self.num_heads, self.dim_feedforward,
                    self.dropout, self.dtype, self.attn_impl,
                    name=f"encoder_layer_{i}",
                )(memory, pos, key_padding_mask, train)

        query_pos = jnp.broadcast_to(
            query_embed[None], (b,) + query_embed.shape
        ).astype(self.dtype)
        tgt = jnp.zeros_like(query_pos)  # reference transformer.py:45

        final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        stage_decoder = (
            self.pipeline is not None
            and not self.is_initializing()
            and self.num_decoder_layers
            % self.pipeline.mesh.shape[self.pipeline.stage_axis] == 0
        )
        if stage_decoder:
            # (B, L, Q, D) pre-norm stack from the staged decoder; the
            # shared final LayerNorm is elementwise over D, so applying
            # it to the whole stack equals the sequential per-layer
            # normalization exactly.
            hs_raw = self._pipelined_decoder(
                tgt, memory, pos, query_pos, key_padding_mask, train
            )
            hs = final_norm(jnp.moveaxis(hs_raw, 0, 1))
            return hs, memory

        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = dec_cls(
                self.model_dim, self.num_heads, self.dim_feedforward,
                self.dropout, self.dtype, self.attn_impl,
                name=f"decoder_layer_{i}",
            )(tgt, memory, pos, query_pos, key_padding_mask, train)
            intermediate.append(final_norm(tgt))

        hs = jnp.stack(intermediate, axis=0)  # (L, B, Q, D)
        return hs, memory

    def _pipelined_encoder(self, src, pos, key_padding_mask, train):
        """GPipe-pipeline the encoder stack over ``self.pipeline``'s mesh.

        The per-layer parameters created by the sequential init path
        (``encoder_layer_{i}``) are read from this module's scope and
        re-applied through an unbound EncoderLayer template inside
        ``parallel.pp.pipeline_forward`` — identical math, identical
        parameter tree, so checkpoints and gradients are interchangeable
        with the sequential model. Positions and the padding mask ride
        with each microbatch through the rotation (they are per-image
        inputs, so closure capture would break under a sharded data
        axis); per-layer dropout keys are folded from one base key and
        travel with the stage parameters.
        """
        import jax

        from ..parallel import pp as pp_lib

        spec = self.pipeline
        n_layers = self.num_encoder_layers
        n_stages = spec.mesh.shape[spec.stage_axis]
        template = EncoderLayer(
            self.model_dim, self.num_heads, self.dim_feedforward,
            self.dropout, self.dtype, self.attn_impl,
        )
        layer_params = [
            self.get_variable("params", f"encoder_layer_{i}")
            for i in range(n_layers)
        ]
        stage_params = pp_lib.split_layers_into_stages(
            layer_params, n_stages
        )
        needs_rng = train and self.dropout > 0.0
        if needs_rng:
            base = self.make_rng("dropout")
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(n_layers)
            )
            keys = keys.reshape(
                (n_stages, n_layers // n_stages) + keys.shape[1:]
            )
            stage_params = (stage_params, keys)
        else:
            stage_params = (stage_params,)

        tree = {"src": src, "pos": pos}
        if key_padding_mask is not None:
            tree["kpm"] = key_padding_mask

        def stage_fn(pr, t):
            def body(carry, xs):
                p1 = xs[0]
                rngs = {"dropout": xs[1]} if needs_rng else None
                out = template.apply(
                    {"params": p1}, carry, t["pos"], t.get("kpm"), train,
                    rngs=rngs,
                )
                return out, None

            out, _ = jax.lax.scan(body, t["src"], pr)
            return {**t, "src": out}

        n_micro = spec.n_micro
        if n_micro is None:
            n_micro = pp_lib.choose_n_micro(
                src.shape[0], n_stages,
                spec.mesh.shape[spec.data_axis] if spec.data_axis else 1,
            )
        out = pp_lib.pipeline_forward(
            stage_fn, stage_params, tree, spec.mesh,
            n_micro=n_micro, stage_axis=spec.stage_axis,
            data_axis=spec.data_axis,
            tp_axis=getattr(spec, "tp_axis", None),
            remat_stage=getattr(spec, "remat_stage", False),
        )
        return out["src"]

    def _pipelined_decoder(
        self, tgt, memory, pos, query_pos, key_padding_mask, train
    ):
        """GPipe-pipeline the decoder stack over ``self.pipeline``'s mesh.

        Same construction as ``_pipelined_encoder`` — per-layer params
        read from this module's scope, re-applied through an unbound
        DecoderLayer template inside ``parallel.pp.pipeline_forward`` —
        with two decoder-specific twists:

        * the encoder **memory** (plus positions/query positions/mask)
          rides the rotation with each microbatch, exactly like ``pos``
          does in the encoder path: every stage cross-attends to the
          microbatch's own memory, so the staged math is identical to
          sequential;
        * every layer's output is needed (the aux-loss intermediates),
          so the rotating tree carries an ``hs`` buffer (mb, L, Q, D)
          that each stage fills at its own layer offsets — the offset
          travels as a per-stage "parameter" (an ``arange`` leaf in the
          stacked stage params), which is how a stage knows which rows
          are its own without consulting the mesh axis index.

        Returns the pre-final-norm (B, L, Q, D) stack.
        """
        import jax

        from ..parallel import pp as pp_lib

        spec = self.pipeline
        n_layers = self.num_decoder_layers
        n_stages = spec.mesh.shape[spec.stage_axis]
        per = n_layers // n_stages
        template = DecoderLayer(
            self.model_dim, self.num_heads, self.dim_feedforward,
            self.dropout, self.dtype, self.attn_impl,
        )
        layer_params = [
            self.get_variable("params", f"decoder_layer_{i}")
            for i in range(n_layers)
        ]
        stage_params = {
            "layers": pp_lib.split_layers_into_stages(
                layer_params, n_stages
            ),
            "offset": jnp.arange(n_stages) * per,
        }
        needs_rng = train and self.dropout > 0.0
        if needs_rng:
            base = self.make_rng("dropout")
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(n_layers)
            )
            stage_params["keys"] = keys.reshape(
                (n_stages, per) + keys.shape[1:]
            )

        b = tgt.shape[0]
        tree = {
            "tgt": tgt,
            "hs": jnp.zeros(
                (b, n_layers) + tgt.shape[1:], tgt.dtype
            ),
            "mem": memory,
            "pos": pos,
            "qpos": query_pos,
        }
        if key_padding_mask is not None:
            tree["kpm"] = key_padding_mask

        def stage_fn(pr, t):
            offset = pr["offset"]

            def body(carry, xs):
                h, hs = carry
                rngs = {"dropout": xs["k"]} if needs_rng else None
                out = template.apply(
                    {"params": xs["p"]}, h, t["mem"], t["pos"], t["qpos"],
                    t.get("kpm"), train, rngs=rngs,
                )
                hs = jax.lax.dynamic_update_index_in_dim(
                    hs, out, offset + xs["j"], 1
                )
                return (out, hs), None

            xs = {"p": pr["layers"], "j": jnp.arange(per)}
            if needs_rng:
                xs["k"] = pr["keys"]
            (h, hs), _ = jax.lax.scan(body, (t["tgt"], t["hs"]), xs)
            return {**t, "tgt": h, "hs": hs}

        n_micro = spec.n_micro
        if n_micro is None:
            n_micro = pp_lib.choose_n_micro(
                b, n_stages,
                spec.mesh.shape[spec.data_axis] if spec.data_axis else 1,
            )
        out = pp_lib.pipeline_forward(
            stage_fn, stage_params, tree, spec.mesh,
            n_micro=n_micro, stage_axis=spec.stage_axis,
            data_axis=spec.data_axis,
            tp_axis=getattr(spec, "tp_axis", None),
            remat_stage=getattr(spec, "remat_stage", False),
        )
        return out["hs"]
