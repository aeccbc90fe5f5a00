"""Instance-segmentation head for DETR (panoptic-style mask head).

The reference does NOT implement masks — its evaluator's mask row is a
zero placeholder fed by ``np.zeros`` (reference eval.py:54,
README.md:88).  This module completes that gap with the DETR-paper mask
head: per-query multi-head attention maps over the encoder memory,
fused with FPN features from the ResNet stages through a small conv
trunk, producing one mask logit map per query.

TPU-native design notes:
  * everything is batch-first NHWC; the per-query trunk runs with the
    (batch, query) axes merged so XLA sees one big conv batch;
  * the first trunk conv over ``concat(projected_features, attention
    maps)`` is split into two convolutions (conv is linear in channels:
    ``conv([a; b]) = conv_a(a) + conv_b(b)``) so the query-independent
    feature contribution is computed once per image and broadcast —
    the (B, Q, H, W, D+heads) concat is never materialized in HBM;
  * FPN adapters are applied once per image and broadcast over queries;
  * upsampling targets the actual stage shapes (handles odd sizes and
    DC5 dilation where stride-16/32 maps coincide).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_NEG_INF = -1e9


def nearest_upsample_floor(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    """Nearest-neighbor resize of (N, H, W, C) to (N, sh, sw, C) with the
    *floor* index mapping ``src = (dst * H) // sh``.

    Two properties the half-pixel mapping of ``jax.image.resize`` lacks:

      * torch parity — ``F.interpolate(mode="nearest")`` uses exactly this
        floor mapping, so converted checkpoints reproduce at every size,
        not just exact-power-of-two stage ratios;
      * padding invariance — on a bucket-padded canvas the stage ratio is
        exactly 2 and the map is ``i // 2``; for an unpadded image with
        valid extents ``fh = ceil(h/2s), sh = ceil(h/s)`` the floor map
        equals ``i // 2`` on the whole valid range (sh is 2fh or 2fh-1,
        and ``(i*fh)//(2fh-1) == i//2`` for all i < 2fh-1), so the valid
        region's lattice is independent of how much padding the bucket
        added.
    """
    rows = (jnp.arange(sh) * x.shape[1]) // sh
    cols = (jnp.arange(sw) * x.shape[2]) // sw
    return x[:, rows][:, :, cols]


class MHAttentionMap(nn.Module):
    """Per-query multi-head attention score maps over the memory.

    A 2-D attention map per (query, head) — the softmaxed QK^T scores
    only, no value contraction. Output (B, Q, heads, Hf, Wf), fp32.
    """

    model_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # (B, Q, D) final decoder layer
        memory: jnp.ndarray,  # (B, Hf, Wf, D) encoder output
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Hf*Wf) True=pad
        train: bool = False,
    ) -> jnp.ndarray:
        d, h = self.model_dim, self.num_heads
        dh = d // h
        b, nq = queries.shape[0], queries.shape[1]
        fh, fw = memory.shape[1], memory.shape[2]

        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(queries)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(memory)
        q = q.reshape(b, nq, h, dh) * jnp.asarray(dh**-0.5, self.dtype)
        k = k.reshape(b, fh * fw, h, dh)

        logits = jnp.einsum(
            "bqhd,bshd->bqhs", q, k, preferred_element_type=jnp.float32
        )  # (B, Q, heads, S)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], _NEG_INF, logits
            )
        # Paper/torch semantics: softmax over heads AND space jointly
        # (MHAttentionMap flattens (heads, H, W) before the softmax).
        attn = jax.nn.softmax(logits.reshape(b, nq, h * fh * fw), axis=-1)
        attn = attn.reshape(b, nq, h, fh * fw)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        return attn.reshape(b, nq, h, fh, fw)


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics are computed over *valid* spatial
    positions only.

    Plain GroupNorm over a bucket-padded image would fold the zero-padded
    region into every group's mean/variance, making predictions in the
    valid region depend on how much padding the bucket added. With a
    validity mask the statistics match an unpadded forward exactly.
    Parameter layout (``scale``/``bias``) is identical to
    ``nn.GroupNorm``. ``valid=None`` reduces to standard GroupNorm.
    """

    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        n, h, w, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xg = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
        if valid is None:
            mean = xg.mean(axis=(1, 2, 4), keepdims=True)
            var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        else:
            m = valid.astype(jnp.float32).reshape(n, h, w, 1, 1)
            count = jnp.maximum(m.sum(axis=(1, 2, 4), keepdims=True), 1.0) * (
                c // g
            )
            mean = (xg * m).sum(axis=(1, 2, 4), keepdims=True) / count
            var = (((xg - mean) * m) ** 2).sum(
                axis=(1, 2, 4), keepdims=True
            ) / count
        out = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out.reshape(n, h, w, c) * scale + bias
        return out.astype(self.dtype)


class MaskHead(nn.Module):
    """FPN-style conv trunk: (attention maps + projected features) fused
    with the stride-16/8/4 backbone stages, one mask logit map per query.

    Structurally weight-compatible with the DETR-paper panoptic
    ``MaskHeadSmallConv`` (conv dims D+heads -> D+heads -> D/2 -> D/4 ->
    D/8 -> D/16 -> 1, three FPN adapters, GroupNorm(8)), so the public
    panoptic checkpoints convert directly (models/weights.py:
    lay1 splits into lay1_feats/lay1_attn). Two trace-level rewrites
    preserve the math while fitting TPUs:

      * the first conv over ``concat(features, attention maps)`` is
        split into two convolutions (conv is linear in input channels:
        ``conv([a; b]) == conv_a(a) + conv_b(b)``), so the
        query-independent feature half runs once per image and the
        (B, Q, H, W, D+heads) concat never materializes in HBM;
      * FPN adapters run once per image and broadcast over queries.

    Output (B, Q, H4, W4) fp32 logits, where (H4, W4) is the stride-4
    (c2) resolution. With ``pixel_mask`` every 3x3-conv input is zeroed
    outside the valid region and all GroupNorm statistics are masked
    (MaskedGroupNorm), so bucket padding cannot perturb valid-region
    masks; with an all-valid mask this reduces exactly to the torch
    computation.
    """

    model_dim: int = 256
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        proj_feats: jnp.ndarray,  # (B, Hf, Wf, D) input_proj output
        attn_maps: jnp.ndarray,  # (B, Q, heads, Hf, Wf) fp32
        fpn: Dict[str, jnp.ndarray],  # {"c4": stride16, "c3": s8, "c2": s4}
        pixel_mask: Optional[jnp.ndarray] = None,  # (B, H, W) bool, True=valid
    ) -> jnp.ndarray:
        import math

        d, h = self.model_dim, self.num_heads
        # Torch-parity trunk dims: [D+heads, D/2, D/4, D/8, D/16].
        dims = (d + h, max(d // 2, 1), max(d // 4, 1), max(d // 8, 1),
                max(d // 16, 1))
        b, nq = attn_maps.shape[0], attn_maps.shape[1]
        fh, fw = proj_feats.shape[1], proj_feats.shape[2]

        def groups(c):
            # 8 groups at torch scale (every dim above is divisible by 8
            # for D=256); graceful fallback for tiny test models.
            return 8 if c % 8 == 0 else math.gcd(8, c)

        def stage_valid(sh, sw):
            if pixel_mask is None:
                return None
            from .layers import feature_valid_mask

            return feature_valid_mask(pixel_mask, sh, sw, dtype=jnp.float32)

        def apply_gn(idx, x, valid):
            # valid per image (B, sh, sw) -> per (image, query) rows
            v = None
            if valid is not None:
                sh, sw = x.shape[1], x.shape[2]
                v = jnp.broadcast_to(
                    valid[:, None], (b, nq, sh, sw)
                ).reshape(b * nq, sh, sw)
                x = x * v[..., None].astype(x.dtype)
            x = nn.relu(
                MaskedGroupNorm(
                    num_groups=groups(x.shape[-1]), dtype=self.dtype,
                    name=f"gn{idx}",
                )(x, valid=v)
            )
            if v is not None:
                # Re-zero: the GN affine + relu maps the zeroed padded
                # positions to a nonzero constant, which the next conv's
                # halo would read.
                x = x * v[..., None].astype(x.dtype)
            return x

        conv = lambda f, name, bias=True: nn.Conv(  # noqa: E731
            f, (3, 3), padding="SAME", use_bias=bias, dtype=self.dtype,
            name=name,
        )

        # lay1 over concat(features, attention) split into two convs; the
        # attention half carries no bias (torch's single bias lands on
        # the feature half once).
        v0 = stage_valid(fh, fw)
        if v0 is not None:
            proj_feats = proj_feats * v0[..., None].astype(proj_feats.dtype)
        mem_part = conv(dims[0], "lay1_feats")(proj_feats)  # (B,Hf,Wf,C0)
        attn_nhwc = attn_maps.transpose(0, 1, 3, 4, 2).reshape(
            b * nq, fh, fw, h
        )
        attn_part = conv(dims[0], "lay1_attn", bias=False)(
            attn_nhwc.astype(self.dtype)
        )
        x = attn_part.reshape(b, nq, fh, fw, dims[0]) + mem_part[:, None]
        x = apply_gn(1, x.reshape(b * nq, fh, fw, dims[0]), v0)

        x = conv(dims[1], "lay2")(x)
        x = apply_gn(2, x, v0)

        for i, (stage, dim) in enumerate(
            zip(("c4", "c3", "c2"), dims[2:]), start=3
        ):
            feat = fpn[stage]
            sh, sw = feat.shape[1], feat.shape[2]
            cur = x.shape[-1]
            adapter = nn.Conv(
                cur, (1, 1), dtype=self.dtype, name=f"adapter{i - 2}"
            )(feat)  # (B, sh, sw, cur), per image
            x = nearest_upsample_floor(x, sh, sw)
            vs = stage_valid(sh, sw)
            x = x.reshape(b, nq, sh, sw, cur)
            if vs is not None:
                adapter = adapter * vs[..., None].astype(adapter.dtype)
                # Re-zero the upsampled trunk outside THIS stage's valid
                # region: when the valid extent isn't a clean multiple,
                # the nearest upsample replicates a *valid* edge cell
                # into padded cells (e.g. stride-16 col 5 <- valid col 2
                # for w=68 in a 96 bucket), and the next conv's halo
                # would read it where the unpadded forward reads zeros.
                x = x * vs[:, None, :, :, None].astype(x.dtype)
            x = x + adapter[:, None]
            x = conv(dim, f"lay{i}")(x.reshape(b * nq, sh, sw, cur))
            x = apply_gn(i, x, vs)

        out = conv(1, "out_lay")(x)
        h4, w4 = out.shape[1], out.shape[2]
        return out.reshape(b, nq, h4, w4).astype(jnp.float32)
