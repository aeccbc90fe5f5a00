"""int8 quantized-inference ResNet backbone (post-training quantization).

The serving lever docs/performance.md identifies: the DETR forward is
HBM-bandwidth-bound and backbone feature maps are ~90% of the bytes, so
an int8 activation chain halves the dominant traffic *and* rides the
MXU's double-rate int8 path. This module supplies the full
post-training-quantization (PTQ) pipeline:

  1. ``calibrate_backbone(variables, images)`` — runs an instrumented
     fp32 forward and records the abs-max of every activation the
     quantized graph will carry in int8 (per-tensor, symmetric);
  2. ``quantize_backbone(variables, calib)`` — folds FrozenBatchNorm
     into per-channel scales/biases, quantizes conv weights per output
     channel to int8, and pre-computes every requantization multiplier,
     yielding a standalone "qtree" pytree;
  3. ``quant_backbone_forward(qtree, images)`` — the int8 inference
     graph: 1x1 convs as int8->int32 MXU matmuls with fused requant
     epilogues, stride-1 3x3 convs through the Pallas tap-decomposed
     kernel (ops/pallas/int8_conv.py), residual joins in fp32 on int8
     inputs (XLA fuses the dequant-add-relu-requant elementwise chain,
     so HBM sees int8 on both sides).

Scheme: symmetric per-tensor activation scales (zero-point 0 — SAME
zero padding and validity masking stay exact), per-output-channel
weight scales — the standard TPU/TensorRT inference recipe. The stem
(7x7/s2 on 3 channels) and the maxpool stay bf16: the MXU contraction
is 3-wide there, int8 buys nothing. Strided (first-block) and dilated
(DC5) 3x3s fall back to an XLA int32 conv — 3 of 16 convs in R50; the
bulk runs through the Pallas kernel.

Accuracy: PTQ error is bounded in tests against the fp32 backbone on
random weights; validation on real pretrained weights awaits a
checkpoint (this environment has no egress — ROADMAP.md #1). The
reference has no quantization capability at all (fp32 TF2; SURVEY.md
§6).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.pallas.int8_conv import conv3x3_int8
from ..ops.pallas.int8_matmul import (
    qmatmul,
    qmatmul_residual,
    qmatmul_residual2,
)
from .layers import feature_valid_mask

Tree = Dict[str, Any]

_BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Shared geometry helpers
# ---------------------------------------------------------------------------


def _bn_affine(bn: Tree) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FrozenBatchNorm -> (scale, shift), fp32 (models/layers.py:44-46)."""
    scale = jnp.asarray(bn["weight"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn["running_var"], jnp.float32) + _BN_EPS
    )
    shift = (
        jnp.asarray(bn["bias"], jnp.float32)
        - jnp.asarray(bn["running_mean"], jnp.float32) * scale
    )
    return scale, shift


def _stage_plan(stage_sizes: Sequence[int], dilation: bool):
    """(name, n_blocks, stride, dilation) per stage — mirrors
    ResNetBackbone (models/resnet.py:239-247)."""
    dims = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    dilate = (False, False, False, dilation)
    plan = []
    for s, (n_blocks, (d1, d2)) in enumerate(zip(stage_sizes, dims)):
        strides = 1 if s == 0 else 2
        st, dil = (1, 2) if dilate[s] else (strides, 1)
        plan.append((f"layer{s + 1}", n_blocks, d1, d2, st, dil))
    return plan


def _stem_float(params: Tree, frozen: Tree, x: jnp.ndarray,
                pixel_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """bf16 stem: 7x7/s2 conv + frozen BN + relu + 3x3/s2 maxpool
    (identical math to ResNetBackbone's, models/resnet.py:225-237)."""
    kernel = jnp.asarray(params["conv1"]["kernel"], x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale, shift = _bn_affine(frozen["bn1"])
    x = jnp.maximum(x * scale.astype(x.dtype) + shift.astype(x.dtype), 0)
    if pixel_mask is not None:
        v = feature_valid_mask(pixel_mask, x.shape[1], x.shape[2], dtype=x.dtype)
        x = x * v[..., None]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _valid_at(pixel_mask, h, w):
    if pixel_mask is None:
        return None
    return feature_valid_mask(pixel_mask, h, w, dtype=jnp.float32)


def _backbone_trees(variables: Tree) -> Tuple[Tree, Tree]:
    """Accept full-DETR variables or a bare-backbone init."""
    p, f = variables["params"], variables["frozen"]
    return p.get("backbone", p), f.get("backbone", f)


# ---------------------------------------------------------------------------
# 1) Calibration: instrumented fp32 forward
# ---------------------------------------------------------------------------


def calibrate_backbone(
    variables: Tree,
    images: jnp.ndarray,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    dilation: bool = False,
    pixel_mask: Optional[jnp.ndarray] = None,
) -> Tree:
    """Record per-tensor abs-max for every int8-carried activation.

    ``images``: a representative batch (normalized, NHWC fp32). Returns
    the calibration pytree ``quantize_backbone`` consumes. Jittable.
    """
    params, frozen = _backbone_trees(variables)
    x = _stem_float(params, frozen, images.astype(jnp.float32), pixel_mask)
    calib: Tree = {"stem_out": jnp.max(jnp.abs(x))}

    def conv1x1(p, x, stride=1):
        k = jnp.asarray(p["kernel"], jnp.float32)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(stride, stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for name, n_blocks, d1, d2, stride, dil in _stage_plan(
        stage_sizes, dilation
    ):
        sp, sf = params[name], frozen[name]
        for b in range(n_blocks):
            bp, bf = sp[f"block_{b}"], sf[f"block_{b}"]
            st = stride if b == 0 else 1
            # Dilated (DC5) stages: block_0 convolves undilated at
            # stride 1; later blocks carry the dilation (resnet.py:187).
            d_b = 1 if b == 0 else dil
            blk: Tree = {}
            identity = x
            v_in = _valid_at(pixel_mask, x.shape[1], x.shape[2])

            out = conv1x1(bp["conv1"], x)
            s1, sh1 = _bn_affine(bf["bn1"])
            out = jnp.maximum(out * s1 + sh1, 0)
            if v_in is not None:
                out = out * v_in[..., None]
            blk["a1"] = jnp.max(jnp.abs(out))

            k2 = jnp.asarray(bp["conv2"]["kernel"], jnp.float32)
            out = jax.lax.conv_general_dilated(
                out, k2, window_strides=(st, st),
                padding=[(d_b, d_b), (d_b, d_b)], rhs_dilation=(d_b, d_b),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            s2, sh2 = _bn_affine(bf["bn2"])
            out = jnp.maximum(out * s2 + sh2, 0)
            blk["a2"] = jnp.max(jnp.abs(out))

            out = conv1x1(bp["conv3"], out)
            s3, sh3 = _bn_affine(bf["bn3"])
            out = out * s3 + sh3

            if b == 0:
                identity = conv1x1(bp["downsample_conv"], x, stride=st)
                sd, shd = _bn_affine(bf["downsample_bn"])
                identity = identity * sd + shd
            x = jnp.maximum(out + identity, 0)
            blk["out"] = jnp.max(jnp.abs(x))
            calib.setdefault(name, {})[f"block_{b}"] = blk
    return calib


# ---------------------------------------------------------------------------
# 2) Quantization: fold BN, quantize weights, precompute requant scales
# ---------------------------------------------------------------------------


def _quant_w(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 weights: (HWIO) -> (q, scale)."""
    k = jnp.asarray(kernel, jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    ws = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / ws), -127, 127).astype(jnp.int8)
    return q, ws


def _act_scale(absmax) -> jnp.ndarray:
    return jnp.maximum(jnp.asarray(absmax, jnp.float32), 1e-12) / 127.0


def quantize_backbone(
    variables: Tree,
    calib: Tree,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    dilation: bool = False,
) -> Tree:
    """Fold + quantize the fp32 backbone into a standalone int8 qtree.

    Per conv the requant chain (dequant -> BN affine -> relu -> requant)
    collapses to one per-channel ``scale``/``bias`` pair applied to the
    int32 accumulator (ops/pallas/int8_conv.py epilogue).
    """
    params, frozen = _backbone_trees(variables)
    # Arrays only — geometry (stage sizes / dilation / strides) is
    # passed statically to quant_backbone_forward, so the qtree can be a
    # plain jit argument.
    qt: Tree = {
        "stem": {
            "kernel": jnp.asarray(params["conv1"]["kernel"], jnp.float32),
            "bn": {k: jnp.asarray(v) for k, v in frozen["bn1"].items()},
            "out_scale": _act_scale(calib["stem_out"]),
        },
    }

    for name, n_blocks, d1, d2, stride, dil in _stage_plan(
        stage_sizes, dilation
    ):
        sp, sf = params[name], frozen[name]
        stage: Tree = {}
        for b in range(n_blocks):
            bp, bf = sp[f"block_{b}"], sf[f"block_{b}"]
            cb = calib[name][f"block_{b}"]
            prev = (
                qt["stem"]["out_scale"] if (name, b) == ("layer1", 0)
                else in_scale
            )
            s_a1, s_a2 = _act_scale(cb["a1"]), _act_scale(cb["a2"])
            s_out = _act_scale(cb["out"])

            q1, ws1 = _quant_w(bp["conv1"]["kernel"])
            bs1, bh1 = _bn_affine(bf["bn1"])
            q2, ws2 = _quant_w(bp["conv2"]["kernel"])
            bs2, bh2 = _bn_affine(bf["bn2"])
            q3, ws3 = _quant_w(bp["conv3"]["kernel"])
            bs3, bh3 = _bn_affine(bf["bn3"])

            blk: Tree = {
                # conv1: int32 acc * scale + bias -> relu -> /s_a1 -> int8
                "w1": q1, "m1": prev * ws1 * bs1 / s_a1, "b1": bh1 / s_a1,
                # conv2 (Pallas): epilogue folds the same chain
                "w2": q2, "m2": s_a1 * ws2 * bs2 / s_a2, "b2": bh2 / s_a2,
                # conv3: back to fp32 domain for the residual join
                "w3": q3, "m3": s_a2 * ws3 * bs3, "b3": bh3,
                "in_scale": prev, "out_scale": s_out,
            }
            if b == 0:
                qd, wsd = _quant_w(bp["downsample_conv"]["kernel"])
                bsd, bhd = _bn_affine(bf["downsample_bn"])
                blk["wd"] = qd
                blk["md"] = prev * wsd * bsd
                blk["bd"] = bhd
            stage[f"block_{b}"] = blk
            in_scale = s_out
        qt[name] = stage
    return qt


# ---------------------------------------------------------------------------
# 3) The int8 inference graph
# ---------------------------------------------------------------------------


def _requant(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x), -128.0, 127.0).astype(jnp.int8)


def _matmul1x1_int8(x_i8: jnp.ndarray, w_i8: jnp.ndarray,
                    stride: int = 1) -> jnp.ndarray:
    """1x1 conv as an int8 x int8 -> int32 MXU contraction.

    (1x1 stride-s == slice-then-matmul; measured 1.32x over the bf16
    conv when the output requantizes to int8 — docs/performance.md.)
    """
    if stride != 1:
        x_i8 = x_i8[:, ::stride, ::stride, :]
    return jax.lax.dot_general(
        x_i8, w_i8[0, 0],
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _conv3x3_int8_xla(x_i8, w_i8, stride, dil):
    """Strided/dilated fallback (3 of 16 R50 convs): int8 inputs straight
    into the conv (int32 accumulate) — casting to int32 *before* the conv
    would materialize a 4x-wide feature map and measurably lose."""
    return jax.lax.conv_general_dilated(
        x_i8, w_i8,
        window_strides=(stride, stride),
        padding=[(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quant_backbone_forward(
    qtree: Tree,
    images: jnp.ndarray,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    dilation: bool = False,
    pixel_mask: Optional[jnp.ndarray] = None,
    return_interm: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    use_pallas: bool = True,
    precise: bool = True,  # f32 kernel epilogues; False = bf16 (faster,
    # ~0.5% extra requant noise — see ops/pallas/int8_matmul.py)
):
    """int8 backbone forward: NHWC images -> (B, H/32, W/32, 2048) bf16.

    Drop-in for ResNetBackbone.__call__ at inference (same features,
    same ``return_interm``/``pixel_mask`` contract; interm maps are
    dequantized to ``compute_dtype`` for the segmentation FPN head).
    ``stage_sizes``/``dilation`` must match what the qtree was built
    with (they are static so the qtree stays a plain jit argument).
    """
    stem = qtree["stem"]
    x = _stem_float(
        {"conv1": {"kernel": stem["kernel"]}}, {"bn1": stem["bn"]},
        images.astype(compute_dtype), pixel_mask,
    )
    # Enter the int8 domain.
    x = _requant(x.astype(jnp.float32) / stem["out_scale"])

    interm = {}
    for si, (name, n_blocks, d1, d2, stride, dil) in enumerate(
        _stage_plan(stage_sizes, dilation)
    ):
        stage = qtree[name]
        for b in range(n_blocks):
            blk = stage[f"block_{b}"]
            st = stride if b == 0 else 1
            d_b = 1 if b == 0 else dil
            identity = x
            v_in = _valid_at(pixel_mask, x.shape[1], x.shape[2])

            if use_pallas:
                a1 = qmatmul(
                    x, blk["w1"][0, 0], blk["m1"], blk["b1"],
                    relu=True, precise=precise, interpret=interpret,
                )
            else:
                acc1 = _matmul1x1_int8(x, blk["w1"])
                a1 = _requant(jnp.maximum(
                    acc1.astype(jnp.float32) * blk["m1"] + blk["b1"], 0
                ))
            if v_in is not None:
                # conv2 is the only halo-carrying conv: zero its padded
                # inputs (zero-point 0 makes this exact, resnet.py:125).
                a1 = a1 * v_in.astype(jnp.int8)[..., None]

            if use_pallas and st == 1 and d_b == 1:
                a2 = conv3x3_int8(
                    a1, blk["w2"], blk["m2"], blk["b2"], relu=True,
                    out_dtype=jnp.int8, precise=precise,
                    interpret=interpret,
                )
            else:
                acc2 = _conv3x3_int8_xla(a1, blk["w2"], st, d_b)
                a2 = _requant(
                    jnp.maximum(
                        acc2.astype(jnp.float32) * blk["m2"] + blk["b2"], 0
                    )
                )

            # Bottleneck tail: conv3 + folded BN + residual join + relu +
            # requant. The /out_scale requant folds into every epilogue
            # coefficient (relu commutes with a positive scalar scale).
            so = blk["out_scale"]
            if use_pallas:
                if "wd" in blk:
                    xd = identity[:, ::st, ::st, :]
                    x = qmatmul_residual2(
                        a2, blk["w3"][0, 0], blk["m3"] / so, blk["b3"] / so,
                        xd, blk["wd"][0, 0], blk["md"] / so, blk["bd"] / so,
                        relu=True, precise=precise, interpret=interpret,
                    )
                else:
                    x = qmatmul_residual(
                        a2, blk["w3"][0, 0], blk["m3"] / so, blk["b3"] / so,
                        identity, blk["in_scale"] / so,
                        relu=True, precise=precise, interpret=interpret,
                    )
            else:
                acc3 = _matmul1x1_int8(a2, blk["w3"])
                y = acc3.astype(jnp.float32) * blk["m3"] + blk["b3"]
                if "wd" in blk:
                    accd = _matmul1x1_int8(x, blk["wd"], stride=st)
                    ident_f = accd.astype(jnp.float32) * blk["md"] + blk["bd"]
                else:
                    ident_f = identity.astype(jnp.float32) * blk["in_scale"]
                # Residual join + relu in fp32 on int8 inputs.
                x = _requant(jnp.maximum(y + ident_f, 0) / so)
            out_scale = so
        if return_interm and si < 3:
            interm[f"c{si + 2}"] = (
                x.astype(compute_dtype) * out_scale.astype(compute_dtype)
            )

    c5 = x.astype(compute_dtype) * out_scale.astype(compute_dtype)
    if return_interm:
        return c5, interm
    return c5


def quantize_model(
    variables: Tree,
    calibration_images: jnp.ndarray,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    dilation: bool = False,
    pixel_mask: Optional[jnp.ndarray] = None,
) -> Tree:
    """One call: calibrate + quantize, returning variables ready for
    ``DETR(backbone_quant=True).apply`` (adds the "quant" collection)."""
    calib = calibrate_backbone(
        variables, calibration_images, stage_sizes=stage_sizes,
        dilation=dilation, pixel_mask=pixel_mask,
    )
    qtree = quantize_backbone(
        variables, calib, stage_sizes=stage_sizes, dilation=dilation
    )
    out = dict(variables)
    out["quant"] = {"backbone": qtree}
    return out
