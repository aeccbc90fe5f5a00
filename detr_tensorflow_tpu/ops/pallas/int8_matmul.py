"""Fused int8 1x1-conv (matmul) kernels with quantized epilogues (Pallas).

Why: profiling the all-XLA int8 backbone (scripts/quant_probe.py +
scripts/xplane_top.py) showed XLA does NOT fuse the requantization
chain into int8 convolutions/dots on TPU — it materializes full fp32
intermediates (e.g. f32[32,200,336,256], ~2.7 GB) between separate
loop fusions, so the int8 graph measured *slower* than bf16 (0.84x)
despite halving the activation bytes. These kernels keep the whole
bottleneck-tail arithmetic in VMEM: int8 x int8 -> int32 MXU
contraction, fp32 per-channel scale + bias (folded BatchNorm), the
residual join (identity dequant or a second fused downsample matmul),
ReLU, round-to-nearest-even, clip, int8 — HBM only ever sees int8
activations.

Three entry points (all over (M, C)-flattened NHWC activations):
  * qmatmul            — y  = q(relu(acc*scale + bias))          (conv1)
  * qmatmul_residual   — y  = q(relu(acc*s + b + res_i8*res_s))  (conv3)
  * qmatmul_residual2  — y  = q(relu(acc*s + b + acc_d*s_d + b_d))
                         (stage-entry conv3 with its downsample conv
                          fused as a second MXU contraction)

Weights stay resident in VMEM across the M-tile grid; M is padded to
the tile size and sliced back. Bit-exact vs the XLA int32 reference
epilogue (tests/test_quantized.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _epilogue(y, relu, out_int8, out_dtype):
    """y is fp (f32 precise / bf16 fast). ReLU folds into the clamp.

    bf16 fast path: Mosaic cannot legalize ``math.roundeven`` on bf16,
    so rounding is clamp -> +0.5 -> truncating convert (round-half-up;
    exact in bf16 since ulp <= 0.5 over [0, 128)). Only the ReLU'd
    (non-negative) epilogue takes this path — the backbone's int8
    chain is all post-ReLU."""
    if out_int8:
        if y.dtype == jnp.bfloat16 and relu:
            y = jnp.clip(y, 0.0, 127.0) + 0.5
            return y.astype(out_dtype)
        y = y.astype(jnp.float32)
        lo = 0.0 if relu else -128.0
        return jnp.clip(jnp.round(y), lo, 127.0).astype(out_dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def _mm(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _qmm_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, relu, out_int8, ep):
    y = _mm(x_ref[:], w_ref[:]).astype(ep) * s_ref[0].astype(ep) \
        + b_ref[0].astype(ep)
    o_ref[:] = _epilogue(y, relu, out_int8, o_ref.dtype)


def _qmm_res_kernel(
    x_ref, res_ref, w_ref, s_ref, b_ref, rs_ref, o_ref,
    *, relu, out_int8, ep,
):
    y = _mm(x_ref[:], w_ref[:]).astype(ep) * s_ref[0].astype(ep) \
        + b_ref[0].astype(ep)
    y = y + res_ref[:].astype(ep) * rs_ref[0, 0].astype(ep)
    o_ref[:] = _epilogue(y, relu, out_int8, o_ref.dtype)


def _qmm_res2_kernel(
    x_ref, xd_ref, w_ref, s_ref, b_ref,
    wd_ref, sd_ref, bd_ref,
    o_ref, *, relu, out_int8, ep,
):
    y = _mm(x_ref[:], w_ref[:]).astype(ep) * s_ref[0].astype(ep) \
        + b_ref[0].astype(ep)
    y = y + _mm(xd_ref[:], wd_ref[:]).astype(ep) * sd_ref[0].astype(ep) \
        + bd_ref[0].astype(ep)
    o_ref[:] = _epilogue(y, relu, out_int8, o_ref.dtype)


def _call(kernel, m_operands, w_operands, m, k, out_dtype, m_tile, interpret):
    """Shared pallas_call builder: grid over M tiles, weights resident."""
    mp = _round_up(m, m_tile)
    padded = []
    in_specs = []
    for a in m_operands:  # (M, C?) activation-like: tile over M
        if mp != m:
            a = jnp.pad(a, ((0, mp - m), (0, 0)))
        padded.append(a)
        in_specs.append(
            pl.BlockSpec((m_tile, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    for wop in w_operands:  # weights / per-channel vectors: resident
        padded.append(wop)
        in_specs.append(
            pl.BlockSpec(wop.shape, lambda i, nd=wop.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        kernel,
        grid=(mp // m_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), out_dtype),
        interpret=interpret,
    )(*padded)
    return out[:m] if mp != m else out


def _prep(x):
    """(..., C) -> ((M, C), restore_fn)."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    return x.reshape(m, c), lambda y: y.reshape(*lead, y.shape[-1])


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _auto_m_tile(m_tile, k):
    """~4 MB fp accumulator budget: larger tiles amortize grid overhead
    (measured: m_tile 256 -> 4096 is 142 -> 180 GB/s on the layer-1
    residual shape)."""
    if m_tile:
        return m_tile
    # fp32 accumulator <= 2 MB per matmul (the residual2 variant holds
    # two accumulators live; v5e scoped VMEM is 16 MB total).
    return max(256, min(4096, (1 << 19) // max(k, 64)))


def _ep(precise):
    """Epilogue dtype. ``precise`` keeps the f32 epilogue (bit-exact vs
    the int32 XLA reference); the fast path computes it in bf16 — two
    elements per VPU lane — trading ~0.5% extra requant noise (bounded
    in tests) for roughly a 3x cheaper epilogue, which profiling showed
    dominating these bandwidth-bound kernels."""
    return jnp.float32 if precise else jnp.bfloat16


def qmatmul(x, w, scale, bias, *, relu=True, out_dtype=jnp.int8,
            m_tile=0, precise=True, interpret=None):
    """q(relu(x @ w * scale + bias)): int8 (..., C) x (C, K) -> (..., K)."""
    xf, restore = _prep(x)
    k = w.shape[-1]
    out = _call(
        functools.partial(
            _qmm_kernel, relu=relu, ep=_ep(precise),
            out_int8=jnp.dtype(out_dtype) == jnp.dtype(jnp.int8),
        ),
        [xf],
        [w, scale.reshape(1, k).astype(jnp.float32),
         bias.reshape(1, k).astype(jnp.float32)],
        xf.shape[0], k, out_dtype, _auto_m_tile(m_tile, k),
        _interp(interpret),
    )
    return restore(out)


def qmatmul_residual(x, w, scale, bias, res, res_scale, *, relu=True,
                     out_dtype=jnp.int8, m_tile=0, precise=True,
                     interpret=None):
    """q(relu(x @ w * scale + bias + res * res_scale)) — the bottleneck
    tail with an int8 identity (res: (..., K) int8, res_scale scalar)."""
    xf, restore = _prep(x)
    rf, _ = _prep(res)
    k = w.shape[-1]
    out = _call(
        functools.partial(
            _qmm_res_kernel, relu=relu, ep=_ep(precise),
            out_int8=jnp.dtype(out_dtype) == jnp.dtype(jnp.int8),
        ),
        [xf, rf],
        [w, scale.reshape(1, k).astype(jnp.float32),
         bias.reshape(1, k).astype(jnp.float32),
         jnp.reshape(jnp.asarray(res_scale, jnp.float32), (1, 1))],
        xf.shape[0], k, out_dtype, _auto_m_tile(m_tile, k),
        _interp(interpret),
    )
    return restore(out)


def qmatmul_residual2(x, w, scale, bias, xd, wd, scale_d, bias_d, *,
                      relu=True, out_dtype=jnp.int8, m_tile=0,
                      precise=True, interpret=None):
    """q(relu(x @ w * s + b + xd @ wd * s_d + b_d)) — stage-entry
    bottleneck tail with the 1x1 downsample fused as a second
    contraction (xd: the stride-sliced block input, (..., Cd) int8)."""
    xf, restore = _prep(x)
    xdf, _ = _prep(xd)
    k = w.shape[-1]
    out = _call(
        functools.partial(
            _qmm_res2_kernel, relu=relu, ep=_ep(precise),
            out_int8=jnp.dtype(out_dtype) == jnp.dtype(jnp.int8),
        ),
        [xf, xdf],
        [w, scale.reshape(1, k).astype(jnp.float32),
         bias.reshape(1, k).astype(jnp.float32),
         wd, scale_d.reshape(1, k).astype(jnp.float32),
         bias_d.reshape(1, k).astype(jnp.float32)],
        xf.shape[0], k, out_dtype, _auto_m_tile(m_tile, k),
        _interp(interpret),
    )
    return restore(out)
