"""int8 3x3 convolution kernel (Pallas, TPU) — the quantized-backbone lever.

Why this kernel exists (docs/performance.md, "int8 lever"): the headline
DETR-R50 forward is HBM-bandwidth-bound — backbone feature maps account
for ~50 of ~56 GB moved per iteration — so going materially past the
bf16 bandwidth ceiling requires *smaller bytes*, not more FLOPs. The
MXU's double-rate int8 path is real (measured 1.53x on a 4096^3 matmul)
and int8 1x1 convs win as matmuls, so the quantized backbone needs an
int8 3x3 that at least matches XLA's lowering byte-for-byte.

Design — tap-decomposed implicit GEMM over halo'd row tiles:
  a SAME 3x3/stride-1 conv is the sum of nine shifted matmuls,
      y[n, r, c, :] = sum_{dy,dx in 0..2} x[n, r+dy-1, c+dx-1, :] @ w[dy, dx]
  The grid is (batch, row-tiles); each program's input block is a
  (rows+2, W+2, C) *overlapping* window of the zero-padded image —
  expressed directly with ``pl.Element`` block dims, so the Pallas
  pipeline emitter streams halo'd tiles (no whole-image VMEM residency;
  the earlier whole-image variant exceeded VMEM at the stride-4 stage).
  Nine MXU contractions accumulate in int32 (exact — no floating-point
  drift in the integer domain). The epilogue fuses the whole
  quantized-inference chain: int32 -> fp32 * per-channel scale + bias
  (folded BatchNorm), optional ReLU, round-to-nearest-even, clip, int8 —
  so consecutive quantized convs exchange int8 feature maps and the
  activation traffic is halved vs bf16.

The reference has no quantization story at all (its TF2 stack runs
fp32; SURVEY.md §6); this is a TPU-native capability beyond parity.

Numerics: symmetric per-tensor activation quantization (zero-point 0,
so SAME zero-padding is exact) and per-output-channel weight scales —
the standard TPU/TensorRT-style inference scheme. The integer
accumulator path is bit-exact vs an int32 XLA conv (tested); end-to-end
model error is the quantization error itself, bounded in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_row_tile(hp: int, target: int = 32) -> int:
    """Largest divisor of ``hp`` that is <= target (hp is a multiple of 8).

    Capped at 32: the Mosaic AOT compiler in this environment crashes on
    element-window row tiles of 40 at batch >= 8 (isolated in
    scripts/quant_probe.py iterations — tr=8/24/32 compile, tr=40 does
    not)."""
    best = 8
    for d in range(8, target + 1, 8):
        if hp % d == 0:
            best = d
    return best


def _conv_kernel(
    x_ref,      # (1, TR+2, W+2, C) int8 halo'd row window
    w_ref,      # (9, C, K) int8 — taps flattened row-major (dy*3+dx)
    scale_ref,  # (1, K) f32 — per-channel requant scale
    bias_ref,   # (1, K) f32 — folded-BN bias (post-scale domain)
    o_ref,      # (1, TR, W, Ko) int8 or bf16
    *,
    relu: bool,
    out_int8: bool,
    ep,
):
    w = w_ref[:]
    rows = o_ref.shape[1]
    width = o_ref.shape[2]

    acc = jnp.zeros((rows, width, o_ref.shape[3]), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + rows, dx:dx + width, :]
            acc = acc + jax.lax.dot_general(
                xs, w[dy * 3 + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    from .int8_matmul import _epilogue

    y = acc.astype(ep) * scale_ref[0].astype(ep) + bias_ref[0].astype(ep)
    o_ref[0] = _epilogue(y, relu, out_int8, o_ref.dtype)


def conv3x3_int8(
    x: jnp.ndarray,       # (N, H, W, C) int8
    w: jnp.ndarray,       # (3, 3, C, K) int8 (HWIO, like flax)
    scale: jnp.ndarray,   # (K,) f32: x_scale * w_scale[k] / y_scale
    bias: jnp.ndarray = None,  # (K,) f32 in the *output* (post-scale) domain
    *,
    relu: bool = False,
    out_dtype=jnp.int8,
    row_tile: int = 0,    # 0 = auto (largest divisor of padded H <= 32)
    precise: bool = True,  # f32 epilogue (bit-exact); False = bf16 (fast)
    interpret: bool = None,  # type: ignore[assignment]
) -> jnp.ndarray:
    """Fused quantized SAME 3x3/stride-1 conv: int8 in, int8 (or bf16) out.

    ``scale``/``bias`` fold the whole dequant -> BatchNorm -> requant
    chain into one per-channel affine applied to the int32 accumulator;
    with ``out_dtype=jnp.int8`` the result is round-to-nearest-even,
    clipped to [-128, 127] (after optional ReLU). Returns (N, H, W, K).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, width, c = x.shape
    k = w.shape[-1]
    assert w.shape[:3] == (3, 3, c), w.shape
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)

    hp = _round_up(h, 8)
    tr = row_tile or _pick_row_tile(hp)
    # SAME halo: one zero row/col each side; extra bottom rows so the
    # row-tile grid is rectangular (sliced off after).
    xpad = jnp.pad(x, ((0, 0), (1, 1 + (hp - h)), (1, 1), (0, 0)))

    wt = w.reshape(9, c, k)
    out_int8 = jnp.dtype(out_dtype) == jnp.dtype(jnp.int8)

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, relu=relu, out_int8=out_int8,
            ep=jnp.float32 if precise else jnp.bfloat16,
        ),
        grid=(n, hp // tr),
        in_specs=[
            # Overlapping (halo) windows: element-offset indexing.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tr + 2),
                 pl.Element(width + 2), pl.Element(c)),
                lambda i, j: (i, j * tr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, c, k), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, width, k), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, width, k), out_dtype),
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * hp * width * c * k,
            bytes_accessed=n * hp * width * (c + k) + 9 * c * k,
            transcendentals=0,
        ),
    )(xpad, wt, scale.reshape(1, k).astype(jnp.float32),
      bias.reshape(1, k).astype(jnp.float32))
    return out[:, :h]


def reference_conv3x3_int8(x, w, scale, bias=None, *, relu=False,
                           out_dtype=jnp.int8):
    """XLA reference: identical integer math via an int32 conv."""
    n, h, width, c = x.shape
    k = w.shape[-1]
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)
    acc = jax.lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = acc.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if jnp.dtype(out_dtype) == jnp.dtype(jnp.int8):
        y = jnp.clip(jnp.round(y), -128.0, 127.0)
    return y.astype(out_dtype)
