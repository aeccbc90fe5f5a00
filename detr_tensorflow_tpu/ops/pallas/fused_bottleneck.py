"""Whole-bottleneck fusion: 1x1 -> 3x3 -> 1x1 + residual in one kernel.

The inference roofline (docs/performance.md) shows the backbone is
HBM-bound: XLA fuses BN/relu/residual into conv epilogues but still
round-trips every intermediate activation. For a stride-1 identity
bottleneck the unfused chain moves ~4.0x the input bytes
(read X, write T1, read T1, write T2, read T2, read X again for the
residual, write Y); keeping T1/T2 entirely in VMEM cuts that to ~2.07x
(read X once with a 1-row halo, write Y) — a ~2x traffic reduction over
12 of the 16 R50 blocks.

Design — halo'd row tiles over (batch, row-tile) grid:
  * the 1x1 convs are matmuls over flattened pixels;
  * the 3x3 is nine shifted matmuls (tap decomposition, like
    int8_conv.py) over the in-VMEM T1;
  * conv1 is computed on the 1-pixel halo too, then ZEROED outside the
    image (relu(bias) != 0 where the unfused conv2 would read zero
    padding);
  * frozen-BN affines fold into the weights/bias host-side
    (fold_bn_params), so the kernel sees plain conv weights + biases.

Inference-path kernel (no VJP): ``DETR(fuse_bottleneck=True)`` /
``ResNetBackbone(fuse_bottleneck=True)``. Applies to stride-1,
dilation-1 identity blocks without a pixel mask; everything else stays
on the XLA path. Parameter tree identical to the XLA path (the flax
module declares the same conv kernels and reads BN scale/shift).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_bn_params(kernel, scale, shift):
    """Fold a frozen-BN affine (y = conv(x)*scale + shift) into the conv.

    kernel: (kh, kw, Cin, Cout); scale/shift broadcastable to (Cout,).
    Returns (kernel', bias (Cout,)) with conv(x, kernel') + bias == y.
    """
    scale = jnp.asarray(scale).reshape(-1)
    shift = jnp.asarray(shift).reshape(-1)
    return kernel * scale[None, None, None, :], shift


def _kernel(
    x_ref,   # (1, TR+2, W+2, C) halo'd input window (zero-padded canvas)
    w1_ref,  # (C, M)
    b1_ref,  # (1, M) f32
    w2_ref,  # (9, M, M) taps row-major (dy*3+dx)
    b2_ref,  # (1, M) f32
    w3_ref,  # (M, C)
    b3_ref,  # (1, C) f32
    o_ref,   # (1, TR, W, C)
    *,
    h: int,
    row_tile: int,
):
    rows = o_ref.shape[1]
    width = o_ref.shape[2]
    c = x_ref.shape[3]
    m = w1_ref.shape[1]
    xh = x_ref[0]  # (TR+2, W+2, C)

    # conv1 (+ folded BN, relu) over the halo window.
    n_halo = (rows + 2) * (width + 2)
    t1 = jax.lax.dot_general(
        xh.reshape(n_halo, c), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    # Zero out-of-image halo positions: the zero-padded input maps to
    # relu(b1) there, but the unfused conv2 reads ZERO padding. Masking
    # happens on the FLAT (n, 1) layout — Mosaic cannot relayout an
    # (R, W) -> (R, W, 1) expand_dims at odd shapes.
    j = pl.program_id(1)
    flat = jax.lax.broadcasted_iota(jnp.int32, (n_halo, 1), 0)
    pad_row = j * row_tile + flat // (width + 2)  # padded-canvas row
    pad_col = flat % (width + 2)
    in_image = (
        (pad_row >= 1) & (pad_row <= h) & (pad_col >= 1) & (pad_col <= width)
    ).astype(jnp.float32)  # (n, 1) broadcasts over channels
    t1 = (jnp.maximum(t1, 0.0) * in_image).astype(x_ref.dtype)
    t1 = t1.reshape(rows + 2, width + 2, m)

    # conv2: nine shifted matmuls, accumulate f32 in VMEM.
    acc = jnp.zeros((rows * width, m), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = t1[dy:dy + rows, dx:dx + width, :].reshape(rows * width, m)
            acc = acc + jax.lax.dot_general(
                xs, w2_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    t2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(x_ref.dtype)

    # conv3 + residual (the window's interior rows ARE the residual) + relu.
    y = jax.lax.dot_general(
        t2, w3_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[0]
    identity = xh[1:1 + rows, 1:1 + width, :].reshape(rows * width, c)
    y = y + identity.astype(jnp.float32)
    o_ref[0] = jnp.maximum(y, 0.0).reshape(rows, width, c).astype(o_ref.dtype)


def _pick_row_tile(hp: int, width: int, c: int, m: int,
                   budget: int = 24 * 2 ** 20) -> int:
    """Largest divisor of hp <= 32 whose VMEM working set fits.

    Grid-streamed in/out blocks are DOUBLE-buffered by Pallas, so they
    count twice (measured: a 12 MB single-buffer estimate compiled to a
    17.3 MB scoped allocation and OOM'd the 16 MB VMEM)."""
    for tr in range(min(hp, 32), 0, -1):
        if hp % tr:
            continue
        est = (
            2 * (tr + 2) * (width + 2) * c * 2  # x window (bf16, 2x buf)
            + (tr + 2) * (width + 2) * m * 4    # t1 (f32 pre-mask)
            + tr * width * m * 4                # acc
            + 2 * tr * width * c * 2            # out (2x buf)
            + 9 * m * m * 2 + 2 * c * m * 2     # weights (compute dtype)
        )
        if est <= budget:
            return tr
    return 1


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def fused_bottleneck(
    x: jnp.ndarray,    # (N, H, W, C)
    w1: jnp.ndarray,   # (1, 1, C, M) or (C, M) — BN-folded
    b1: jnp.ndarray,   # (M,)
    w2: jnp.ndarray,   # (3, 3, M, M) — BN-folded
    b2: jnp.ndarray,   # (M,)
    w3: jnp.ndarray,   # (1, 1, M, C) or (M, C) — BN-folded
    b3: jnp.ndarray,   # (C,)
    row_tile: int = 0,
    interpret: bool = None,  # type: ignore[assignment]
) -> jnp.ndarray:
    """relu(conv3(relu(conv2(relu(conv1(x))))) + x) with T1/T2 in VMEM.

    Identity bottleneck only (stride 1, dilation 1, Cin == Cout).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, width, c = x.shape
    w1 = w1.reshape(-1, w1.shape[-1])
    w3 = w3.reshape(-1, w3.shape[-1])
    m = w1.shape[1]
    assert w3.shape == (m, c), (w3.shape, m, c)
    w2t = w2.reshape(9, m, m)

    hp = _round_up(h, 8)
    tr = row_tile or _pick_row_tile(hp, width, c, m)
    xpad = jnp.pad(x, ((0, 0), (1, 1 + (hp - h)), (1, 1), (0, 0)))

    dt = x.dtype
    fb = lambda v: v.reshape(1, -1).astype(jnp.float32)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, row_tile=tr),
        grid=(n, hp // tr),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tr + 2),
                 pl.Element(width + 2), pl.Element(c)),
                lambda i, j: (i, j * tr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, m, m), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, width, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, width, c), dt),
        interpret=interpret,
        # v5e has 128 MB of physical VMEM; the default 16 MB *scoped*
        # limit under-serves this kernel's working set (the compiler
        # materializes ~2.6x the hand-counted buffers in temporaries).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * width * (c * m + 9 * m * m + m * c),
            bytes_accessed=n * h * width * c * 2 * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
    )(
        xpad, w1.astype(dt), fb(b1), w2t.astype(dt), fb(b2),
        w3.astype(dt), fb(b3),
    )
    return out[:, :h]


def reference_bottleneck(x, w1, b1, w2, b2, w3, b3):
    """XLA reference chain for tests: identical math, materialized."""
    dn = ("NHWC", "HWIO", "NHWC")
    c, m = x.shape[-1], w1.reshape(-1, w1.shape[-1]).shape[-1]
    t1 = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, c, m).astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=dn,
    ) + b1.astype(jnp.float32).reshape(1, 1, 1, -1).astype(x.dtype)
    t1 = jnp.maximum(t1, 0)
    t2 = jax.lax.conv_general_dilated(
        t1, w2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn,
    ) + b2.astype(x.dtype).reshape(1, 1, 1, -1)
    t2 = jnp.maximum(t2, 0)
    y = jax.lax.conv_general_dilated(
        t2, w3.reshape(1, 1, m, c).astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=dn,
    ) + b3.astype(x.dtype).reshape(1, 1, 1, -1)
    return jnp.maximum(y + x, 0)
