"""Pallas 3x3/stride-2/pad-1 max pool (the ResNet stem pool), TPU.

Why a kernel when XLA has ``reduce_window``: at the inference stem
shape (bf16[32,400,672,64] -> [32,200,336,64]) the r5 per-op trace
clocks XLA's maxpool fusion at 332 GB/s — 4.15 ms for a 1.38 GB op
whose wire-rate floor is ~1.7 ms (scripts/infer_trace_probe.py,
docs/performance.md r5). The op is pure data movement, so a kernel
that streams rows HBM->VMEM once and writes only the pooled rows back
runs at the bandwidth roofline.

Shape of the computation per grid program (one batch element, ``_TR``
output rows): DMA the 2*TR+2 input rows covering the output rows'
windows into VMEM, take the 3-row vertical max per output row, then
the horizontal 3-window stride-2 max via an even/odd deinterleave
(out[q] = max(even[q], odd[q], odd[q-1]) — no strided lane access).

Contract (asserted by the wrapper): input is NON-NEGATIVE (the stem's
post-relu activations — reference resnet_backbone.py stem order), so
zero-padding at the borders is exactly torch's -inf SAME padding. Even
width required (the deinterleave); other shapes fall back to the XLA
path in the caller (ops/maxpool.py keeps reduce_window + the gather
VJP as the general implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8  # output rows per program


def _kernel(x_hbm, o_ref, scr, sem, *, h: int, w: int, oh: int):
    """x_hbm: (1, H, W, C) in ANY/HBM for this batch element; o_ref:
    (1, TR, OW, C) VMEM; scr: (R, W, C) VMEM, R = 2*TR + 2."""
    j = pl.program_id(1)
    r0 = j * _TR
    in_start = 2 * r0 - 1  # global index of the first window row
    R = 2 * _TR + 2
    # Fixed-size row window fully inside [0, H): covers every valid row
    # the program needs (invalid rows are zero-substituted below).
    start0 = jnp.clip(in_start, 0, h - R)
    dma = pltpu.make_async_copy(
        x_hbm.at[0, pl.ds(start0, R)], scr, sem
    )
    dma.start()
    dma.wait()

    off = in_start - start0  # scratch index of window row 0 (may be -1)
    ow = w // 2
    c = o_ref.shape[-1]

    for i in range(_TR):  # static unroll: TR output rows
        rows = []
        for k in range(3):
            idx = off + 2 * i + k  # scratch row of window row k
            gidx = in_start + 2 * i + k  # global row (for validity)
            row = scr[jnp.clip(idx, 0, R - 1)]  # (W, C)
            valid = (gidx >= 0) & (gidx < h)
            rows.append(jnp.where(valid, row, jnp.zeros_like(row)))
        v = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])  # (W, C)
        pairs = v.reshape(ow, 2, c)
        even = pairs[:, 0]  # x[2q]
        odd = pairs[:, 1]   # x[2q+1]
        # odd[q-1] with zero at q=0 (left pad; inputs are >= 0)
        prev = jnp.pad(odd[: ow - 1], ((1, 0), (0, 0)))
        o_ref[0, i] = jnp.maximum(jnp.maximum(even, odd), prev)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_3x3_s2_pallas(x: jnp.ndarray, interpret: bool = None):
    """3x3 stride-2 pad-1 max pool over NON-NEGATIVE NHWC input.

    Bit-identical to ``ops.maxpool.max_pool_3x3_s2`` for x >= 0 (the
    stem's post-relu use). Forward only — compose with the gather VJP
    in ops/maxpool.py for training.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    assert w % 2 == 0, "even width required (caller falls back)"
    oh, ow = (h + 1) // 2, w // 2
    oh_pad = -(-oh // _TR) * _TR
    grid = (b, oh_pad // _TR)
    R = 2 * _TR + 2
    assert h >= R, f"H={h} must be >= {R} (caller falls back)"
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, oh=oh),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, c), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.ANY,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _TR, ow, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh_pad, ow, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(b * h * w * c + b * oh * ow * c)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x)
    return out[:, :oh]
