"""Pallas 3x3/stride-2/pad-1 max pool (the ResNet stem pool), TPU.

**Status: correctness-complete, measured SLOWER than XLA — parked with
data, default off** (`ops.maxpool.max_pool_3x3_s2(nonneg=True)` gates
it; nothing sets that flag by default). The motivation was the r5
per-op trace clocking XLA's maxpool fusion at 332 GB/s (4.15 ms for a
1.38 GB op whose wire-rate floor is ~1.7 ms); the measured result
(scripts/maxpool_infer_probe.py, interleaved best-of-3, exact parity):

    b32 infer (400x672x64):  xla 6.99 ms | this kernel 25.5 ms
    b8 train (188x336x64):   xla 1.88 ms | this kernel 2.79 ms

Root cause: with C=64 in the lane dim every VPU op runs half-empty
(64 of 128 lanes), while XLA's chosen H-minor layout packs lanes full
— the very layout that makes dynamically-offset row DMA impossible for
a Pallas kernel (first attempt; Mosaic also rejects stride-2
extract_strided_slice, bf16 rotates, and mis-lowers (W,C)->(OW,2,C)
reshape+index, all discovered en route — see _hwindow). Kept as the
documented record of WHY the maxpool stays on XLA, and as a working
halo-block pattern for future kernels.

Design (learned the hard way — the obvious manual-DMA row window
crashes Mosaic here because XLA's NHWC layout puts H in the LANE dim,
making dynamically-offset row slices of HBM untileable): pure
``BlockSpec`` pipelining, no manual DMA, no dynamic indexing.

* grid (B, OH/TR); input block = the 2*TR rows that feed the block's
  TR output rows *except* the one row above (windows are [2i-1, 2i,
  2i+1], so only row ``2*TR*j - 1`` crosses the block boundary);
* that single halo row per block is PRECOMPUTED outside the kernel as
  a (B, nblocks, 1, W, C) strided gather — H/(2*TR) extra rows, ~6%
  traffic at TR=8;
* vertical 3-row max with static in-block indices, then the
  horizontal stride-2 window via an even/odd deinterleave
  (out[q] = max(even[q], odd[q], odd[q-1]) — no strided lane access).

Contract (asserted by the wrapper): input is NON-NEGATIVE (the stem's
post-relu activations — reference resnet_backbone.py stem order), so
zero-padding at the borders is exactly torch's -inf SAME padding.
Even H and W required (2*TR | H); other shapes fall back to the XLA
path in the caller (ops/maxpool.py keeps reduce_window + the gather
VJP as the general implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hwindow(v, w: int, c: int, mode: str):
    """Horizontal 3-window stride-2 max of v (W, C) -> (OW, C).

    out[q] = max(v[2q-1], v[2q], v[2q+1])
           = max(pairmax(v)[q], pairmax(roll(v, 1))[q])
    where pairmax(y)[q] = max(y[2q], y[2q+1]) — a reshape-reduce with
    NO stride-2 compaction (Mosaic rejects stride-2 extract_strided_
    slice, and a (W,C)->(OW,2,C) reshape + index mis-lowers). The
    shift is a pad+slice (pltpu.roll rejects bf16: "Rotate with
    non-32-bit data"); position 0 gets the zero left pad (inputs are
    >= 0, so zero == -inf padding).

    mode="matmul" is the fallback compaction via a 0/1 selection
    matrix on the (otherwise idle) MXU, kept for hardware where the
    sublane reshape-reduce mis-lowers too.
    """
    ow = w // 2
    if mode == "reduce":
        vs = jnp.pad(v[: w - 1], ((1, 0), (0, 0)))  # vs[p] = v[p-1]
        pairs = jnp.max(v.reshape(ow, 2, c), axis=1)    # max(v[2q],v[2q+1])
        pairs_s = jnp.max(vs.reshape(ow, 2, c), axis=1)  # max(v[2q-1],v[2q])
        return jnp.maximum(pairs, pairs_s)
    # Selection matmul: S[q, p] = [p in {2q-1, 2q, 2q+1}]; rows of S
    # pick each window's columns, max emulated by... a 0/1 matmul sums
    # — not max — so instead compact even/odd with two 0/1 matrices.
    se = _sel_matrix(w, 0, v.dtype)   # (OW, W): picks v[2q]
    so = _sel_matrix(w, 1, v.dtype)   # (OW, W): picks v[2q+1]
    even = jax.lax.dot_general(
        se, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(v.dtype)
    odd = jax.lax.dot_general(
        so, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(v.dtype)
    prev = jnp.pad(odd[: ow - 1], ((1, 0), (0, 0)))
    return jnp.maximum(jnp.maximum(even, odd), prev)


def _sel_matrix(w: int, parity: int, dtype):
    ow = w // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (ow, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ow, w), 1)
    return (cols == 2 * rows + parity).astype(dtype)


def _kernel(x_ref, halo_ref, o_ref, *, tr: int, mode: str):
    """x_ref: (1, 2*TR, W, C) — this block's input rows; halo_ref:
    (1, 1, W, C) — global row 2*TR*j - 1 (zeros for j = 0); o_ref:
    (1, TR, OW, C)."""
    w = x_ref.shape[2]
    c = x_ref.shape[3]
    for i in range(tr):  # static unroll
        above = halo_ref[0, 0, 0] if i == 0 else x_ref[0, 2 * i - 1]
        v = jnp.maximum(
            jnp.maximum(above, x_ref[0, 2 * i]), x_ref[0, 2 * i + 1]
        )  # (W, C)
        o_ref[0, i] = _hwindow(v, w, c, mode)


def _pick_tr(h: int) -> int:
    for tr in (8, 4, 2, 1):
        if h % (2 * tr) == 0:
            return tr
    return 0


def supported(shape) -> bool:
    """Shapes the kernel covers; callers fall back to XLA otherwise."""
    _, h, w, _ = shape
    return w % 2 == 0 and _pick_tr(h) > 0


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def max_pool_3x3_s2_pallas(x: jnp.ndarray, interpret: bool = None,
                           mode: str = "reduce"):
    """3x3 stride-2 pad-1 max pool over NON-NEGATIVE NHWC input.

    Bit-identical to ``ops.maxpool.max_pool_3x3_s2`` for x >= 0 (the
    stem's post-relu use). Forward only — compose with the gather VJP
    in ops/maxpool.py for training.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    tr = _pick_tr(h)
    assert tr > 0 and w % 2 == 0, "unsupported shape (caller falls back)"
    oh, ow = h // 2, w // 2
    nb = oh // tr  # row blocks
    # Halo: global row 2*tr*j - 1 per block (zeros for block 0).
    halo = jnp.concatenate(
        [
            jnp.zeros((b, 1, w, c), x.dtype),
            x[:, 2 * tr - 1 :: 2 * tr][:, : nb - 1],
        ],
        axis=1,
    ).reshape(b, nb, 1, w, c)
    out = pl.pallas_call(
        functools.partial(_kernel, tr=tr, mode=mode),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 2 * tr, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, ow, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(b * h * w * c + b * oh * ow * c)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, halo)
    return out
