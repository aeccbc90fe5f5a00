"""Stem maxpool with a bandwidth-optimal backward pass.

The ResNet stem's 3x3/s2 maxpool (reference resnet_backbone.py stem,
torchvision geometry) is the only pooling op in DETR. Its default
gradient lowers to XLA ``select-and-scatter``, which the train-step
roofline measured at 110-293 GB/s — one of the two remaining gaps to
the step's bandwidth ceiling (docs/performance.md, train roofline).

This module keeps the fast XLA ``reduce_window`` forward and swaps the
backward for a pure gather/select formulation via ``jax.custom_vjp``:

  * recompute the 9 window-offset views of the (-inf padded) input as
    strided slices, take the *first* max over them (``jnp.argmax``
    first-occurrence semantics — the same winner XLA's
    select-and-scatter picks with its ``ge`` select in row-major window
    order);
  * each offset's gradient contribution is ``where(argmax == k, g, 0)``
    placed back on the input lattice with one ``lax.pad`` (interior
    dilation 1 for stride 2, negative edge padding trims the
    out-of-bounds corner) — no scatter anywhere.

Everything is elementwise selects, strided slices and pads, which XLA
fuses into one bandwidth-bound kernel: ~2 reads + 1 write of the stem
activation instead of select-and-scatter's serialized window walk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

_NEG = -jnp.inf


def _max_pool_fwd_raw(x: Array) -> Array:
    """3x3/s2, pad 1 (torch MaxPool2d(3, 2, 1)) on NHWC via reduce_window."""
    return lax.reduce_window(
        x, _NEG, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3_s2(x: Array) -> Array:
    """3x3 stride-2 pad-1 max pool, NHWC, with a gather-based VJP.

    Forward is bit-identical to
    ``nn.max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))``; backward
    produces the same subgradient as XLA select-and-scatter (first
    maximum in row-major window order receives the full gradient; exact
    up to fp32 summation order when one pixel wins two overlapping
    windows) but compiles to fused selects/pads instead of a scatter.
    """
    return _max_pool_fwd_raw(x)


def _fwd(x: Array):
    return _max_pool_fwd_raw(x), x


def _offset_views(xpad: Array, oh: int, ow: int):
    """The 9 (B, OH, OW, C) strided views: view[k][b, i, j, c] =
    xpad[b, 2i + di, 2j + dj, c] for k = 3*di + dj (row-major)."""
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(
                lax.slice(
                    xpad,
                    (0, di, dj, 0),
                    (xpad.shape[0], di + 2 * oh - 1, dj + 2 * ow - 1,
                     xpad.shape[3]),
                    (1, 2, 2, 1),
                )
            )
    return views


def _bwd(x: Array, g: Array):
    b, h, w, c = x.shape
    oh, ow = g.shape[1], g.shape[2]
    xpad = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=_NEG
    )
    views = _offset_views(xpad, oh, ow)
    stacked = jnp.stack(views)  # (9, B, OH, OW, C)
    amax = jnp.argmax(stacked, axis=0).astype(jnp.int32)  # first max wins

    dx = jnp.zeros_like(x)
    k = 0
    for di in range(3):
        for dj in range(3):
            gk = jnp.where(amax == k, g, jnp.zeros_like(g))
            # Place gk[oi, oj] at input position (2*oi + di - 1,
            # 2*oj + dj - 1): interior-dilate by 1 (stride 2) and shift
            # by di-1 / dj-1; negative low padding trims the oi = 0 row
            # that falls at input index -1.
            lo_h, lo_w = di - 1, dj - 1
            hi_h = h - (2 * oh - 1) - lo_h
            hi_w = w - (2 * ow - 1) - lo_w
            dx = dx + lax.pad(
                gk, jnp.zeros((), gk.dtype),
                ((0, 0, 0), (lo_h, hi_h, 1), (lo_w, hi_w, 1), (0, 0, 0)),
            )
            k += 1
    return (dx,)


max_pool_3x3_s2.defvjp(_fwd, _bwd)
