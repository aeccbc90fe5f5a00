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
  * the gradient image is assembled by **stride parity**: an input
    position (i, j) with padded coords (ip, jp) = (i+1, j+1) receives
    contributions only from window offsets with di ≡ ip (mod 2) and
    dj ≡ jp (mod 2), so each of the 4 parity subgrids is a sum of 1, 2
    or 4 *edge-padded shifts* of ``where(argmax == k, g, 0)`` on the
    small (OH, OW) lattice, and one stack+reshape interleave (the
    depth-to-space trick) produces the full-resolution gradient. No
    scatter and — critically — **no interior-dilated pads**: a first
    version placed each offset with ``lax.pad(interior=1)`` on the
    (B, H, W, C) stem activation and XLA lowered those nine pads at
    25-40 GB/s, ~21 ms/step — silently 1.7x-ing the whole train step
    (found via the stall-proof device-time metric in bench.py).

Everything is elementwise selects, strided slices, small edge pads and
one relayout, which XLA fuses into bandwidth-bound kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

_NEG = -jnp.inf


def _max_pool_fwd_raw(x: Array, nonneg: bool = False) -> Array:
    """3x3/s2, pad 1 (torch MaxPool2d(3, 2, 1)) on NHWC.

    Default: XLA ``reduce_window``. (A max tree over the backward's 9
    ``_offset_views`` was measured as an alternative forward in round
    4: bit-identical, but XLA's separable reduce_window lowering is
    faster on chip — 0.12 vs 0.38 ms at the b8 stem shape.)

    ``nonneg=True`` (the stem's post-relu call site) additionally
    enables the Pallas row-streaming kernel on TPU for shapes it
    supports — XLA's reduce_window fusion measured 332 GB/s at the
    b32 inference stem shape where the kernel streams at the bandwidth
    roofline (ops/pallas/maxpool.py; zero-padding == -inf padding only
    for nonnegative inputs, hence the flag).
    """
    if nonneg and jax.default_backend() == "tpu":
        from .pallas.maxpool import max_pool_3x3_s2_pallas, supported

        if supported(x.shape):
            return max_pool_3x3_s2_pallas(x)
    return lax.reduce_window(
        x, _NEG, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3_s2(x: Array, nonneg: bool = False) -> Array:
    """3x3 stride-2 pad-1 max pool, NHWC, with a gather-based VJP.

    Forward is bit-identical to
    ``nn.max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))``; backward
    produces the same subgradient as XLA select-and-scatter (first
    maximum in row-major window order receives the full gradient; exact
    up to fp32 summation order when one pixel wins two overlapping
    windows) but compiles to fused selects/pads instead of a scatter.
    ``nonneg=True`` asserts the input is >= 0 (the stem's post-relu
    activations) and unlocks the Pallas forward on TPU.
    """
    return _max_pool_fwd_raw(x, nonneg)


def _fwd(x: Array, nonneg: bool = False):
    return _max_pool_fwd_raw(x, nonneg), x


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


def _bwd(nonneg: bool, x: Array, g: Array):
    del nonneg  # the gather backward is valid for any input
    b, h, w, c = x.shape
    oh, ow = g.shape[1], g.shape[2]
    xpad = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=_NEG
    )
    views = _offset_views(xpad, oh, ow)
    stacked = jnp.stack(views)  # (9, B, OH, OW, C)
    amax = jnp.argmax(stacked, axis=0).astype(jnp.int32)  # first max wins

    # Parity-subgrid assembly. Padded coords: ip = 2*wi + di, so window
    # offset (di, dj) contributes to parity (ip%2, jp%2) = (di%2, dj%2)
    # at subgrid index (wi + [di == 2], wj + [dj == 2]). Each subgrid
    # spans A x Aw (A = ceil((h+2)/2)) so the interleave covers the
    # whole padded lattice.
    A, aw = (h + 3) // 2, (w + 3) // 2

    def placed(k: int, rshift: int, cshift: int) -> Array:
        """This offset's gradient on its parity subgrid: shift by one
        row/col for di/dj == 2, zero-fill to (A, Aw). Edge pads only."""
        gk = jnp.where(amax == k, g, jnp.zeros_like(g))
        return lax.pad(
            gk, jnp.zeros((), gk.dtype),
            ((0, 0, 0), (rshift, A - oh - rshift, 0),
             (cshift, aw - ow - cshift, 0), (0, 0, 0)),
        )

    # k = 3*di + dj (row-major, matching _offset_views order).
    ee = placed(0, 0, 0) + placed(2, 0, 1) + placed(6, 1, 0) + placed(8, 1, 1)
    eo = placed(1, 0, 0) + placed(7, 1, 0)
    oe = placed(3, 0, 0) + placed(5, 0, 1)
    oo = placed(4, 0, 0)

    # Interleave columns within each row parity, then rows (the
    # depth-to-space trick): dxpad[2a + p, 2q + r] = grid[p][r][a, q].
    cols_even = jnp.stack([ee, eo], axis=3).reshape(b, A, 2 * aw, c)
    cols_odd = jnp.stack([oe, oo], axis=3).reshape(b, A, 2 * aw, c)
    dxpad = jnp.stack([cols_even, cols_odd], axis=2).reshape(
        b, 2 * A, 2 * aw, c
    )
    # Input coord i sits at padded coord i+1; border rows/cols are -inf
    # pad positions that never win a max, and the interleave's trailing
    # zero-fill rows fall outside the slice.
    return (dxpad[:, 1 : h + 1, 1 : w + 1, :],)


max_pool_3x3_s2.defvjp(_fwd, _bwd)
