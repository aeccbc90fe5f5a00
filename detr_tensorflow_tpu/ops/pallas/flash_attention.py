"""Fused multi-head attention kernel (Pallas, TPU).

DETR's attention works on short sequences — the flattened stride-32
feature map (252 tokens at the default train size, ~1050 at 1333x800
eval) and 100 decoder queries (SURVEY.md §5). At these lengths the whole
K/V block for a head fits comfortably in VMEM, so the right TPU kernel
is a *single-pass* fused attention: for each (batch*head, q-block)
program, QK^T, the fp32 softmax, and the probability-weighted V
reduction all happen in VMEM and only the (Lq, Dh) output is written
back — the (Lq, Lk) attention matrix never exists in HBM. (A streaming
online-softmax à la FlashAttention is unnecessary until Lk is far larger
than VMEM; the scores block here tops out at ~0.6 MB.)

The reference materializes attention through separate matmul/softmax TF
ops (detr_tf/networks/transformer.py:317-343).

Numerics: scores accumulate in fp32 on the MXU
(``preferred_element_type``), softmax is computed in fp32 with the
usual max-subtraction, probabilities are cast back to the value dtype
for the second MXU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, lk_real: int):
    """One (batch*head, q-block) program: fused scores/softmax/values.

    q_ref: (1, TQ, Dh); k_ref/v_ref: (1, LK_pad, Dh); o_ref: (1, TQ, Dh).
    ``lk_real`` is the unpadded key length (static) — padded key columns
    are masked to -inf before the softmax.
    """
    q = q_ref[0]  # (TQ, Dh)
    k = k_ref[0]  # (LK_pad, Dh)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, LK_pad)

    lk_pad = scores.shape[-1]
    if lk_real < lk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < lk_real, scores, _NEG_INF)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    probs = exp / jnp.sum(exp, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_block: int = 128,
    interpret: bool = None,  # type: ignore[assignment]
) -> jnp.ndarray:
    """Fused attention over batch-first (B, L, H, Dh) tensors.

    Expects Q already scaled by ``head_dim ** -0.5`` (as the model does
    before calling). Returns (B, Lq, H, Dh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, lq, h, dh = q.shape
    lk = k.shape[1]

    # Fold heads into the grid's leading axis: (BH, L, Dh).
    def fold(x, l):
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, x.shape[-1])

    qf, kf, vf = fold(q, lq), fold(k, lk), fold(v, lk)

    lq_pad = _round_up(lq, q_block)
    lk_pad = _round_up(lk, 128)
    if lq_pad != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, 0)))

    grid = (b * h, lq_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, lk_real=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_block, dh), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lk_pad, dh), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lk_pad, dh), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * lq_pad * lk_pad * dh,
            bytes_accessed=(
                b * h * (lq_pad + 2 * lk_pad + lq_pad) * dh * q.dtype.itemsize
            ),
            transcendentals=b * h * lq_pad * lk_pad,
        ),
    )(qf, kf, vf)

    out = out[:, :lq].reshape(b, h, lq, dh).transpose(0, 2, 1, 3)
    return out


def reference_mha(q, k, v):
    """XLA reference for tests: identical math, materialized weights."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
