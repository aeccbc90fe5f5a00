"""Fused multi-head attention kernel (Pallas, TPU) — production path.

DETR's attention works on short sequences — the flattened stride-32
feature map (252 tokens at the default train size, ~1050 at 1333x800
eval) and 100 decoder queries (SURVEY.md §5). At these lengths the whole
K/V block for a head fits comfortably in VMEM, so the right TPU kernel
is a *single-pass* fused attention: for each (batch*head, q-block)
program, QK^T, the fp32 softmax, and the probability-weighted V
reduction all happen in VMEM and only the (Lq, Dh) output is written
back — the (Lq, Lk) attention matrix never exists in HBM. (Profiling the
XLA path at 800x1344 batch 32 shows each encoder layer moving ~2.3 GB of
f32 attention logits through HBM; this kernel removes that traffic.
A streaming online-softmax à la FlashAttention is unnecessary until Lk
far exceeds VMEM; the scores block here tops out at ~0.6 MB.)

Production capabilities (VERDICT round 1, task 6):
  * key-padding masks — folded into an additive fp32 bias row per batch
    (True = padded -> -1e30 before the softmax), so the bucketed-eval
    path runs through the kernel;
  * gradients — a custom VJP whose backward kernel recomputes the
    softmax per q-chunk in VMEM (flash-style; no attention matrix in
    HBM on the backward either), so the kernel is trainable. Attention-
    weight *dropout* stays on the XLA path (models/transformer.py
    dispatches there when dropout is active) — fusing dropout would
    require replaying in-kernel PRNG in the backward for exact parity.

The reference materializes attention through separate matmul/softmax TF
ops (detr_tf/networks/transformer.py:317-343) and its key-padding-mask
branch is commented out (transformer.py:322-337).

Numerics: scores accumulate in fp32 on the MXU
(``preferred_element_type``), softmax is fp32 with max-subtraction,
probabilities are cast back to the value dtype for the second MXU pass —
bit-identical structure to the XLA reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Forward kernel: grid (B*H, Lq/TQ); whole K/V per program.
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """q_ref: (1, TQ, Dh); k/v_ref: (1, LKp, Dh); bias_ref: (1, LKp);
    o_ref: (1, TQ, Dh). Bias already carries padding/masking (-1e30)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, LKp)
    scores = scores + bias_ref[0]  # (1, LKp) broadcasts over rows

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    probs = exp / jnp.sum(exp, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernel: grid (B*H,); q chunked by fori_loop, K/V resident.
# dK/dV accumulate in fp32 VMEM scratch; softmax recomputed per chunk
# (flash-style — nothing quadratic ever touches HBM).
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, q_chunk: int,
):
    k = k_ref[0]  # (LKp, Dh)
    v = v_ref[0]
    bias = bias_ref[0]  # (1, LKp), broadcasts over score rows

    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)

    lq = q_ref.shape[1]
    n_chunks = lq // q_chunk

    def body(c, _):
        sl = pl.ds(c * q_chunk, q_chunk)
        q = q_ref[0, sl]  # (TQ, Dh)
        do = do_ref[0, sl].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (TQ, LKp) f32
        p_low = p.astype(v.dtype)

        # o = p @ v (recomputed for delta), dp = do @ v^T
        o = jax.lax.dot_general(
            p_low, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (TQ, 1)
        ds = p * (dp - delta)  # (TQ, LKp) f32
        ds_low = ds.astype(q.dtype)

        dq_ref[0, sl] = jax.lax.dot_general(
            ds_low, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds_low, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_acc[:] += jax.lax.dot_general(
            p_low, do.astype(v.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom-VJP core over padded, head-folded (BH, L, Dh) tensors.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mha_core(qf, kf, vf, bias, h: int, q_block: int, interpret: bool):
    return _mha_fwd_call(qf, kf, vf, bias, h, q_block, interpret)


def _mha_fwd_call(qf, kf, vf, bias, h, q_block, interpret):
    bh, lq, dh = qf.shape
    lk = kf.shape[1]
    grid = (bh, lq // q_block)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, dh), qf.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * lq * lk * dh,
            bytes_accessed=bh * (2 * lq + 2 * lk) * dh * qf.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(qf, kf, vf, bias)


def _mha_fwd_rule(qf, kf, vf, bias, h, q_block, interpret):
    out = _mha_fwd_call(qf, kf, vf, bias, h, q_block, interpret)
    return out, (qf, kf, vf, bias)


def _mha_bwd_rule(h, q_block, interpret, residuals, g):
    qf, kf, vf, bias = residuals
    bh, lq, dh = qf.shape
    lk = kf.shape[1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, q_chunk=q_block),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, lq, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda i: (i // h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lq, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, dh), qf.dtype),
            jax.ShapeDtypeStruct((bh, lk, dh), kf.dtype),
            jax.ShapeDtypeStruct((bh, lk, dh), vf.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((lk, dh), jnp.float32),
            pltpu.VMEM((lk, dh), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * lq * lk * dh,
            bytes_accessed=bh * (4 * lq + 4 * lk) * dh * qf.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(qf, kf, vf, bias, g)
    # bias is built from a boolean mask outside the VJP boundary — its
    # upstream tangent is float0, so a zero cotangent is exact here.
    return dq, dk, dv, jnp.zeros_like(bias)


_mha_core.defvjp(_mha_fwd_rule, _mha_bwd_rule)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray = None,
    q_block: int = 128,
    interpret: bool = None,  # type: ignore[assignment]
) -> jnp.ndarray:
    """Fused attention over batch-first (B, L, H, Dh) tensors.

    Expects Q already scaled by ``head_dim ** -0.5`` (as the model does
    before calling). ``key_padding_mask`` is an optional (B, Lk) bool
    array, True = padded key (ignored). Differentiable (custom VJP;
    flash-style backward). Returns (B, Lq, H, Dh).
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

    # Additive fp32 bias row per batch: masked/padded keys -> -1e30.
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, lk), jnp.float32)
    if lk_pad != lk:
        bias = jnp.pad(bias, ((0, 0), (0, lk_pad - lk)),
                       constant_values=_NEG_INF)
    bias = bias[:, None, :]  # (B, 1, LKp): TPU-tileable block shape

    out = _mha_core(qf, kf, vf, bias, h, q_block, bool(interpret))
    out = out[:, :lq].reshape(b, h, lq, dh).transpose(0, 2, 1, 3)
    return out


def reference_mha(q, k, v, key_padding_mask=None):
    """XLA reference for tests: identical math, materialized weights."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(
            key_padding_mask[:, None, None, :], _NEG_INF, logits
        )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
