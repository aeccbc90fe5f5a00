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
    HBM on the backward either), so the kernel is trainable;
  * attention-weight dropout — in-kernel counter-based PRNG
    (``pltpu.prng_seed`` on (seed, program ids)); the backward kernel
    REPLAYS the identical mask by re-seeding with the same salts, so
    the full reference training recipe (dropout 0.1,
    reference transformer.py:8) runs through the flash path with no
    mask tensor in HBM.

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


def _dropout_mask(seed, salt_a, salt_b, shape, rate: float):
    """Deterministic keep-mask scaled by 1/keep: seeded from
    (seed, salt_a, salt_b) so the backward pass REPLAYS the exact
    forward mask by re-seeding with the same salts (counter-based PRNG
    replay — no mask ever stored in HBM). Mosaic accepts at most two
    seed values, so the two salts (grid row < BH, q-block index, both
    far below 2^16) pack into one."""
    pltpu.prng_seed(seed, salt_a * 65536 + salt_b)
    bits = pltpu.prng_random_bits(shape)  # int32 block
    # Drop iff the uniform-int draw lands in the lowest `rate` fraction
    # of the int32 range.
    thresh = jnp.int32(int(rate * (2**32)) - (2**31))
    keep = bits >= thresh
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                *, dropout_rate: float):
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
    if dropout_rate > 0.0:
        probs = probs * _dropout_mask(
            seed_ref[0], pl.program_id(0), pl.program_id(1),
            probs.shape, dropout_rate,
        )

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
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, q_chunk: int, dropout_rate: float,
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
        if dropout_rate > 0.0:
            # Replay the forward program (i, j=c)'s mask exactly: same
            # seed, same salts, same draw shape.
            m = _dropout_mask(
                seed_ref[0], pl.program_id(0), c, p.shape, dropout_rate,
            )
            pd = p * m  # dropped+scaled probabilities
        else:
            m = None
            pd = p
        pd_low = pd.astype(v.dtype)

        # o = pd @ v (recomputed for delta), dp = do @ v^T
        o = jax.lax.dot_general(
            pd_low, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if m is not None:
            dp = dp * m  # chain through the dropout: d p = M/kp * d pd
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
            pd_low, do.astype(v.dtype),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _mha_core(qf, kf, vf, bias, seed, h: int, q_block: int,
              interpret: bool, dropout_rate: float):
    return _mha_fwd_call(qf, kf, vf, bias, seed, h, q_block, interpret,
                         dropout_rate)


def _mha_fwd_call(qf, kf, vf, bias, seed, h, q_block, interpret,
                  dropout_rate):
    bh, lq, dh = qf.shape
    lk = kf.shape[1]
    grid = (bh, lq // q_block)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
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
    )(seed, qf, kf, vf, bias)


def _mha_fwd_rule(qf, kf, vf, bias, seed, h, q_block, interpret,
                  dropout_rate):
    out = _mha_fwd_call(qf, kf, vf, bias, seed, h, q_block, interpret,
                        dropout_rate)
    return out, (qf, kf, vf, bias, seed)


def _mha_bwd_rule(h, q_block, interpret, dropout_rate, residuals, g):
    qf, kf, vf, bias, seed = residuals
    bh, lq, dh = qf.shape
    lk = kf.shape[1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, q_chunk=q_block,
                          dropout_rate=dropout_rate),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
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
    )(seed, qf, kf, vf, bias, g)
    # bias is built from a boolean mask outside the VJP boundary — its
    # upstream tangent is float0, so a zero cotangent is exact here;
    # same for the integer dropout seed.
    import numpy as _np

    return dq, dk, dv, jnp.zeros_like(bias), _np.zeros(
        seed.shape, jax.dtypes.float0
    )


_mha_core.defvjp(_mha_fwd_rule, _mha_bwd_rule)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _auto_q_block(lq: int, lk_pad: int) -> int:
    """Largest backward-safe query block: bigger blocks amortize the
    per-program K/V loads (measured r5, isolated encoder layer at the
    1050-key bench shape: 3.87 ms at q_block=128 -> 3.27 at 384 ->
    3.15 at 1152), but the backward kernel holds ~4 fp32 (qb, lk)
    temporaries in VMEM, so the auto choice caps qb at ~8 MB of those
    (384 at lk_pad=1152 — the 15% win without making the kernel
    un-differentiable at eval shapes). Callers that will never
    differentiate can pass a larger explicit q_block."""
    qb = _round_up(lq, 128)
    budget = 8 * 1024 * 1024
    while qb > 128 and qb * lk_pad * 16 > budget:
        qb = max(128, _round_up(qb // 2, 128))
    return qb


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray = None,
    q_block: int = None,  # type: ignore[assignment]
    interpret: bool = None,  # type: ignore[assignment]
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray = None,
) -> jnp.ndarray:
    """Fused attention over batch-first (B, L, H, Dh) tensors.

    Expects Q already scaled by ``head_dim ** -0.5`` (as the model does
    before calling). ``key_padding_mask`` is an optional (B, Lk) bool
    array, True = padded key (ignored). Differentiable (custom VJP;
    flash-style backward). Returns (B, Lq, H, Dh). ``q_block`` defaults
    to the measured-fastest backward-safe block (``_auto_q_block``).

    ``dropout_rate`` > 0 applies attention-weight dropout INSIDE the
    kernel (keep-prob scaling, like ``nn.Dropout`` on the probabilities)
    using the TPU's counter-based PRNG seeded from ``dropout_seed`` (a
    scalar/1-element int32 array) and the program ids — the backward
    kernel replays the identical mask by re-seeding, so no mask tensor
    ever exists in HBM. This is what lets the flash path train the
    reference recipe (dropout 0.1, reference transformer.py:8).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and dropout_rate > 0.0:
        # The default HLO interpreter has no rule for the TPU PRNG
        # primitives; the Mosaic TPU interpreter emulates them on CPU.
        interpret = pltpu.InterpretParams()
    b, lq, h, dh = q.shape
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 needs dropout_seed")
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    lk = k.shape[1]
    lk_pad = _round_up(lk, 128)
    if q_block is None:
        q_block = _auto_q_block(lq, lk_pad)

    # Fold heads into the grid's leading axis: (BH, L, Dh).
    def fold(x, l):
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, x.shape[-1])

    qf, kf, vf = fold(q, lq), fold(k, lk), fold(v, lk)

    lq_pad = _round_up(lq, q_block)
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

    out = _mha_core(qf, kf, vf, bias, seed, h, q_block, interpret,
                    float(dropout_rate))
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
