"""Fused bottleneck tail: 1x1-conv (matmul) + frozen-BN + residual + relu.

Profiling the DETR-R50 forward on v5e (docs/performance.md) shows the
largest single cost after the convolutions is the chain of elementwise
``add_maximum`` fusions — the residual joins — each a full HBM round
trip over stage-1/2-sized activations, already running at the bandwidth
roofline. A 1x1 convolution is exactly a matmul over flattened pixels,
so the whole bottleneck tail

    out = relu(x @ w * bn_scale + bn_shift + identity)

fits in one Pallas kernel: the conv output never exists in HBM, saving
one full write+read of the (N, C_out) activation per bottleneck block.

Inference-path kernel (no custom VJP yet): enable with
``ResNetBackbone(fuse_residual=True)`` / ``DETR(fuse_residual=True)``.

Measured verdict on v5e (batch 32, 800x1344, bf16): 210 img/s fused vs
315 img/s with the XLA path — XLA's own conv-epilogue fusion plus its
conv kernels beat this hand-written matmul formulation, so the flag
defaults **off**. The kernel stays as a correct, tested building block
(exact parity vs the XLA path in tests/test_pallas_attention.py) and a
starting point for a future blocked variant that keeps W resident
across N-tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, shift_ref, id_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc * scale_ref[...] + shift_ref[...]
    acc = acc + id_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.maximum(acc, 0.0).astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tn", "tc", "interpret"))
def matmul_bn_residual_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    identity: jnp.ndarray,
    tn: int = 512,
    tc: int = 512,
    interpret: bool = None,  # type: ignore[assignment]
) -> jnp.ndarray:
    """relu(x @ w * scale + shift + identity) without materializing x@w.

    x: (N, Cin); w: (Cin, Cout); scale/shift: (Cout,); identity: (N, Cout).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, cin = x.shape
    cout = w.shape[1]
    tn = min(tn, _round_up(n, 8))
    tc = min(tc, cout)
    n_pad = _round_up(n, tn)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        identity = jnp.pad(identity, ((0, n_pad - n), (0, 0)))
    assert cout % tc == 0, (cout, tc)

    scale2 = scale.reshape(1, cout).astype(jnp.float32)
    shift2 = shift.reshape(1, cout).astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // tn, cout // tc),
        in_specs=[
            pl.BlockSpec((tn, cin), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tn, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, cout), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * cin * cout,
            bytes_accessed=(n_pad * cin + cin * cout + 2 * n_pad * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, scale2, shift2, identity)
    return out[:n]


def conv1x1_bn_residual_relu(feats, kernel, scale, shift, identity):
    """NHWC wrapper: feats (B,H,W,Cin), kernel (1,1,Cin,Cout) or (Cin,Cout)."""
    b, h, w_, cin = feats.shape
    k2 = kernel.reshape(cin, -1)
    cout = k2.shape[1]
    out = matmul_bn_residual_relu(
        feats.reshape(b * h * w_, cin), k2, scale, shift,
        identity.reshape(b * h * w_, cout),
    )
    return out.reshape(b, h, w_, cout)
