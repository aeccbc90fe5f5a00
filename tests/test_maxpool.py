"""Gather-backward stem maxpool vs flax nn.max_pool (select-and-scatter).

Forward must be bit-identical; the backward must produce the same
subgradient — including on ties, where both pick the first maximum in
row-major window order — so swapping the op into the ResNet stem
changes nothing numerically (docs/performance.md, train roofline).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from detr_tensorflow_tpu.ops.maxpool import max_pool_3x3_s2


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("h,w", [(8, 12), (9, 13), (7, 10), (16, 16)])
def test_forward_matches_flax(h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2(x)), np.asarray(_ref(x))
    )


@pytest.mark.parametrize("h,w", [(8, 12), (9, 13), (7, 10)])
def test_grad_matches_flax_exact_placement(h, w):
    # Integer cotangents: every accumulated sum is exact in fp32, so any
    # placement or tie-break divergence from select-and-scatter shows up
    # as an exact mismatch (summation order cannot hide it).
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, h, w, 4)).astype(np.float32))
    ct = jnp.asarray(
        rng.integers(-8, 9, size=_ref(x).shape).astype(np.float32)
    )
    g_new = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a) * ct))(x)
    g_ref = jax.grad(lambda a: jnp.sum(_ref(a) * ct))(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


@pytest.mark.parametrize("h,w", [(8, 12), (9, 13)])
def test_grad_matches_flax_float_cotangents(h, w):
    # Float cotangents: identical subgradient up to fp32 summation order
    # (an input pixel that wins two overlapping windows accumulates its
    # two cotangents in a different order than XLA's scatter-add).
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, h, w, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=_ref(x).shape).astype(np.float32))
    g_new = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a) * ct))(x)
    g_ref = jax.grad(lambda a: jnp.sum(_ref(a) * ct))(x)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_grad_matches_flax_on_ties():
    # Integer-valued, relu-like (many zeros): heavy ties inside windows.
    # Integer cotangents keep every sum exact, so tie-break parity with
    # select-and-scatter (first max in row-major window order) is tested
    # bit-exactly.
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        np.maximum(rng.integers(-2, 3, size=(3, 12, 14, 6)), 0).astype(
            np.float32
        )
    )
    ct = jnp.asarray(
        rng.integers(-8, 9, size=_ref(x).shape).astype(np.float32)
    )
    g_new = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a) * ct))(x)
    g_ref = jax.grad(lambda a: jnp.sum(_ref(a) * ct))(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_jit_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 10, 11, 8))).astype(jnp.bfloat16)
    y = jax.jit(max_pool_3x3_s2)(x)
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(_ref(x), np.float32)
    )
    g = jax.jit(jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a).astype(jnp.float32))))(x)
    gr = jax.grad(lambda a: jnp.sum(_ref(a).astype(jnp.float32)))(x)
    np.testing.assert_array_equal(
        np.asarray(g, np.float32), np.asarray(gr, np.float32)
    )


@pytest.mark.parametrize("shape", [(2, 64, 96, 8), (1, 188, 336, 16),
                                   (1, 100, 128, 8)])
@pytest.mark.parametrize("mode", ["reduce", "matmul"])
def test_pallas_kernel_parity(shape, mode):
    """The parked Pallas maxpool (ops/pallas/maxpool.py, default off —
    measured slower than XLA, kept as the documented negative result):
    exact forward parity on nonnegative inputs, both horizontal-window
    lowerings (interpret mode on CPU; hardware parity verified on-chip
    by scripts/maxpool_infer_probe.py)."""
    from detr_tensorflow_tpu.ops.pallas.maxpool import (
        max_pool_3x3_s2_pallas, supported,
    )

    assert supported(shape)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.normal(size=shape)).astype(np.float32))
    ref = max_pool_3x3_s2(x)
    got = max_pool_3x3_s2_pallas(x, mode=mode)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_kernel_gating():
    """nonneg=False (the default everywhere) never routes to the
    kernel; unsupported shapes are rejected by `supported`."""
    from detr_tensorflow_tpu.ops.pallas.maxpool import supported

    assert not supported((1, 37, 64, 8))   # odd height
    assert not supported((1, 64, 97, 8))   # odd width
