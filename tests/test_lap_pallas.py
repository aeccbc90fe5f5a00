"""Fused Pallas LAP kernel vs the XLA solver and scipy.

The kernel (ops/pallas/lap.py) must produce scipy-optimal total cost,
and — since both solvers are exact — assignments identical to
ops/matcher.py's while-loop JV solver whenever the optimum is unique
(always, for the continuous random costs used below; on tied problems
the two may legitimately pick different equal-cost optima).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from detr_tensorflow_tpu.ops.matcher import (
    cost_matrix,
    hungarian_match,
    hungarian_match_batch,
    solve_lap_masked,
    solve_lap_masked_batch,
)
from detr_tensorflow_tpu.ops.pallas.lap import solve_lap_masked_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _assert_optimal(cost, mask, col_of_row):
    for i in range(cost.shape[0]):
        n = int(mask[i].sum())
        if n == 0:
            assert (col_of_row[i] == -1).all()
            continue
        ri, ci = linear_sum_assignment(cost[i, :n])
        want = cost[i, :n][ri, ci].sum()
        cols = col_of_row[i, :n]
        assert len(set(cols.tolist())) == n  # distinct columns
        got = cost[i][np.arange(n), cols].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert (col_of_row[i, n:] == -1).all()


def test_lap_kernel_matches_scipy_and_xla(rng):
    P, R, C = 9, 24, 31
    cost = rng.normal(size=(P, R, C)).astype(np.float32)
    nreal = rng.integers(0, R + 1, size=P)
    nreal[0], nreal[1] = 0, R  # empty + full problems
    mask = np.arange(R)[None, :] < nreal[:, None]

    out = np.asarray(solve_lap_masked_pallas(jnp.asarray(cost), jnp.asarray(mask)))
    ref = np.stack(
        [
            np.asarray(solve_lap_masked(jnp.asarray(cost[i]), jnp.asarray(mask[i])))
            for i in range(P)
        ]
    )
    np.testing.assert_array_equal(out, ref)  # bit-identical assignments
    _assert_optimal(cost, mask, out)


def test_lap_kernel_ties(rng):
    # Many duplicate costs: optimum must still match scipy's value.
    P, R, C = 4, 12, 12
    cost = rng.integers(0, 3, size=(P, R, C)).astype(np.float32)
    mask = np.ones((P, R), bool)
    out = np.asarray(solve_lap_masked_pallas(jnp.asarray(cost), jnp.asarray(mask)))
    _assert_optimal(cost, mask, out)


def test_solve_lap_masked_batch_impls_agree(rng):
    P, R, C = 5, 16, 20
    cost = jnp.asarray(rng.normal(size=(P, R, C)).astype(np.float32))
    nreal = rng.integers(1, R, size=P)
    mask = jnp.asarray(np.arange(R)[None, :] < nreal[:, None])
    a = solve_lap_masked_batch(cost, mask, impl="xla")
    b = solve_lap_masked_batch(cost, mask, impl="pallas")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hungarian_match_batch_nd_matches_single(rng):
    # (layers, batch) leading dims == per-problem hungarian_match.
    L, B, Q, T = 3, 2, 20, 8
    p_bbox = jnp.asarray(rng.uniform(0.1, 0.9, size=(L, B, Q, 4)).astype(np.float32))
    p_logits = jnp.asarray(rng.normal(size=(L, B, Q, 5)).astype(np.float32))
    t_bbox = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, T, 4)).astype(np.float32))
    t_class = jnp.asarray(rng.integers(0, 4, size=(B, T)).astype(np.int32))
    nreal = rng.integers(0, T + 1, size=B)
    t_mask = jnp.asarray(np.arange(T)[None, :] < nreal[:, None])

    bc = lambda x: jnp.broadcast_to(x, (L,) + x.shape)
    for impl in ("xla", "pallas"):
        out = hungarian_match_batch(
            p_bbox, p_logits, bc(t_bbox), bc(t_class), bc(t_mask), impl=impl
        )
        for l in range(L):
            for b in range(B):
                single = hungarian_match(
                    p_bbox[l, b], p_logits[l, b], t_bbox[b], t_class[b], t_mask[b]
                )
                for key in ("target_of_pred", "pred_of_target", "pred_matched"):
                    np.testing.assert_array_equal(
                        np.asarray(out[key][l, b]), np.asarray(single[key]), err_msg=f"{impl}:{key}"
                    )


def test_lap_impl_identical_loss(rng):
    """detr_loss is bit-identical under lap_impl='xla' vs 'pallas'."""
    from detr_tensorflow_tpu.ops.losses import detr_loss

    B, Q, T, C, A = 2, 16, 6, 7, 2
    outputs = {
        "pred_logits": jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0.1, 0.9, size=(B, Q, 4)).astype(np.float32)),
        "aux_logits": jnp.asarray(rng.normal(size=(A, B, Q, C)).astype(np.float32)),
        "aux_boxes": jnp.asarray(rng.uniform(0.1, 0.9, size=(A, B, Q, 4)).astype(np.float32)),
    }
    t_bbox = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, T, 4)).astype(np.float32))
    t_class = jnp.asarray(rng.integers(0, C - 1, size=(B, T)).astype(np.int32))
    t_mask = jnp.asarray(np.arange(T)[None, :] < np.array([3, T])[:, None])

    tot_x, log_x = detr_loss(outputs, t_bbox, t_class, t_mask, C - 1, lap_impl="xla")
    tot_p, log_p = detr_loss(outputs, t_bbox, t_class, t_mask, C - 1, lap_impl="pallas")
    np.testing.assert_array_equal(np.asarray(tot_x), np.asarray(tot_p))
    for k in log_x:
        np.testing.assert_array_equal(np.asarray(log_x[k]), np.asarray(log_p[k]), err_msg=k)


def test_lap_kernel_under_jit_and_grad_path(rng):
    """The kernel is jittable and safe inside a grad trace (int output,
    stop_gradient on cost)."""
    Q, T = 12, 5
    p_bbox = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, Q, 4)).astype(np.float32))
    p_logits = jnp.asarray(rng.normal(size=(1, Q, 6)).astype(np.float32))
    t_bbox = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, T, 4)).astype(np.float32))
    t_class = jnp.asarray(rng.integers(0, 5, size=(1, T)).astype(np.int32))
    t_mask = jnp.ones((1, T), bool)

    def loss(pb):
        m = hungarian_match_batch(pb, p_logits, t_bbox, t_class, t_mask, impl="pallas")
        sel = jnp.take_along_axis(
            pb, jnp.clip(m["pred_of_target"], 0, Q - 1)[..., None], axis=1
        )
        return jnp.sum((sel - t_bbox) ** 2)

    g = jax.jit(jax.grad(loss))(p_bbox)
    assert np.isfinite(np.asarray(g)).all()
