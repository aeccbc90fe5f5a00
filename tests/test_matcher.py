"""On-device Hungarian solver vs scipy's linear_sum_assignment."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from detr_tensorflow_tpu.ops import matcher

_solve_lap = jax.jit(matcher.solve_lap)
_match = jax.jit(matcher.hungarian_match)


def _scipy_cost(cost):
    r, c = linear_sum_assignment(cost)
    return cost[r, c].sum()


def test_solve_lap_matches_scipy_small(rng):
    for n in [1, 2, 3, 5, 8]:
        for _ in range(5):
            cost = rng.normal(size=(n, n)).astype(np.float32)
            col = np.asarray(_solve_lap(jnp.asarray(cost)))
            assert sorted(col.tolist()) == list(range(n)), col
            ours = cost[np.arange(n), col].sum()
            np.testing.assert_allclose(ours, _scipy_cost(cost), rtol=1e-5, atol=1e-5)


def test_solve_lap_matches_scipy_100(rng):
    for _ in range(3):
        cost = rng.normal(size=(100, 100)).astype(np.float32) * 10.0
        col = np.asarray(_solve_lap(jnp.asarray(cost)))
        assert sorted(col.tolist()) == list(range(100))
        ours = cost[np.arange(100), col].sum()
        np.testing.assert_allclose(ours, _scipy_cost(cost), rtol=1e-4, atol=1e-3)


def test_solve_lap_with_ties():
    # Integer costs with many ties: optimal value must still match.
    rng = np.random.default_rng(7)
    cost = rng.integers(0, 4, size=(30, 30)).astype(np.float32)
    col = np.asarray(_solve_lap(jnp.asarray(cost)))
    ours = cost[np.arange(30), col].sum()
    np.testing.assert_allclose(ours, _scipy_cost(cost), atol=1e-5)


def test_solve_lap_vmap(rng):
    costs = rng.normal(size=(6, 40, 40)).astype(np.float32)
    cols = np.asarray(jax.vmap(matcher.solve_lap)(jnp.asarray(costs)))
    for b in range(6):
        ours = costs[b][np.arange(40), cols[b]].sum()
        np.testing.assert_allclose(ours, _scipy_cost(costs[b]), rtol=1e-5, atol=1e-4)


def _random_instance(rng, q=100, t_slots=100, n_targets=7, n_classes=92):
    p_bbox = rng.uniform(0.2, 0.8, size=(q, 4)).astype(np.float32)
    p_logits = rng.normal(size=(q, n_classes)).astype(np.float32)
    t_bbox = np.zeros((t_slots, 4), np.float32)
    t_bbox[:n_targets] = rng.uniform(0.2, 0.8, size=(n_targets, 4))
    t_class = np.zeros((t_slots,), np.int32)
    t_class[:n_targets] = rng.integers(1, n_classes - 1, size=(n_targets,))
    t_mask = np.zeros((t_slots,), bool)
    t_mask[:n_targets] = True
    return p_bbox, p_logits, t_bbox, t_class, t_mask, n_targets


def _reference_cost(p_bbox, p_logits, t_bbox, t_class, n_targets):
    """Replicates hungarian_matching.py:172-195 on the host with scipy."""
    from detr_tensorflow_tpu.ops import boxes

    tb = t_bbox[:n_targets]
    tc = t_class[:n_targets]
    prob = np.exp(p_logits - p_logits.max(-1, keepdims=True))
    prob = prob / prob.sum(-1, keepdims=True)
    c_class = -prob[:, tc]
    l1 = np.abs(p_bbox[:, None, :] - tb[None, :, :]).sum(-1)
    p_xy = np.clip(boxes.np_xcycwh_to_xyxy(p_bbox), 0, 1)
    t_xy = np.clip(boxes.np_xcycwh_to_xyxy(tb), 0, 1)
    g = np.asarray(boxes.giou(jnp.asarray(p_xy), jnp.asarray(t_xy)))
    return 5.0 * l1 + 1.0 * c_class + 2.0 * (-g)


def test_hungarian_match_equals_scipy_on_detr_cost(rng):
    for trial in range(3):
        p_bbox, p_logits, t_bbox, t_class, t_mask, n = _random_instance(
            rng, n_targets=int(rng.integers(1, 20))
        )
        out = jax.tree.map(
            np.asarray,
            _match(
                jnp.asarray(p_bbox),
                jnp.asarray(p_logits),
                jnp.asarray(t_bbox),
                jnp.asarray(t_class),
                jnp.asarray(t_mask),
            ),
        )
        cost = _reference_cost(p_bbox, p_logits, t_bbox, t_class, n)
        rows, cols = linear_sum_assignment(cost)  # rows: preds, cols: targets

        # Every real target matched exactly once; optimal cost equal.
        matched_preds = out["pred_of_target"][:n]
        assert (matched_preds >= 0).all()
        assert len(set(matched_preds.tolist())) == n
        ours_cost = cost[matched_preds, np.arange(n)].sum()
        np.testing.assert_allclose(ours_cost, cost[rows, cols].sum(), rtol=1e-4, atol=1e-4)

        # Consistency between the two index directions.
        for t in range(n):
            p = matched_preds[t]
            assert out["target_of_pred"][p] == t
            assert out["pred_matched"][p]
        assert out["pred_matched"].sum() == n
        # Padded slots unmatched.
        assert (out["pred_of_target"][n:] == -1).all()


def test_hungarian_match_full_targets(rng):
    # 100 targets in 100 slots: a perfect permutation must be produced.
    p_bbox, p_logits, t_bbox, t_class, t_mask, n = _random_instance(rng, n_targets=100)
    out = _match(
        jnp.asarray(p_bbox),
        jnp.asarray(p_logits),
        jnp.asarray(t_bbox),
        jnp.asarray(t_class),
        jnp.asarray(t_mask),
    )
    matched = np.asarray(out["pred_of_target"])
    assert sorted(matched.tolist()) == list(range(100))
    assert np.asarray(out["pred_matched"]).all()


def test_solve_lap_masked_prefix_rows(rng):
    """Rectangular masked solve == scipy on the selected submatrix."""
    solve = jax.jit(matcher.solve_lap_masked)
    for n_real in [1, 3, 7, 12]:
        cost = rng.normal(size=(20, 40)).astype(np.float32)
        mask = np.zeros((20,), bool)
        mask[:n_real] = True
        col = np.asarray(solve(jnp.asarray(cost), jnp.asarray(mask)))
        assert (col[n_real:] == -1).all()
        assigned = col[:n_real]
        assert (assigned >= 0).all()
        assert len(set(assigned.tolist())) == n_real  # distinct columns
        ours = cost[np.arange(n_real), assigned].sum()
        r, c = linear_sum_assignment(cost[:n_real])
        np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-5, atol=1e-5)


def test_solve_lap_masked_all_masked():
    cost = jnp.zeros((5, 8))
    col = np.asarray(matcher.solve_lap_masked(cost, jnp.zeros((5,), bool)))
    assert (col == -1).all()


def test_solve_lap_auction_worst_case_collisions(rng):
    """Adversarial inputs for the auction pre-pass: every row shares the
    same argmin column (max collisions), duplicate rows (eviction
    cycles with zero bid increments), and negative costs (the losers'
    dual update must keep feasibility) — optimum must still match
    scipy."""
    solve = jax.jit(matcher.solve_lap_masked)
    # all rows prefer column 0 strongly
    cost = rng.normal(size=(8, 12)).astype(np.float32)
    cost[:, 0] -= 100.0
    col = np.asarray(solve(jnp.asarray(cost), jnp.ones((8,), bool)))
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[np.arange(8), col].sum(), cost[r, c].sum(), rtol=1e-5, atol=1e-4
    )
    # duplicate rows: many equal-cost optima, zero auction increments
    base = rng.normal(size=(1, 10)).astype(np.float32)
    cost = np.repeat(base, 6, axis=0)
    col = np.asarray(solve(jnp.asarray(cost), jnp.ones((6,), bool)))
    assert len(set(col.tolist())) == 6
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[np.arange(6), col].sum(), cost[r, c].sum(), rtol=1e-5, atol=1e-5
    )
    # strictly negative costs with a masked suffix
    cost = (-np.abs(rng.normal(size=(9, 14))) - 1.0).astype(np.float32)
    mask = np.array([True] * 5 + [False] * 4)
    col = np.asarray(solve(jnp.asarray(cost), jnp.asarray(mask)))
    r, c = linear_sum_assignment(cost[:5])
    np.testing.assert_allclose(
        cost[np.arange(5), col[:5]].sum(), cost[r, c].sum(),
        rtol=1e-5, atol=1e-4,
    )
    assert (col[5:] == -1).all()
