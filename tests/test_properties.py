"""Property-based tests (hypothesis) for the numeric core.

Shapes are FIXED per test so each property compiles one XLA program and
then fuzzes values only — hypothesis explores the data space (ties,
duplicates, degenerate boxes, adversarial masks) without per-example
recompiles, which matters on this 1-core host.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

_EX = dict(max_examples=25, deadline=None)


def _costs(r, c, integers):
    if integers:
        # Heavy ties: few distinct values.
        return st.lists(
            st.integers(min_value=-3, max_value=3),
            min_size=r * c, max_size=r * c,
        ).map(lambda v: np.asarray(v, np.float32).reshape(r, c))
    return st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_subnormal=False, width=32),
        min_size=r * c, max_size=r * c,
    ).map(lambda v: np.asarray(v, np.float32).reshape(r, c))


class TestLapProperties:
    R, C = 6, 9

    def _check(self, cost, n_real):
        from scipy.optimize import linear_sum_assignment

        from detr_tensorflow_tpu.ops.matcher import solve_lap_masked

        mask = np.arange(self.R) < n_real
        col = np.asarray(
            solve_lap_masked(jnp.asarray(cost), jnp.asarray(mask))
        )
        assert (col[n_real:] == -1).all()
        a = col[:n_real]
        # A valid assignment: every real row matched, columns distinct.
        assert (a >= 0).all() and (a < self.C).all()
        assert len(set(a.tolist())) == n_real
        # Optimal: total cost equals scipy's optimum.
        if n_real:
            ri, ci = linear_sum_assignment(cost[:n_real])
            np.testing.assert_allclose(
                cost[np.arange(n_real), a].sum(), cost[ri, ci].sum(),
                rtol=1e-5, atol=1e-4,
            )

    @settings(**_EX)
    @given(cost=_costs(6, 9, integers=False),
           n_real=st.integers(min_value=0, max_value=6))
    def test_matches_scipy_floats(self, cost, n_real):
        self._check(cost, n_real)

    @settings(**_EX)
    @given(cost=_costs(6, 9, integers=True),
           n_real=st.integers(min_value=0, max_value=6))
    def test_matches_scipy_ties(self, cost, n_real):
        self._check(cost, n_real)


class TestBoxProperties:
    @settings(**_EX)
    @given(b=st.lists(
        st.floats(min_value=0.015625, max_value=0.984375,
                  allow_nan=False, allow_subnormal=False, width=32),
        min_size=20, max_size=20,
    ).map(lambda v: np.asarray(v, np.float32).reshape(5, 4)))
    def test_xcycwh_xyxy_roundtrip(self, b):
        from detr_tensorflow_tpu.ops import boxes

        # Keep boxes inside [0,1] so the conversion's clip is a no-op
        # and the roundtrip must be exact up to fp error.
        b[:, 2:] = b[:, 2:] * np.minimum(b[:, :2], 1 - b[:, :2]) * 2 * 0.99
        xyxy = boxes.xcycwh_to_xyxy(jnp.asarray(b))
        back = np.asarray(boxes.xyxy_to_xcycwh(xyxy))
        np.testing.assert_allclose(back, b, rtol=1e-5, atol=1e-6)

    @settings(**_EX)
    @given(b=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                  allow_subnormal=False, width=32),
        min_size=32, max_size=32,
    ).map(lambda v: np.asarray(v, np.float32).reshape(2, 4, 4)))
    def test_giou_bounds_and_diagonal(self, b):
        from detr_tensorflow_tpu.ops import boxes

        def make_valid(raw):
            x = np.sort(raw.reshape(4, 2, 2), axis=1).reshape(4, 4)
            x = x[:, [0, 2, 1, 3]]  # x1 y1 x2 y2 with x1<=x2, y1<=y2
            # Positive area: zero-area-vs-zero-area GIoU is 0/0 (the
            # matcher guards that case with an isfinite filter at the
            # cost-matrix level, ops/matcher.py cost_matrix).
            x[:, 2:] = np.maximum(x[:, 2:], x[:, :2] + 0.01)
            return x

        a = make_valid(b[0])
        c = make_valid(b[1])
        g = np.asarray(boxes.giou(jnp.asarray(a), jnp.asarray(c)))
        assert (g >= -1 - 1e-5).all() and (g <= 1 + 1e-5).all()
        # GIoU(box, itself) == 1.
        g_self = np.diag(np.asarray(boxes.giou(jnp.asarray(a), jnp.asarray(a))))
        np.testing.assert_allclose(g_self, 1.0, rtol=0, atol=1e-4)


class TestMaxpoolProperties:
    @settings(**_EX)
    @given(data=st.lists(
        st.integers(min_value=-4, max_value=4),
        min_size=2 * 9 * 11 * 3, max_size=2 * 9 * 11 * 3,
    ))
    def test_grad_parity_under_heavy_ties(self, data):
        import jax
        from flax import linen as nn

        from detr_tensorflow_tpu.ops.maxpool import max_pool_3x3_s2

        x = jnp.asarray(
            np.asarray(data, np.float32).reshape(2, 9, 11, 3)
        )

        def ref(a):
            return nn.max_pool(a, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        ct = jnp.ones(ref(x).shape, jnp.float32)
        g_new = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a) * ct))(x)
        g_ref = jax.grad(lambda a: jnp.sum(ref(a) * ct))(x)
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))
