"""Device-side Hungarian matcher vs the scipy oracle (ops/hungarian.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.core
from scipy.optimize import linear_sum_assignment as scipy_lsa

from torch_detection_tpu.ops.hungarian import (
    batched_linear_sum_assignment,
    linear_sum_assignment,
)


def _total(cost, col4row):
    return float(sum(cost[i, j] for i, j in enumerate(col4row)))


class TestHungarian:
    @pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 9), (8, 8), (16, 100)])
    def test_matches_scipy_cost(self, shape):
        rng = np.random.default_rng(0)
        for trial in range(6):
            cost = rng.normal(size=shape).astype(np.float32) * 10
            got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
            # a valid assignment: distinct columns for every row
            assert len(set(got.tolist())) == shape[0]
            rows, cols = scipy_lsa(cost)
            want_total = cost[rows, cols].sum()
            assert _total(cost, got) == pytest.approx(float(want_total), abs=1e-3)

    def test_integer_costs_exact_assignment(self):
        # with distinct integer costs the optimum is unique -> assignments
        # must match scipy exactly, not just by total
        rng = np.random.default_rng(1)
        for _ in range(4):
            cost = rng.permutation(6 * 10).reshape(6, 10).astype(np.float32)
            got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
            rows, cols = scipy_lsa(cost)
            np.testing.assert_array_equal(got, cols)

    def test_row_valid_masks_do_not_disturb_valid_rows(self):
        rng = np.random.default_rng(2)
        cost = rng.normal(size=(6, 12)).astype(np.float32)
        valid = np.array([True, True, False, True, False, True])
        got = np.asarray(
            linear_sum_assignment(jnp.asarray(cost), jnp.asarray(valid))
        )
        # invalid rows are skipped entirely (early-exit) and return -1
        assert (got[~valid] == -1).all()
        vcols = got[valid]
        assert (vcols >= 0).all() and len(set(vcols.tolist())) == valid.sum()
        # the valid rows alone must achieve the optimum of their submatrix
        sub = cost[valid]
        rows, cols = scipy_lsa(sub)
        want_total = sub[rows, cols].sum()
        got_total = sum(cost[i, got[i]] for i in range(6) if valid[i])
        assert got_total == pytest.approx(float(want_total), abs=1e-3)
        # prefix-valid masks (the collate contract) work identically
        pv = np.array([True, True, True, False, False, False])
        got2 = np.asarray(
            linear_sum_assignment(jnp.asarray(cost), jnp.asarray(pv))
        )
        sub2 = cost[pv]
        r2, c2 = scipy_lsa(sub2)
        got2_total = sum(cost[i, got2[i]] for i in range(3))
        assert got2_total == pytest.approx(float(sub2[r2, c2].sum()), abs=1e-3)

    def test_jits_and_vmaps(self):
        rng = np.random.default_rng(3)
        cost = rng.normal(size=(4, 5, 9)).astype(np.float32)
        fn = jax.jit(batched_linear_sum_assignment)
        got = np.asarray(fn(jnp.asarray(cost)))
        assert got.shape == (4, 5)
        for b in range(4):
            rows, cols = scipy_lsa(cost[b])
            assert _total(cost[b], got[b]) == pytest.approx(
                float(cost[b][rows, cols].sum()), abs=1e-3
            )

    def test_adversarial_ties_and_scale(self):
        # ties, duplicated rows, large magnitudes
        cost = np.array(
            [[1.0, 1.0, 5.0, 9.0],
             [1.0, 1.0, 5.0, 9.0],
             [2.0, 2.0, 2.0, 2.0]], np.float32,
        )
        got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        rows, cols = scipy_lsa(cost)
        assert _total(cost, got) == pytest.approx(float(cost[rows, cols].sum()))
        big = cost * 1e6
        got2 = np.asarray(linear_sum_assignment(jnp.asarray(big)))
        rows, cols = scipy_lsa(big)
        assert _total(big, got2) == pytest.approx(float(big[rows, cols].sum()), rel=1e-6)
