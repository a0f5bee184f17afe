"""Oracle tests for the single-kernel Pallas LAP solver.

The kernel (ops/pallas_matching.py) replaces the unrolled XLA
Jonker-Volgenant on real TPU inside the train-step matcher
(reference escape it replaces: src/train.py:110-145). Oracles:
scipy.optimize.linear_sum_assignment for optimal total cost, the
shipped ``hungarian`` for the perm contract. Interpret mode on the
virtual CPU mesh (conftest), like every other Pallas test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from rsis_tpu.ops.matching import (
    hungarian, hungarian_pallas, match_gt_to_predictions)
from rsis_tpu.ops.pallas_matching import solve_lap_batch


def _opt_cost(c):
    ri, ci = linear_sum_assignment(c)
    return c[ri, ci].sum()


class TestKernelVsScipy:
    @pytest.mark.parametrize("nr,nc", [(1, 1), (1, 5), (3, 3), (5, 20),
                                       (20, 20), (7, 13)])
    def test_total_cost_matches(self, nr, nc):
        rng = np.random.default_rng(nr * 100 + nc)
        costs = rng.normal(size=(4, nr, nc)).astype(np.float32) * 10
        out = np.asarray(solve_lap_batch(jnp.asarray(costs), interpret=True))
        for b in range(4):
            r4c = out[b]
            assert (r4c >= 0).sum() == nr
            got = sum(costs[b][r4c[j], j] for j in range(nc) if r4c[j] >= 0)
            assert got == pytest.approx(_opt_cost(costs[b]), abs=1e-3)

    def test_ties_still_optimal(self):
        # integer costs with many ties: optimal value must still match
        rng = np.random.default_rng(0)
        costs = rng.integers(0, 3, size=(6, 8, 12)).astype(np.float32)
        out = np.asarray(solve_lap_batch(jnp.asarray(costs), interpret=True))
        for b in range(6):
            r4c = out[b]
            got = sum(costs[b][r4c[j], j] for j in range(12) if r4c[j] >= 0)
            assert got == pytest.approx(_opt_cost(costs[b]), abs=1e-5)
            rows = r4c[r4c >= 0]
            assert len(set(rows.tolist())) == 8  # a matching, no repeats


class TestPermContract:
    @pytest.mark.parametrize("n,m", [(20, 5), (20, 20), (10, 7), (5, 5)])
    def test_matches_unrolled_hungarian(self, n, m):
        # continuous random costs -> unique optimum -> identical perm
        rng = np.random.default_rng(n * 31 + m)
        costs = jnp.asarray(rng.normal(size=(3, n, m)).astype(np.float32))
        ref = np.asarray(hungarian(costs))
        got = np.asarray(hungarian_pallas(costs, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_match_gt_solver_hook(self):
        rng = np.random.default_rng(7)
        n, m, hw = 6, 4, 32
        costs = jnp.asarray(rng.normal(size=(2, n, m)).astype(np.float32))
        y_mask = jnp.asarray(rng.normal(size=(2, n, hw)).astype(np.float32))
        y_class = jnp.asarray(rng.integers(0, 5, size=(2, n)))
        ref = match_gt_to_predictions(y_mask, y_class, costs)
        got = match_gt_to_predictions(
            y_mask, y_class, costs,
            solver=lambda c: hungarian_pallas(c, interpret=True))
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShardMap:
    def test_two_device_shard_map(self):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        devs = jax.devices()[:2]
        mesh = Mesh(np.array(devs), ("data",))
        rng = np.random.default_rng(3)
        costs = jnp.asarray(rng.normal(size=(4, 9, 6)).astype(np.float32))
        fn = shard_map(lambda c: hungarian_pallas(c, interpret=True),
                       mesh=mesh, in_specs=(P("data"),),
                       out_specs=P("data"), check_vma=False)
        np.testing.assert_array_equal(np.asarray(fn(costs)),
                                      np.asarray(hungarian(costs)))
