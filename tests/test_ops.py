"""Tests for losses, Hungarian matching, and the align-corners upsample.

Oracles: scipy.optimize.linear_sum_assignment for matching, closed-form /
torch for losses and upsampling (SURVEY.md §4 test strategy).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from rsis_tpu.ops import (
    soft_iou_cost, masked_nll, balanced_bce,
    soft_iou_loss, masked_nll_loss, masked_bce_loss,
    hungarian, match_gt_to_predictions,
    upsample_bilinear_align_corners,
)


class TestSoftIoU:
    def test_perfect_match_is_zero_cost(self):
        t = jnp.ones((1, 100))
        logits = jnp.full((1, 100), 50.0)  # sigmoid ~ 1
        c = soft_iou_cost(t, logits)
        assert float(c[0]) == pytest.approx(0.0, abs=1e-4)

    def test_disjoint_is_unit_cost(self):
        t = jnp.concatenate([jnp.ones((1, 50)), jnp.zeros((1, 50))], -1)
        logits = jnp.concatenate([jnp.full((1, 50), -50.0),
                                  jnp.full((1, 50), 50.0)], -1)
        c = soft_iou_cost(t, logits)
        assert float(c[0]) == pytest.approx(1.0, abs=1e-4)

    def test_closed_form(self):
        # out = sigmoid(0) = 0.5 everywhere, target = ones:
        # num = 0.5*N, den = (0.5 + 1 - 0.5)*N = N -> cost = 0.5
        t = jnp.ones((3, 64))
        logits = jnp.zeros((3, 64))
        c = soft_iou_cost(t, logits)
        np.testing.assert_allclose(np.asarray(c), 0.5, atol=1e-5)

    def test_matches_torch_reference_formula(self):
        import torch
        rng = np.random.default_rng(1)
        t = (rng.random((4, 200)) > 0.5).astype(np.float32)
        logits = rng.normal(size=(4, 200)).astype(np.float32)
        ours = np.asarray(soft_iou_cost(jnp.asarray(t), jnp.asarray(logits)))
        out = torch.sigmoid(torch.from_numpy(logits))
        tt = torch.from_numpy(t)
        num = (out * tt).sum(1, True)
        den = (out + tt - out * tt).sum(1, True) + 1e-6
        want = (1 - num / den).squeeze().numpy()
        np.testing.assert_allclose(ours, want, atol=2e-4)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matmul_form_matches_elementwise(self, dtype):
        # soft_iou_cost_matmul (the in-scan MXU contraction with hoisted
        # GT pixel counts) vs the broadcast-reduce form over uint8 GT
        from rsis_tpu.ops.losses import soft_iou_cost_matmul

        rng = np.random.default_rng(7)
        b, n, hw = 3, 6, 512
        y = (rng.random((b, n, hw)) > 0.7).astype(np.uint8)
        y[:, -1] = 0  # an empty (padded) GT instance row
        logits = rng.normal(size=(b, hw)).astype(np.float32) * 3
        yj = jnp.asarray(y)
        lj = jnp.asarray(logits)
        want = np.asarray(soft_iou_cost(yj, lj[:, None, :]), np.float32)
        got = np.asarray(soft_iou_cost_matmul(
            jnp.sum(yj, axis=-1, dtype=jnp.float32), yj.astype(dtype), lj),
            np.float32)
        tol = 1e-5 if dtype == jnp.float32 else 6e-3  # sigmoid bf16 ulp
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


class TestNLL:
    def test_oracle(self):
        probs = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
        tgt = jnp.asarray([0, 1])
        got = masked_nll(tgt, probs)
        np.testing.assert_allclose(np.asarray(got),
                                   [-np.log(0.7), -np.log(0.8)], atol=1e-4)

    def test_weighted_mean_equals_masked_select_mean(self):
        rng = np.random.default_rng(2)
        probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(6, 4))), -1)
        tgt = jnp.asarray(rng.integers(0, 4, size=6))
        sw = jnp.asarray([1, 0, 1, 1, 0, 1], jnp.float32)
        got = masked_nll_loss(tgt, probs, sw)
        per = np.asarray(masked_nll(tgt, probs))
        want = per[np.asarray(sw) == 1].mean()
        assert float(got) == pytest.approx(want, rel=1e-5)


class TestBalancedBCE:
    def test_matches_torch_reference_formula(self):
        import torch
        rng = np.random.default_rng(3)
        t = (rng.random((4, 50)) > 0.7).astype(np.float32)
        logits = rng.normal(size=(4, 50)).astype(np.float32)
        for bw in [None, 0.5, 0.3]:
            ours = np.asarray(balanced_bce(jnp.asarray(t), jnp.asarray(logits),
                                           bw))
            tt, out = torch.from_numpy(t), torch.from_numpy(logits)
            if bw is None:
                num_pos = tt.sum()
                bweight = num_pos / tt.numel()
            else:
                bweight = torch.tensor(bw)
            max_val = (-out).clamp(min=0)
            lv = (out - out * tt + max_val
                  + ((-max_val).exp() + (-out - max_val).exp()).log())
            want = ((1 - bweight) * lv * tt + bweight * lv * (1 - tt)).numpy()
            np.testing.assert_allclose(ours, want, atol=2e-4)

    def test_loss_weighted_mean(self):
        t = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        logits = jnp.zeros((2, 2))
        sw = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
        got = masked_bce_loss(t, logits, sw, 0.5)
        per = np.asarray(balanced_bce(t, logits, 0.5))
        assert float(got) == pytest.approx(per[0].mean(), rel=1e-5)


class TestHungarian:
    def test_vs_scipy_square(self):
        rng = np.random.default_rng(4)
        for n in [2, 5, 10, 20]:
            costs = rng.random((8, n, n)).astype(np.float32)
            perm = np.asarray(hungarian(jnp.asarray(costs)))
            for b in range(8):
                rows, cols = linear_sum_assignment(costs[b])
                want_total = costs[b][rows, cols].sum()
                got_total = costs[b][perm[b], np.arange(n)].sum()
                assert got_total == pytest.approx(want_total, abs=1e-4)
                # must be a permutation
                assert sorted(perm[b].tolist()) == list(range(n))

    def test_vs_scipy_rectangular_pad(self):
        # N GT rows, M < N prediction columns, padded with zero-cost columns
        rng = np.random.default_rng(5)
        n, m = 20, 10
        costs = rng.random((4, n, m)).astype(np.float32) + 0.5
        perm = np.asarray(hungarian(jnp.asarray(costs)))
        padded = np.concatenate(
            [costs, np.zeros((4, n, n - m), np.float32)], axis=-1)
        for b in range(4):
            rows, cols = linear_sum_assignment(padded[b])
            want_total = padded[b][rows, cols].sum()
            got_total = padded[b][perm[b], np.arange(n)].sum()
            assert got_total == pytest.approx(want_total, abs=1e-4)

    def test_jit_and_identity(self):
        # identity-cost: diag should be picked
        eye_cost = 1.0 - np.eye(6, dtype=np.float32)
        perm = np.asarray(jax.jit(hungarian)(jnp.asarray(eye_cost[None])))
        np.testing.assert_array_equal(perm[0], np.arange(6))

    def test_match_permutes_gt(self):
        b, n, hw = 2, 4, 16
        rng = np.random.default_rng(6)
        y_mask = jnp.asarray(rng.random((b, n, hw)).astype(np.float32))
        y_class = jnp.asarray(rng.integers(0, 5, (b, n)))
        # cost matrix forcing reversal: prediction t matches GT n-1-t
        costs = np.ones((b, n, n), np.float32)
        for t in range(n):
            costs[:, n - 1 - t, t] = 0.0
        ym, yc, perm = match_gt_to_predictions(
            y_mask, y_class, jnp.asarray(costs))
        np.testing.assert_array_equal(np.asarray(perm[0]), [3, 2, 1, 0])
        np.testing.assert_allclose(np.asarray(ym[0, 0]),
                                   np.asarray(y_mask[0, 3]))
        assert int(yc[0, 0]) == int(y_class[0, 3])


class TestUpsample:
    def test_matches_torch_align_corners(self):
        import torch
        rng = np.random.default_rng(7)
        for (h, w, oh, ow) in [(4, 4, 8, 8), (7, 5, 14, 10), (8, 16, 17, 33),
                               (1, 3, 4, 9)]:
            x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
            got = np.asarray(upsample_bilinear_align_corners(
                jnp.asarray(x), oh, ow))
            xt = torch.from_numpy(x).permute(0, 3, 1, 2)
            want = torch.nn.functional.interpolate(
                xt, size=(oh, ow), mode="bilinear", align_corners=True)
            want = want.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity(self):
        x = jnp.ones((1, 5, 5, 2))
        y = upsample_bilinear_align_corners(x, 5, 5)
        assert y is x
