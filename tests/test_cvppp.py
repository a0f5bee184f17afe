"""Tests for the CVPPP SBD / |DiC| metric reimplementation."""

import numpy as np
import pytest

from rsis_tpu.evals.cvppp import (
    abs_diff_fg_labels, best_dice, dice_score, evaluate_batch,
    symmetric_best_dice)


def labels(*boxes, shape=(20, 20)):
    out = np.zeros(shape, dtype=np.int32)
    for i, (y, x, h, w) in enumerate(boxes, start=1):
        out[y:y + h, x:x + w] = i
    return out


class TestDice:
    def test_identical(self):
        a = np.zeros((10, 10), bool)
        a[2:6, 2:6] = True
        assert dice_score(a, a) == pytest.approx(1.0)

    def test_disjoint(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[:2], b[5:] = True, True
        assert dice_score(a, b) == 0.0

    def test_half_overlap(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[0:4] = True       # 40 px
        b[2:6] = True       # 40 px, overlap 20
        assert dice_score(a, b) == pytest.approx(2 * 20 / 80)


class TestSBD:
    def test_perfect(self):
        g = labels((2, 2, 5, 5), (10, 10, 6, 6))
        assert symmetric_best_dice(g, g) == pytest.approx(1.0)

    def test_permutation_invariant(self):
        g = labels((2, 2, 5, 5), (10, 10, 6, 6))
        p = np.zeros_like(g)
        p[g == 1] = 2
        p[g == 2] = 1
        assert symmetric_best_dice(p, g) == pytest.approx(1.0)

    def test_missing_instance_penalised(self):
        g = labels((2, 2, 5, 5), (10, 10, 6, 6))
        p = labels((2, 2, 5, 5))
        sbd = symmetric_best_dice(p, g)
        # BestDice(p, g) = 1; BestDice(g, p): instance 2 has best dice 0
        assert sbd == pytest.approx(0.5)

    def test_empty_prediction(self):
        g = labels((2, 2, 5, 5))
        p = np.zeros_like(g)
        assert symmetric_best_dice(p, g) == 0.0


class TestDiC:
    def test_counts(self):
        g = labels((2, 2, 5, 5), (10, 10, 6, 6))
        p = labels((2, 2, 5, 5))
        assert abs_diff_fg_labels(p, g) == 1
        assert abs_diff_fg_labels(g, g) == 0

    def test_batch(self):
        g = labels((2, 2, 5, 5), (10, 10, 6, 6))
        res = evaluate_batch([g, g], [g, g])
        assert res["SBD"] == pytest.approx(1.0)
        assert res["absDiC"] == 0.0
        assert res["n"] == 2
