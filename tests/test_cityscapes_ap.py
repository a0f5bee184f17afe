"""Analytic tests for the built-in Cityscapes instance AP evaluator."""

import numpy as np
import pytest

from rsis_tpu.evals.cityscapes_ap import (
    THRESHOLDS, evaluate_images, gt_instances_from_id_map)


def gt_map(*instances, shape=(64, 64), group=None):
    """instances: (label_id, inst_num, y, x, h, w)."""
    m = np.zeros(shape, dtype=np.int64)
    for (lab, num, y, x, h, w) in instances:
        m[y:y + h, x:x + w] = lab * 1000 + num
    if group is not None:
        lab, y, x, h, w = group
        m[y:y + h, x:x + w] = lab
    return m


def box_mask(y, x, h, w, shape=(64, 64)):
    m = np.zeros(shape, dtype=bool)
    m[y:y + h, x:x + w] = True
    return m


class TestGtParsing:
    def test_instances_and_groups(self):
        m = gt_map((24, 0, 2, 2, 10, 10), (26, 1, 30, 30, 8, 8),
                   group=(26, 50, 50, 10, 10))
        inst, groups = gt_instances_from_id_map(m)
        assert len(inst[24]) == 1 and len(inst[26]) == 1
        assert 26 in groups and groups[26].sum() == 100


class TestAP:
    def test_perfect_predictions(self):
        m = gt_map((24, 0, 2, 2, 10, 10), (26, 1, 30, 30, 8, 8))
        preds = [(box_mask(2, 2, 10, 10), 24, 0.9),
                 (box_mask(30, 30, 8, 8), 26, 0.8)]
        res = evaluate_images([m], [preds])
        assert res["allAp"] == pytest.approx(1.0)
        assert res["allAp50%"] == pytest.approx(1.0)
        assert res["classes"][24] == pytest.approx(1.0)

    def test_miss_halves_recall(self):
        m = gt_map((24, 0, 2, 2, 10, 10), (24, 1, 30, 30, 10, 10))
        preds = [(box_mask(2, 2, 10, 10), 24, 0.9)]
        res = evaluate_images([m], [preds])
        # precision 1 up to recall 0.5 -> AP 0.5 at every threshold
        assert res["classes"][24] == pytest.approx(0.5)

    def test_false_positive_on_void_is_excused(self):
        m = gt_map((24, 0, 2, 2, 10, 10))
        # second prediction entirely on void (background label 0)
        preds = [(box_mask(2, 2, 10, 10), 24, 0.9),
                 (box_mask(40, 40, 10, 10), 24, 0.95)]
        res = evaluate_images([m], [preds])
        assert res["classes"][24] == pytest.approx(1.0)

    def test_false_positive_on_other_instance_counts(self):
        m = gt_map((24, 0, 2, 2, 10, 10), (26, 0, 40, 40, 10, 10))
        # a class-24 prediction sitting on the class-26 instance is a real FP
        preds = [(box_mask(2, 2, 10, 10), 24, 0.5),
                 (box_mask(40, 40, 10, 10), 24, 0.95)]
        res = evaluate_images([m], [preds])
        # ranked FP first: precision at recall 1.0 is 1/2 -> AP 0.5
        assert res["classes"][24] == pytest.approx(0.5)

    def test_group_region_excuses_same_class_only(self):
        m = gt_map((24, 0, 2, 2, 10, 10), group=(24, 40, 40, 12, 12))
        preds = [(box_mask(2, 2, 10, 10), 24, 0.9),
                 (box_mask(41, 41, 10, 10), 24, 0.95)]  # on the group
        res = evaluate_images([m], [preds])
        assert res["classes"][24] == pytest.approx(1.0)

    def test_loose_match_only_at_low_thresholds(self):
        m = gt_map((24, 0, 0, 0, 10, 20))
        # half-overlapping prediction: IoU = 10*10/(10*20+10*10-100)=0.5
        preds = [(box_mask(0, 0, 10, 10), 24, 0.9)]
        res = evaluate_images([m], [preds])
        # IoU = 100/200 = 0.5: matches nothing at thr >= 0.5 (strict >)
        assert res["classes"][24] == pytest.approx(0.0)

        preds = [(box_mask(0, 0, 10, 16), 24, 0.9)]
        # IoU = 160/200 = 0.8 -> matches at thr < 0.8: 6 of 10 thresholds
        res = evaluate_images([m], [preds])
        want = np.mean([1.0 if 0.8 > t else 0.0 for t in THRESHOLDS])
        assert res["classes"][24] == pytest.approx(want)
