"""Native packed-target builder vs the numpy reference implementation.

pack_target (kernels/rle/rle.cpp rsis_pack_target) must reproduce
data/base.sequence_from_masks (reference: src/dataloader/dataset.py:86-146)
exactly, except for the order of EQUAL-AREA instances: numpy's argsort tie
order is unspecified, so both sides are free there (including which of two
equal-area instances survives truncation). The contract checked here:
the per-slot area sequence matches, and every slot whose area is unique
matches bit-for-bit."""

import numpy as np

from rsis_tpu.data.base import sequence_from_masks
from rsis_tpu.kernels._binding import pack_target


def _scene(rng, h, w, k):
    ins = np.zeros((h, w), np.int64)
    seg = np.zeros((h, w), np.int64)
    yy, xx = np.ogrid[:h, :w]
    for i in range(k):
        cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
        r = int(rng.integers(3, min(h, w) // 6))
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        ins[m] = i + 1
        seg[m] = int(rng.integers(1, 9))
    return ins, seg


def _check(ins, seg, n):
    want = sequence_from_masks(ins, seg, n, native=False)
    got = pack_target(ins, seg, n).astype(np.float32)
    assert got.shape == want.shape
    a_w = want[:, :-3].sum(axis=1)
    a_g = got[:, :-3].sum(axis=1)
    np.testing.assert_array_equal(a_g, a_w)  # same area sequence
    # count each area over ALL instances (a unique kept area can still
    # tie with a truncated one)
    all_areas = np.bincount(ins.reshape(-1))[1:]
    all_areas = all_areas[all_areas > 0]
    from collections import Counter
    freq = Counter(all_areas.tolist())
    for r in range(n):
        if a_w[r] == 0 or freq[int(a_w[r])] == 1:
            np.testing.assert_array_equal(got[r], want[r], err_msg=f"row {r}")


class TestPackTarget:
    def test_randomized_scenes(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            k = int(rng.integers(0, 25))
            ins, seg = _scene(rng, 64, 96, k)
            _check(ins, seg, 8)

    def test_empty_scene_eos(self):
        ins = np.zeros((16, 16), np.int64)
        seg = np.zeros((16, 16), np.int64)
        _check(ins, seg, 4)
        t = pack_target(ins, seg, 4)
        assert t[0, -1] == 1 and t.sum() == 1  # only the eos class weight

    def test_truncation_keeps_largest(self):
        ins = np.zeros((32, 32), np.int64)
        seg = np.zeros((32, 32), np.int64)
        ins[0:2, 0:2] = 1    # area 4
        ins[4:10, 4:10] = 2  # area 36
        ins[12:16, 12:16] = 3  # area 16
        seg[ins > 0] = 2
        t = pack_target(ins, seg, 2).astype(np.float32)
        areas = t[:, :-3].sum(axis=1)
        np.testing.assert_array_equal(areas, [36, 16])
        assert t[:, -1].sum() == 2  # no eos slot when truncated

    def test_class_is_min_seg(self):
        ins = np.zeros((8, 8), np.int64)
        seg = np.zeros((8, 8), np.int64)
        ins[2:6, 2:6] = 1
        seg[2:6, 2:6] = 5
        seg[3, 3] = 2  # minority lower class -> np.unique()[0] picks it
        t = pack_target(ins, seg, 3)
        assert t[0, -3] == 2
        want = sequence_from_masks(ins, seg, 3, native=False)
        np.testing.assert_array_equal(t.astype(np.float32), want)

    def test_fast_path_dispatch(self):
        rng = np.random.default_rng(1)
        ins, seg = _scene(rng, 32, 48, 5)
        via_api = sequence_from_masks(ins, seg, 8)  # native=True default
        direct = pack_target(ins, seg, 8).astype(np.float32)
        np.testing.assert_array_equal(via_api, direct)
