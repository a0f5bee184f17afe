"""Unit tests for the native C++ RLE kernel library.

Every operation is verified against a brute-force NumPy oracle, per the test
strategy mandated by SURVEY.md §4 (the reference has no tests; contract from
reference src/coco/common/maskApi.h:16-60).
"""

import numpy as np
import pytest

from rsis_tpu.kernels import mask as rmask
from rsis_tpu.kernels import _binding as rb


def random_masks(rng, h, w, n):
    """Random blobby binary masks (h, w, n) uint8, Fortran order."""
    out = np.zeros((h, w, n), dtype=np.uint8, order="F")
    for i in range(n):
        k = rng.integers(1, 4)
        for _ in range(k):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            ry, rx = rng.integers(1, max(2, h // 3)), rng.integers(1, max(2, w // 3))
            yy, xx = np.ogrid[:h, :w]
            out[:, :, i] |= (((yy - cy) / max(ry, 1)) ** 2
                             + ((xx - cx) / max(rx, 1)) ** 2 <= 1).astype(np.uint8)
    return out


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_encode_decode_roundtrip(rng):
    for h, w, n in [(1, 1, 1), (7, 5, 3), (64, 48, 4), (31, 97, 2)]:
        m = random_masks(rng, h, w, n)
        rles = rmask.encode(m)
        back = rmask.decode(rles)
        np.testing.assert_array_equal(m, back)


def test_encode_column_major_runs():
    # a single pixel at (row 2, col 0) of a 4x3 mask: counts = [2, 1, 9]
    m = np.zeros((4, 3), dtype=np.uint8)
    m[2, 0] = 1
    rle = rmask.encode(m)
    cnts, h, w = rmask._decompress(rle)
    np.testing.assert_array_equal(cnts, [2, 1, 9])


def test_empty_and_full_masks():
    z = np.zeros((5, 5), dtype=np.uint8)
    f = np.ones((5, 5), dtype=np.uint8)
    rz, rf = rmask.encode(z), rmask.encode(f)
    assert rmask.area(rz) == 0
    assert rmask.area(rf) == 25
    np.testing.assert_array_equal(rmask.decode(rz), z)
    np.testing.assert_array_equal(rmask.decode(rf), f)
    # full mask starts with a zero-length background run
    cnts, _, _ = rmask._decompress(rf)
    assert cnts[0] == 0


def test_area_oracle(rng):
    m = random_masks(rng, 33, 41, 5)
    rles = rmask.encode(m)
    areas = rmask.area(rles)
    np.testing.assert_array_equal(areas, m.sum(axis=(0, 1)))


def test_merge_union_intersect(rng):
    m = random_masks(rng, 25, 30, 3)
    rles = rmask.encode(m)
    u = rmask.decode(rmask.merge(rles, intersect=False))
    i = rmask.decode(rmask.merge(rles, intersect=True))
    np.testing.assert_array_equal(u, (m.sum(axis=2) > 0).astype(np.uint8))
    np.testing.assert_array_equal(i, (m.sum(axis=2) == 3).astype(np.uint8))


def test_iou_oracle(rng):
    m = random_masks(rng, 40, 40, 4)
    g = random_masks(rng, 40, 40, 3)
    drles, grles = rmask.encode(m), rmask.encode(g)
    got = rmask.iou(drles, grles, [0, 0, 0])
    for d in range(4):
        for gi in range(3):
            inter = np.logical_and(m[:, :, d], g[:, :, gi]).sum()
            union = np.logical_or(m[:, :, d], g[:, :, gi]).sum()
            want = inter / union if inter > 0 else 0.0
            assert got[d, gi] == pytest.approx(want, abs=1e-12)


def test_iou_crowd_semantics(rng):
    m = random_masks(rng, 32, 32, 2)
    g = random_masks(rng, 32, 32, 2)
    drles, grles = rmask.encode(m), rmask.encode(g)
    got = rmask.iou(drles, grles, [1, 1])
    for d in range(2):
        for gi in range(2):
            inter = np.logical_and(m[:, :, d], g[:, :, gi]).sum()
            da = m[:, :, d].sum()
            want = inter / da if inter > 0 else 0.0
            assert got[d, gi] == pytest.approx(want, abs=1e-12)


def test_iou_shape_mismatch_yields_minus_one():
    a = rmask.encode(np.ones((4, 4), dtype=np.uint8))
    b = rmask.encode(np.ones((5, 5), dtype=np.uint8))
    got = rmask.iou([a], [b], [0])
    assert got[0, 0] == -1.0


def test_to_bbox_oracle(rng):
    m = random_masks(rng, 37, 29, 4)
    rles = rmask.encode(m)
    bbs = rmask.toBbox(rles)
    for i in range(4):
        ys, xs = np.where(m[:, :, i])
        if len(ys) == 0:
            np.testing.assert_array_equal(bbs[i], [0, 0, 0, 0])
        else:
            want = [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                    ys.max() - ys.min() + 1]
            np.testing.assert_allclose(bbs[i], want)


def test_bb_iou_oracle():
    dt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], dtype=np.float64)
    gt = np.array([[0, 0, 10, 10]], dtype=np.float64)
    got = rmask.iou(dt, gt, [0])
    assert got[0, 0] == pytest.approx(1.0)
    assert got[1, 0] == pytest.approx(25.0 / 175.0)
    # crowd: denominator is dt area only
    got_c = rmask.iou(dt, gt, [1])
    assert got_c[1, 0] == pytest.approx(25.0 / 100.0)


def test_string_codec_roundtrip(rng):
    for h, w in [(13, 17), (64, 64), (100, 3)]:
        m = random_masks(rng, h, w, 1)
        rle = rmask.encode(m[:, :, 0])
        cnts, _, _ = rmask._decompress(rle)
        s = rb.to_string(cnts)
        back = rb.from_string(s, h, w)
        np.testing.assert_array_equal(cnts, back)
        assert all(48 <= c < 48 + 64 for c in s)  # printable 6-bit alphabet


def test_string_codec_known_value():
    # the delta codec must reproduce the canonical pycocotools bytes for a
    # simple mask; this exact value was produced by pycocotools 2.0:
    # encode(ones((1,1))) -> counts b'01'
    m = np.ones((1, 1), dtype=np.uint8)
    rle = rmask.encode(m)
    assert rle["counts"] == b"01"


# ---- pycocotools byte-compatibility oracle ---------------------------------
# Independent pure-Python transcription of the interchange SPEC (reference
# src/coco/common/maskApi.c:203-230): LEB128-style 5-bit groups, chars 48-111,
# delta vs counts[i-2] applied only from run index 3 (i>2) onward. The
# asymmetric start index is load-bearing: getting it wrong round-trips
# internally but corrupts every real COCO JSON with >=4 runs.

def _spec_encode(cnts):
    out = bytearray()
    for i, c in enumerate(cnts):
        x = int(c) - (int(cnts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            g = x & 0x1F
            x >>= 5
            more = (x != -1) if (g & 0x10) else (x != 0)
            if more:
                g |= 0x20
            out.append(g + 48)
    return bytes(out)


def _spec_decode(s):
    cnts, p = [], 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return np.asarray(cnts, dtype=np.uint32)


def test_string_codec_matches_spec_oracle(rng):
    # random count vectors of every small length (the i>2 boundary needs
    # >=4 runs to be reached) plus large counts to exercise multi-char groups
    for trial in range(200):
        m = int(rng.integers(1, 12))
        cnts = rng.integers(0, 1 << int(rng.integers(3, 20)),
                            size=m).astype(np.uint32)
        want = _spec_encode(cnts)
        got = rb.to_string(cnts)
        assert got == want, (cnts, got, want)
        np.testing.assert_array_equal(rb.from_string(want, 0, 0), cnts)
        np.testing.assert_array_equal(_spec_decode(got), cnts)


def test_string_codec_golden_bytes():
    # hand-verified through the upstream algorithm: counts [1,2,3,4,5] ->
    # deltas [1,2,3,4-2,5-3] = [1,2,3,2,2] -> single 5-bit groups -> "12322"
    cnts = np.array([1, 2, 3, 4, 5], dtype=np.uint32)
    assert rb.to_string(cnts) == b"12322"
    np.testing.assert_array_equal(rb.from_string(b"12322", 0, 0), cnts)


def test_string_codec_real_pycocotools_fixture():
    # every segmentation string in the reference's fake-results fixture was
    # produced by genuine pycocotools; decode -> re-encode must be
    # byte-identical and the counts must tile the full image
    # (reference src/coco/results/instances_val2014_fakesegm100_results.json)
    import json
    import os

    path = ("/root/reference/src/coco/results/"
            "instances_val2014_fakesegm100_results.json")
    if not os.path.exists(path):
        pytest.skip("reference fixture not available")
    anns = json.load(open(path))
    assert len(anns) > 700
    checked_long = 0
    for ann in anns:
        seg = ann["segmentation"]
        h, w = seg["size"]
        s = seg["counts"].encode("ascii")
        cnts = rb.from_string(s, h, w)
        assert int(cnts.sum()) == h * w, ann["image_id"]
        assert rb.to_string(cnts) == s
        if len(cnts) >= 4:
            checked_long += 1
    assert checked_long > 700  # the i>2 boundary was genuinely exercised


def test_frbbox(rng):
    bb = np.array([[2, 3, 4, 5]], dtype=np.float64)
    rles = rmask.frBbox(bb, 12, 10)
    m = rmask.decode(rles)[:, :, 0]
    want = np.zeros((12, 10), dtype=np.uint8)
    want[3:8, 2:6] = 1
    np.testing.assert_array_equal(m, want)


def test_frpoly_rectangle():
    # an axis-aligned rectangle polygon should fill (approximately) the
    # corresponding pixel region
    poly = [1.0, 1.0, 8.0, 1.0, 8.0, 6.0, 1.0, 6.0]
    rle = rmask.frPyObjects([poly], 10, 10)[0]
    m = rmask.decode(rle)
    area = m.sum()
    assert abs(int(area) - 35) <= 14  # 7x5 interior, boundary convention slack
    assert m[3, 3] == 1 and m[0, 0] == 0 and m[9, 9] == 0


def test_fr_uncompressed_rle():
    uc = {"size": [4, 4], "counts": [2, 3, 11]}
    rle = rmask.frPyObjects([uc], 4, 4)[0]
    m = rmask.decode(rle)
    flat = m.ravel(order="F")
    want = np.zeros(16, dtype=np.uint8)
    want[2:5] = 1
    np.testing.assert_array_equal(flat, want)


def test_merge_commutes_with_numpy_many(rng):
    for trial in range(5):
        m = random_masks(rng, 19, 23, 6)
        rles = rmask.encode(m)
        u = rmask.decode(rmask.merge(rles))
        np.testing.assert_array_equal(u, (m.sum(axis=2) > 0).astype(np.uint8))


def test_nms(rng):
    m = np.zeros((20, 20, 3), dtype=np.uint8, order="F")
    m[0:10, 0:10, 0] = 1
    m[0:10, 0:9, 1] = 1   # heavy overlap with 0
    m[12:20, 12:20, 2] = 1  # disjoint
    rles = rmask.encode(m)
    keep = rmask.nms(rles, 0.5)
    np.testing.assert_array_equal(keep, [1, 0, 1])
