"""Golden end-to-end equivalence of the COCO eval stack vs the reference.

Loads the reference's own vendored pycocotools Python sources
(/root/reference/src/coco/PythonAPI/pycocotools/{coco,cocoeval}.py) as the
oracle — with the mask ops provided by this repo's byte-compatible,
independently numpy-oracle-tested kernel facade — and runs both stacks over
the reference's genuine fake-results fixtures
(src/coco/results/instances_val2014_fake{bbox,segm}100_results.json), with a
deterministic GT synthesized from those detections the way the upstream demo
pipeline did (perturbed copies of GT). All 12 summary statistics must match
exactly for both iouTypes. This is the fixture validation SURVEY.md §4 /
§7-step-1 calls for, and it licenses restructuring evals/cocoeval.py.
"""

import copy
import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src/coco"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


def _load_upstream():
    """Assemble the reference's pycocotools as an importable package, with
    pycocotools.mask delegating to this repo's kernel facade."""
    if "pycocotools" in sys.modules:
        return sys.modules["pycocotools"]
    pkg = types.ModuleType("pycocotools")
    pkg.__path__ = []
    sys.modules["pycocotools"] = pkg

    import rsis_tpu.kernels.mask as our_mask
    mask_mod = types.ModuleType("pycocotools.mask")
    for name in ("encode", "decode", "area", "merge", "iou", "toBbox",
                 "frPyObjects", "frBbox", "frPoly", "frUncompressedRLE"):
        setattr(mask_mod, name, getattr(our_mask, name))
    sys.modules["pycocotools.mask"] = mask_mod
    pkg.mask = mask_mod

    if not hasattr(np, "float"):  # numpy-2 removed alias used upstream
        np.float = float
    for stem in ("coco", "cocoeval"):
        path = f"{REF}/PythonAPI/pycocotools/{stem}.py"
        src = open(path).read()
        # numpy-2 requires an integer `num` for linspace; upstream passes
        # np.round(...)'s float64. Behavior-preserving shim.
        src = src.replace(
            "np.linspace(.5, 0.95, np.round((0.95 - .5) / .05) + 1",
            "np.linspace(.5, 0.95, int(np.round((0.95 - .5) / .05)) + 1")
        src = src.replace(
            "np.linspace(.0, 1.00, np.round((1.00 - .0) / .01) + 1",
            "np.linspace(.0, 1.00, int(np.round((1.00 - .0) / .01)) + 1")
        mod = types.ModuleType(f"pycocotools.{stem}")
        mod.__package__ = "pycocotools"
        mod.unicode = str  # py2 relic reachable in loadRes
        sys.modules[f"pycocotools.{stem}"] = mod
        exec(compile(src, path, "exec"), mod.__dict__)
        setattr(pkg, stem, mod)
    return pkg


def _synth_gt(results_path, tmp_path):
    """Deterministic GT synthesized from a fake-results fixture: every other
    detection (per image, by original order) becomes a GT annotation; every
    7th GT is flagged iscrowd to exercise the ignore path."""
    import rsis_tpu.kernels.mask as km

    dets = json.load(open(results_path))
    images, img_seen = [], set()
    anns = []
    for i, d in enumerate(dets):
        if "segmentation" in d:
            h, w = d["segmentation"]["size"]
            seg = d["segmentation"]
            area = float(km.area([seg])[0])
            bbox = [float(v) for v in km.toBbox([seg])[0]]
        else:
            h, w = 480, 640
            bbox = d["bbox"]
            area = float(bbox[2] * bbox[3])
            seg = None
        if d["image_id"] not in img_seen:
            img_seen.add(d["image_id"])
            images.append({"id": d["image_id"], "height": h, "width": w})
        if i % 2 == 0:
            ann = {"id": len(anns) + 1, "image_id": d["image_id"],
                   "category_id": d["category_id"], "bbox": bbox,
                   "area": area, "iscrowd": int(len(anns) % 7 == 0)}
            if seg is not None:
                ann["segmentation"] = {"size": seg["size"],
                                       "counts": seg["counts"]}
            anns.append(ann)
    cats = sorted({a["category_id"] for a in anns} |
                  {d["category_id"] for d in dets})
    gt = {"images": images,
          "annotations": anns,
          "categories": [{"id": c, "name": str(c)} for c in cats]}
    p = os.path.join(tmp_path, "gt.json")
    json.dump(gt, open(p, "w"))
    return p


def _run_upstream(gt_path, res_path, iou_type):
    up = _load_upstream()
    coco_gt = up.coco.COCO(gt_path)
    coco_dt = coco_gt.loadRes(res_path)
    ev = up.cocoeval.COCOeval(coco_gt, coco_dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()  # the reference's customized 13-stat layout
    return ev


def _run_ours(gt_path, res_path, iou_type):
    from rsis_tpu.evals.coco import COCO
    from rsis_tpu.evals.cocoeval import COCOeval
    coco_gt = COCO(gt_path)
    coco_dt = coco_gt.loadRes(res_path)
    ev = COCOeval(coco_gt, coco_dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    ev.summarize(style="rsis13")
    return ev


@pytest.mark.parametrize("fixture,iou_type", [
    ("instances_val2014_fakebbox100_results.json", "bbox"),
    ("instances_val2014_fakesegm100_results.json", "segm"),
])
def test_full_stack_matches_reference_pycocotools(fixture, iou_type,
                                                  tmp_path):
    res_path = f"{REF}/results/{fixture}"
    gt_path = _synth_gt(res_path, str(tmp_path))
    ev_u = _run_upstream(gt_path, res_path, iou_type)
    ev_o = _run_ours(gt_path, res_path, iou_type)

    # the full accumulate tensors, not just the summary projection (the
    # reference's vendored accumulate predates the 'scores' tensor)
    for key in ("precision", "recall"):
        np.testing.assert_allclose(
            ev_o.eval[key], ev_u.eval[key], rtol=0, atol=1e-12,
            err_msg=f"{iou_type} accumulate[{key}] diverges")

    want = np.asarray(ev_u.stats, dtype=np.float64)
    got = np.asarray(ev_o.stats, dtype=np.float64)
    assert want.shape == (13,)  # the reference's customized layout
    assert np.all(np.isfinite(want)) and want.max() > 0.1, want
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                               err_msg=f"{iou_type} summary diverges")


def test_keypoints_stack_matches_reference(tmp_path):
    """OKS matching + the 10-stat keypoint summary must match the
    reference's vendored pycocotools on the fake-keypoints fixture with a
    deterministically synthesized GT (every other detection, jittered
    visibilities)."""
    res_path = (f"{REF}/results/"
                "person_keypoints_val2014_fakekeypoints100_results.json")
    dets = json.load(open(res_path))
    assert len(dets) > 100
    images, img_seen = [], set()
    anns = []
    for i, d in enumerate(dets):
        if d["image_id"] not in img_seen:
            img_seen.add(d["image_id"])
            images.append({"id": d["image_id"], "height": 480, "width": 640})
        if i % 2 == 0:
            kp = list(d["keypoints"])
            # deterministic visibility pattern incl. a fully-unlabelled GT
            # every 9th (exercises the doubled-bbox fallback in computeOks)
            nk = 0
            for j in range(2, len(kp), 3):
                kp[j] = 0 if (len(anns) % 9 == 0 or j % 9 == 2) else 2
                nk += kp[j] > 0
            xs, ys = kp[0::3], kp[1::3]
            bbox = [min(xs), min(ys), max(xs) - min(xs),
                    max(ys) - min(ys)]
            anns.append({"id": len(anns) + 1, "image_id": d["image_id"],
                         "category_id": d["category_id"], "keypoints": kp,
                         "num_keypoints": int(nk), "bbox": bbox,
                         "area": bbox[2] * bbox[3], "iscrowd": 0})
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    gt_path = os.path.join(str(tmp_path), "gt_kp.json")
    json.dump(gt, open(gt_path, "w"))

    up = _load_upstream()
    coco_u = up.coco.COCO(gt_path)
    ev_u = up.cocoeval.COCOeval(coco_u, coco_u.loadRes(res_path),
                                "keypoints")
    ev_u.evaluate()
    ev_u.accumulate()
    ev_u.summarize()

    from rsis_tpu.evals.coco import COCO
    from rsis_tpu.evals.cocoeval import COCOeval
    coco_o = COCO(gt_path)
    ev_o = COCOeval(coco_o, coco_o.loadRes(res_path), "keypoints")
    ev_o.evaluate()
    ev_o.accumulate()
    ev_o.summarize()

    for key in ("precision", "recall"):
        np.testing.assert_allclose(ev_o.eval[key], ev_u.eval[key],
                                   rtol=0, atol=1e-12,
                                   err_msg=f"keypoints {key} diverges")
    want = np.asarray(ev_u.stats, dtype=np.float64)
    got = np.asarray(ev_o.stats, dtype=np.float64)
    assert want.shape == (10,) and want.max() > 0.1, want
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_per_image_eval_matches_reference(tmp_path):
    # beyond the 12 summary numbers: per-image/per-category match arrays
    res_path = f"{REF}/results/instances_val2014_fakesegm100_results.json"
    gt_path = _synth_gt(res_path, str(tmp_path))

    up = _load_upstream()
    coco_gt_u = up.coco.COCO(gt_path)
    ev_u = up.cocoeval.COCOeval(coco_gt_u, coco_gt_u.loadRes(res_path),
                                "segm")
    ev_u.evaluate()

    from rsis_tpu.evals.coco import COCO
    from rsis_tpu.evals.cocoeval import COCOeval
    coco_gt_o = COCO(gt_path)
    ev_o = COCOeval(coco_gt_o, coco_gt_o.loadRes(res_path), "segm")
    ev_o.evaluate()

    assert len(ev_u.evalImgs) == len(ev_o.evalImgs)
    n_nonempty = 0
    for a, b in zip(ev_u.evalImgs, ev_o.evalImgs):
        if a is None or b is None:
            assert a is None and b is None
            continue
        n_nonempty += 1
        np.testing.assert_array_equal(
            np.asarray(a["dtMatches"]), np.asarray(b["dtMatches"]))
        np.testing.assert_array_equal(
            np.asarray(a["gtMatches"]), np.asarray(b["gtMatches"]))
        np.testing.assert_array_equal(
            np.asarray(a["dtIgnore"]), np.asarray(b["dtIgnore"]))
        assert a["dtIds"] == b["dtIds"] and a["gtIds"] == b["gtIds"]
    assert n_nonempty > 100
