"""Analytic golden tests for the COCO index + COCOeval reimplementation."""

import numpy as np
import pytest

from rsis_tpu.evals.coco import COCO
from rsis_tpu.evals.cocoeval import COCOeval
from rsis_tpu.kernels import mask as rmask


def make_rle(box, h=100, w=100):
    m = np.zeros((h, w), dtype=np.uint8)
    y, x, bh, bw = box
    m[y:y + bh, x:x + bw] = 1
    rle = rmask.encode(m)
    return {"size": rle["size"], "counts": rle["counts"].decode("ascii")}


def gt_dataset(n_imgs=2):
    imgs = [{"id": i, "height": 100, "width": 100} for i in range(n_imgs)]
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    anns = []
    aid = 1
    boxes = {0: [(10, 10, 20, 20), (50, 50, 30, 30)],
             1: [(5, 5, 40, 40)]}
    for img_id, bl in boxes.items():
        for b in bl:
            anns.append({"id": aid, "image_id": img_id, "category_id": 1,
                         "segmentation": make_rle(b), "iscrowd": 0,
                         "area": b[2] * b[3], "ignore": 0,
                         "bbox": [b[1], b[0], b[3], b[2]]})
            aid += 1
    return {"images": imgs, "categories": cats, "annotations": anns}, boxes


def run_eval(gt, dets, max_dets=(1, 10, 100)):
    coco_gt = COCO(gt)
    coco_dt = coco_gt.loadRes(dets)
    E = COCOeval(coco_gt, coco_dt, "segm")
    E.params.maxDets = list(max_dets)
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E


class TestCOCOIndex:
    def test_index_and_queries(self):
        gt, _ = gt_dataset()
        coco = COCO(gt)
        assert sorted(coco.getImgIds()) == [0, 1]
        assert coco.getCatIds() == [1, 2]
        assert len(coco.getAnnIds(imgIds=[0])) == 2
        assert len(coco.getAnnIds(catIds=[1])) == 3
        assert len(coco.getAnnIds(catIds=[2])) == 0

    def test_ann_to_mask_roundtrip(self):
        gt, boxes = gt_dataset()
        coco = COCO(gt)
        ann = coco.loadAnns([1])[0]
        m = coco.annToMask(ann)
        y, x, bh, bw = boxes[0][0]
        assert m.sum() == bh * bw
        assert m[y, x] == 1


class TestCOCOeval:
    def test_perfect_detections_ap1(self):
        gt, boxes = gt_dataset()
        dets = []
        for img_id, bl in boxes.items():
            for b in bl:
                dets.append({"image_id": img_id, "category_id": 1,
                             "segmentation": make_rle(b), "score": 0.9})
        E = run_eval(gt, dets)
        assert E.stats[0] == pytest.approx(1.0)   # AP .5:.95
        assert E.stats[1] == pytest.approx(1.0)   # AP .5
        assert E.stats[8] == pytest.approx(1.0)   # AR 100

    def test_half_recall(self):
        # detect 1 of 2 objects on image 0 and 0 of 1 on image 1 ->
        # recall 1/3, precision 1: AP = mean over recThrs<=1/3 of 1
        gt, boxes = gt_dataset()
        dets = [{"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][0]), "score": 0.9}]
        E = run_eval(gt, dets)
        want = np.mean(np.linspace(0, 1, 101) <= (1 / 3))
        assert E.stats[1] == pytest.approx(want, abs=1e-6)

    def test_false_positive_hurts_precision(self):
        gt, boxes = gt_dataset()
        dets = [{"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][0]), "score": 0.9},
                {"image_id": 0, "category_id": 1,
                 "segmentation": make_rle((80, 80, 10, 10)), "score": 0.95},
                {"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][1]), "score": 0.8},
                {"image_id": 1, "category_id": 1,
                 "segmentation": make_rle(boxes[1][0]), "score": 0.7}]
        E = run_eval(gt, dets)
        # PR points: fp, tp(r=1/3, p=1/2), tp(r=2/3, p=2/3), tp(r=1, p=3/4)
        pr = np.zeros(101)
        rec = np.linspace(0, 1, 101)
        # interpolated precision: max precision at recall >= r
        pr[rec <= 1 / 3] = 3 / 4
        pr[(rec > 1 / 3) & (rec <= 2 / 3)] = 3 / 4
        pr[(rec > 2 / 3) & (rec <= 1.0)] = 3 / 4
        want = pr.mean()
        assert E.stats[1] == pytest.approx(want, abs=1e-6)

    def test_crowd_gt_absorbs_detection(self):
        # detection overlapping a crowd GT is neither TP nor FP
        gt, boxes = gt_dataset()
        gt["annotations"].append({
            "id": 99, "image_id": 1, "category_id": 1,
            "segmentation": make_rle((60, 60, 30, 30)), "iscrowd": 1,
            "area": 900, "ignore": 0, "bbox": [60, 60, 30, 30]})
        dets = [{"image_id": 1, "category_id": 1,
                 "segmentation": make_rle(boxes[1][0]), "score": 0.9},
                {"image_id": 1, "category_id": 1,
                 "segmentation": make_rle((62, 62, 20, 20)), "score": 0.8},
                {"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][0]), "score": 0.9},
                {"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][1]), "score": 0.9}]
        E = run_eval(gt, dets)
        assert E.stats[1] == pytest.approx(1.0)

    def test_low_iou_detection_counts_only_at_loose_thresholds(self):
        gt, boxes = gt_dataset()
        # shifted box: IoU vs (10,10,20,20) box = overlap 10x20 / union
        dets = [{"image_id": 0, "category_id": 1,
                 "segmentation": make_rle((10, 20, 20, 20)), "score": 0.9}]
        E = run_eval(gt, dets)
        # IoU = 200/600 = 0.33 -> below every threshold: AP 0
        assert E.stats[0] == pytest.approx(0.0)

    def test_maxdets_truncation(self):
        gt, boxes = gt_dataset()
        dets = [{"image_id": 0, "category_id": 1,
                 "segmentation": make_rle(boxes[0][i % 2]),
                 "score": 0.5 + 0.01 * i} for i in range(8)]
        E = run_eval(gt, dets, max_dets=(1, 2, 100))
        assert np.isfinite(E.stats).all()


class TestCOCOUtilitySurface:
    """The vendored API's utility methods (reference coco.py:240-390):
    showAnns rendering, download, info, and Nx7-array results."""

    def test_load_numpy_annotations_and_ndarray_res(self):
        gt, boxes = gt_dataset()
        coco = COCO(gt)
        rows = np.array([[0, 10.0, 10.0, 20.0, 20.0, 0.9, 1],
                         [1, 5.0, 5.0, 40.0, 40.0, 0.8, 1]])
        anns = coco.loadNumpyAnnotations(rows)
        assert anns[0]["image_id"] == 0 and anns[0]["category_id"] == 1
        assert anns[1]["bbox"] == [5.0, 5.0, 40.0, 40.0]
        # loadRes accepts the ndarray directly (reference coco.py:305-306)
        res = coco.loadRes(rows)
        assert len(res.anns) == 2
        assert res.anns[1]["iscrowd"] == 0 and "segmentation" in res.anns[1]

    def test_show_anns_renders_patches_and_masks(self):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        import matplotlib.pyplot as plt
        gt, _ = gt_dataset()
        # add a polygon annotation alongside the RLE ones
        gt["annotations"].append(
            {"id": 99, "image_id": 0, "category_id": 1, "iscrowd": 0,
             "area": 100.0, "bbox": [0, 0, 10, 10],
             "segmentation": [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]]})
        coco = COCO(gt)
        fig, ax = plt.subplots()
        try:
            coco.showAnns(coco.loadAnns(coco.getAnnIds(imgIds=[0])))
            # 2 PatchCollections (fill + outline) + 2 RLE imshow overlays
            assert len(ax.collections) == 2
            assert len(ax.images) == 2
            assert coco.showAnns([]) == 0
        finally:
            plt.close(fig)

    def test_show_anns_captions_and_unsupported(self, capsys):
        coco = COCO({"images": [], "annotations": [], "categories": []})
        coco.showAnns([{"caption": "hello"}])
        assert "hello" in capsys.readouterr().out
        with pytest.raises(TypeError):
            coco.showAnns([{"id": 1}])

    def test_info_prints(self, capsys):
        coco = COCO({"info": {"year": 2026}, "images": [],
                     "annotations": [], "categories": []})
        coco.info()
        assert "year: 2026" in capsys.readouterr().out

    def test_download_file_urls(self, tmp_path):
        src = tmp_path / "img.png"
        src.write_bytes(b"fake")
        gt, _ = gt_dataset()
        gt["images"][0]["file_name"] = "img.png"
        gt["images"][0]["coco_url"] = f"file://{src}"
        coco = COCO(gt)
        out = tmp_path / "dl"
        assert coco.download(None) == -1
        coco.download(str(out), imgIds=[0])
        assert (out / "img.png").read_bytes() == b"fake"
