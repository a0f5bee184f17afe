"""COCO-format annotation index.

A clean reimplementation of the vendored COCO API's Python side (reference:
src/coco/PythonAPI/pycocotools/coco.py:65-426) on top of the rsis_tpu native
RLE kernels — only the parts the RSIS evaluation pipeline exercises:
index construction, id queries, ``loadRes`` for building a result COCO from
annotation dicts, and ann -> RLE/mask conversion.
"""

from __future__ import annotations

import copy
import json
import time
from collections import defaultdict

import numpy as np

from ..kernels import mask as maskUtils


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.anns = {}
        self.imgToAnns = defaultdict(list)
        self.catToImgs = defaultdict(list)
        self.imgs = {}
        self.cats = {}
        if annotation_file is not None:
            if isinstance(annotation_file, dict):
                self.dataset = annotation_file
            else:
                with open(annotation_file) as fp:
                    self.dataset = json.load(fp)
            assert isinstance(self.dataset, dict)
            self.createIndex()

    def createIndex(self):
        anns, cats, imgs = {}, {}, {}
        imgToAnns = defaultdict(list)
        catToImgs = defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            imgToAnns[ann["image_id"]].append(ann)
            anns[ann["id"]] = ann
        for img in self.dataset.get("images", []):
            imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            catToImgs[ann["category_id"]].append(ann["image_id"])
        self.anns = anns
        self.imgToAnns = imgToAnns
        self.catToImgs = catToImgs
        self.imgs = imgs
        self.cats = cats

    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None):
        imgIds = imgIds if isinstance(imgIds, list) else [imgIds]
        catIds = catIds if isinstance(catIds, list) else [catIds]
        if len(imgIds) == len(catIds) == len(areaRng) == 0:
            anns = self.dataset.get("annotations", [])
        else:
            if len(imgIds) > 0:
                lists = [self.imgToAnns[i] for i in imgIds
                         if i in self.imgToAnns]
                anns = [a for lst in lists for a in lst]
            else:
                anns = self.dataset.get("annotations", [])
            if len(catIds) > 0:
                anns = [a for a in anns if a["category_id"] in catIds]
            if len(areaRng) > 0:
                anns = [a for a in anns
                        if areaRng[0] < a["area"] < areaRng[1]]
        if iscrowd is not None:
            anns = [a for a in anns if a.get("iscrowd", 0) == iscrowd]
        return [a["id"] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]):
        cats = self.dataset.get("categories", [])
        if catNms:
            cats = [c for c in cats if c.get("name") in catNms]
        if supNms:
            cats = [c for c in cats if c.get("supercategory") in supNms]
        if catIds:
            cats = [c for c in cats if c["id"] in catIds]
        return [c["id"] for c in cats]

    def getImgIds(self, imgIds=[], catIds=[]):
        imgIds = imgIds if isinstance(imgIds, list) else [imgIds]
        catIds = catIds if isinstance(catIds, list) else [catIds]
        if len(imgIds) == len(catIds) == 0:
            ids = set(self.imgs.keys())
        else:
            ids = set(imgIds) if imgIds else set(self.imgs.keys())
            for i, cid in enumerate(catIds):
                cat_imgs = set(self.catToImgs[cid])
                ids = cat_imgs if (i == 0 and not imgIds) else ids & cat_imgs
        return list(ids)

    def loadAnns(self, ids=[]):
        ids = ids if isinstance(ids, list) else [ids]
        return [self.anns[i] for i in ids]

    def loadCats(self, ids=[]):
        ids = ids if isinstance(ids, list) else [ids]
        return [self.cats[i] for i in ids]

    def loadImgs(self, ids=[]):
        ids = ids if isinstance(ids, list) else [ids]
        return [self.imgs[i] for i in ids]

    def loadRes(self, resFile):
        """Build a result COCO object from a result file / list of dicts
        (reference: coco.py:292-356)."""
        res = COCO()
        res.dataset["images"] = [img for img in
                                 self.dataset.get("images", [])]
        if isinstance(resFile, str):
            with open(resFile) as fp:
                anns = json.load(fp)
        elif isinstance(resFile, np.ndarray):
            raise TypeError("ndarray results not supported; pass dicts")
        else:
            anns = resFile
        assert isinstance(anns, list), "results must be a list"
        if len(anns) == 0:
            res.dataset["categories"] = copy.deepcopy(
                self.dataset.get("categories", []))
            res.dataset["annotations"] = []
            res.createIndex()
            return res
        annsImgIds = [ann["image_id"] for ann in anns]
        assert set(annsImgIds) == (set(annsImgIds) & set(self.getImgIds())), \
            "Results do not correspond to current coco set"
        # branch order and side effects mirror the reference exactly
        # (reference coco.py:313-348): bbox results take the bbox branch
        # even when a segmentation is also present (area from the box,
        # polygon fill), and bbox/segm results force iscrowd=0.
        if "caption" in anns[0]:
            img_ids = ({img["id"] for img in res.dataset["images"]}
                       & {ann["image_id"] for ann in anns})
            res.dataset["images"] = [img for img in res.dataset["images"]
                                     if img["id"] in img_ids]
            for aid, ann in enumerate(anns):
                ann["id"] = aid + 1
            res.dataset["annotations"] = anns
            res.createIndex()
            return res
        res.dataset["categories"] = copy.deepcopy(
            self.dataset.get("categories", []))
        if "bbox" in anns[0] and anns[0]["bbox"] != []:
            for aid, ann in enumerate(anns):
                bb = ann["bbox"]
                x1, x2, y1, y2 = bb[0], bb[0] + bb[2], bb[1], bb[1] + bb[3]
                if "segmentation" not in ann:
                    ann["segmentation"] = [[x1, y1, x1, y2, x2, y2, x2, y1]]
                ann["area"] = bb[2] * bb[3]
                ann["id"] = aid + 1
                ann["iscrowd"] = 0
        elif "segmentation" in anns[0]:
            for aid, ann in enumerate(anns):
                ann["area"] = float(maskUtils.area(ann["segmentation"]))
                if "bbox" not in ann:
                    ann["bbox"] = maskUtils.toBbox(
                        ann["segmentation"]).tolist()
                ann["id"] = aid + 1
                ann["iscrowd"] = 0
        elif "keypoints" in anns[0]:
            for aid, ann in enumerate(anns):
                s = ann["keypoints"]
                x, y = s[0::3], s[1::3]
                x0, x1 = min(x), max(x)
                y0, y1 = min(y), max(y)
                ann["area"] = (x1 - x0) * (y1 - y0)
                ann["id"] = aid + 1
                ann["bbox"] = [x0, y0, x1 - x0, y1 - y0]
        res.dataset["annotations"] = anns
        res.createIndex()
        return res

    def info(self):
        for k, v in self.dataset.get("info", {}).items():
            print(f"{k}: {v}")

    def loadNumpyAnnotations(self, data):
        """Nx7 ndarray -> list of result dicts (bbox format)."""
        assert data.shape[1] == 7
        out = []
        for row in data:
            out.append({"image_id": int(row[0]),
                        "bbox": [row[1], row[2], row[3], row[4]],
                        "score": float(row[5]),
                        "category_id": int(row[6])})
        return out

    def annToRLE(self, ann):
        """Convert polygon / uncompressed RLE / RLE annotation to RLE."""
        img = self.imgs[ann["image_id"]]
        h, w = img["height"], img["width"]
        segm = ann["segmentation"]
        if isinstance(segm, list):
            rles = maskUtils.frPyObjects(segm, h, w)
            return maskUtils.merge(rles)
        if isinstance(segm.get("counts"), list):
            return maskUtils.frPyObjects(segm, h, w)
        return segm

    def annToMask(self, ann):
        return maskUtils.decode(self.annToRLE(ann))
