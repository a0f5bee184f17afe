"""Dataset catalogs: PascalVOC(+SBD), Cityscapes, CVPPP leaves, synthetic.

File discovery, class tables and id remapping follow the reference datasets
(reference: src/dataloader/pascal.py, cityscapes.py, leaves.py); the sample
pipeline lives in base.InstanceDataset.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from .base import InstanceDataset

PASCAL_CLASSES = ["<eos>", "airplane", "bicycle", "bird", "boat",
                  "bottle", "bus", "car", "cat", "chair",
                  "cow", "dining table", "dog", "horse",
                  "motorcycle", "person", "potted plant",
                  "sheep", "sofa", "train", "tv"]

CITYSCAPES_CLASSES = ["<eos>", "person", "rider", "car", "truck", "bus",
                      "train", "motorcycle", "bicycle"]

LEAVES_CLASSES = ["<eos>", "leaf"]

# official cityscapes label ids of the 8 trained instance classes
# (reference: src/eval_cityscapes.py:110)
CITYSCAPES_LABEL_IDS = [24, 25, 26, 27, 28, 31, 32, 33]


class PascalVOC(InstanceDataset):
    """Pascal VOC 2012 (+SBD) with precomputed (H, W, 2) seg/ins .npy masks
    (reference: src/dataloader/pascal.py:68-78; masks from
    tools/pascal_precompute.py)."""

    classes = PASCAL_CLASSES

    def __init__(self, cfg, split="train", augment=False, imsize=256,
                 resize=False, seed=0):
        crop = cfg.batch_size > 1
        super().__init__(cfg, split=split, augment=augment, imsize=imsize,
                         resize=resize, crop=crop, seed=seed)
        self.image_dir = os.path.join(cfg.pascal_dir, "JPEGImages")
        self.masks_dir = os.path.join(cfg.pascal_dir, "ProcMasks")
        split_f = os.path.join(cfg.pascal_dir, "ImageSets", "Segmentation",
                               split + ".txt")
        with open(split_f) as fp:
            self.image_files = [ln.strip() for ln in fp if ln.strip()]
        self.no_run_coco_eval = False

    def get_raw_sample(self, index):
        name = self.image_files[index]
        img = Image.open(os.path.join(self.image_dir,
                                      name + ".jpg")).convert("RGB")
        mask = np.load(os.path.join(self.masks_dir, name + ".npy"))
        ins = mask[:, :, 1]
        seg = mask[:, :, 0]
        return img, ins, seg


class CityScapes(InstanceDataset):
    """Cityscapes gtFine instance segmentation, 8 classes + <eos>.

    Label remapping mirrors the reference (reference:
    src/dataloader/cityscapes.py:58-92): label ids 24-28,31-33 map to 1..8,
    caravan(29)/trailer(30) are dropped, instance ids renumber densely.
    """

    classes = CITYSCAPES_CLASSES

    def __init__(self, cfg, split="train", augment=False, imsize=256,
                 resize=False, seed=0):
        super().__init__(cfg, split=split, augment=augment, imsize=imsize,
                         resize=resize, crop=cfg.crop, seed=seed)
        self.image_files = sorted(glob.glob(os.path.join(
            cfg.cityscapes_dir, "leftImg8bit", split, "*", "*.png")))
        self.ins_files = [
            f.replace("/leftImg8bit/", "/gtFine/")
            .replace("_leftImg8bit.png", "_gtFine_instanceIds.png")
            for f in self.image_files]
        self.no_run_coco_eval = True

    def get_raw_sample(self, index):
        img = Image.open(self.image_files[index]).convert("RGB")
        ins = np.array(Image.open(self.ins_files[index]), dtype=np.int64)
        seg = ins // 1000  # label id of instance pixels; 0 for crowd/stuff
        # drop caravan & trailer, then remap 24..28,31..33 -> 1..8
        seg[(seg == 29) | (seg == 30)] = 0
        seg[seg > 0] -= 23
        seg[seg == 8] = 6
        seg[seg == 9] = 7
        seg[seg == 10] = 8
        valid = (seg > 0).astype(ins.dtype)
        ins = ins * valid
        ins[ins < 24000] = 0
        # dense renumbering of surviving instance ids (0 stays background)
        ids = np.unique(ins)
        lut = {v: i for i, v in enumerate(ids)}
        ins = np.vectorize(lut.get, otypes=[np.int64])(ins)
        return img, ins, seg


class LeavesDataset(InstanceDataset):
    """CVPPP A1 leaf segmentation: 2 classes, deterministic 96/rest split
    (reference: src/dataloader/leaves.py:73-92)."""

    classes = LEAVES_CLASSES

    def __init__(self, cfg, split="train", augment=False, imsize=256,
                 resize=False, seed=0):
        crop = cfg.batch_size > 1
        super().__init__(cfg, split=split, augment=augment, imsize=imsize,
                         resize=resize, crop=crop, seed=seed)
        all_images = sorted(glob.glob(os.path.join(cfg.leaves_dir,
                                                   "*_rgb.png")))
        all_gt = [f.replace("_rgb", "_label") for f in all_images]
        if split == "train":
            self.image_files = all_images[:96]
            self.gt_files = all_gt[:96]
        elif split == "val":
            self.image_files = all_images[96:]
            self.gt_files = all_gt[96:]
        else:  # test: separate dir, no GT
            self.image_files = sorted(glob.glob(os.path.join(
                cfg.leaves_test_dir, "*_rgb.png")))
            self.gt_files = []
        self.no_run_coco_eval = True

    def get_raw_sample(self, index):
        img = Image.open(self.image_files[index]).convert("RGB")
        if self.split == "test":
            fake = np.zeros(np.asarray(img).shape[:2], dtype=np.int64)
            return img, fake, fake
        gt = np.array(Image.open(self.gt_files[index]), dtype=np.int64)
        ins = gt.copy()
        seg = (gt > 0).astype(np.int64)
        return img, ins, seg


class SyntheticBlobs(InstanceDataset):
    """Procedural instance maps for tests and benchmarks (no disk needed)."""

    def __init__(self, cfg, split="train", augment=False, imsize=64,
                 resize=True, seed=0, length=16, num_classes=None,
                 max_instances=4, wire_dtype="float32"):
        super().__init__(cfg, split=split, augment=augment, imsize=imsize,
                         resize=resize, crop=False, seed=seed,
                         wire_dtype=wire_dtype)
        n_cls = num_classes or cfg.num_classes
        self.classes = ["<eos>"] + [f"class{i}" for i in range(1, n_cls)]
        self.image_files = [f"synthetic_{split}_{i:04d}" for i in range(length)]
        self.max_instances = max_instances
        self.no_run_coco_eval = True
        self._sample_rng = np.random.default_rng(seed + hash(split) % 1000)
        self._cache = {}

    # per-split seed offsets so val/test content differs from train
    # (a shared 10_000+index seed made val a verbatim copy of train,
    # which turns the val curve into a train-loss echo)
    _SPLIT_SEED = {"train": 0, "val": 50_000, "test": 100_000}

    def get_raw_sample(self, index):
        if index in self._cache:
            return self._cache[index]
        rng = np.random.default_rng(
            10_000 + index + self._SPLIT_SEED.get(self.split, 0))
        s = self.imsize
        img = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
        ins = np.zeros((s, s), dtype=np.int64)
        seg = np.zeros((s, s), dtype=np.int64)
        n = int(rng.integers(1, self.max_instances + 1))
        yy, xx = np.ogrid[:s, :s]
        for i in range(1, n + 1):
            cy, cx = rng.integers(0, s, 2)
            ry, rx = rng.integers(s // 8, s // 3, 2)
            blob = (((yy - cy) / max(ry, 1)) ** 2
                    + ((xx - cx) / max(rx, 1)) ** 2) <= 1
            cls = int(rng.integers(1, len(self.classes)))
            ins[blob] = i
            seg[blob] = cls
            img[blob] = (img[blob] * 0.3
                         + np.array([60 * cls % 255] * 3) * 0.7).astype(
                             np.uint8)
        out = (Image.fromarray(img), ins, seg)
        self._cache[index] = out
        return out


DATASETS = {
    "pascal": PascalVOC,
    "cityscapes": CityScapes,
    "leaves": LeavesDataset,
    "synthetic": SyntheticBlobs,
}


def get_dataset(cfg, split: str, augment: bool = False,
                imsize: int | None = None, wire_dtype: str = "float32"):
    """Dataset factory (reference: src/dataloader/dataset_utils.py:7-24)."""
    cls = DATASETS[cfg.dataset]
    kwargs = {}
    if cls is SyntheticBlobs:
        kwargs["length"] = getattr(cfg, "synthetic_length", 16)
        kwargs["max_instances"] = getattr(cfg, "synthetic_max_instances", 4)
    ds = cls(cfg, split=split, augment=augment,
             imsize=imsize or cfg.imsize, resize=cfg.resize, seed=cfg.seed,
             **kwargs)
    ds.wire_dtype = wire_dtype
    return ds
