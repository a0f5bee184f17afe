"""Dataset base: raw sample -> (image, packed target) pairs.

Re-design of the reference dataset base (reference:
src/dataloader/dataset.py:16-146): each sample yields a normalized float
image (H, W, 3) and a packed target tensor of shape
``(gt_maxseqlen, H*W + 3)`` whose columns are [flattened per-instance binary
masks | class id | mask sample-weight | class sample-weight]. Instances are
sorted by descending pixel area and truncated/padded to ``gt_maxseqlen``;
the first padding slot keeps class weight 1 so the model learns the <eos>
class (reference: src/dataloader/dataset.py:137-141).

Host-side geometry (resize / flip / crop / fused affine) runs in NumPy; the
packed layout is what the jitted train step consumes after
:func:`unpack_target`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .augment import RandomAffine, horizontal_flip, random_crop

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 normalized with ImageNet stats."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def resize_image(img: Image.Image, imsize: int, square: bool) -> Image.Image:
    """PIL bilinear resize: square iff ``square`` else shorter side=imsize."""
    if square:
        return img.resize((imsize, imsize), Image.BILINEAR)
    w, h = img.size
    if w < h:
        nw, nh = imsize, max(1, round(imsize * h / w))
    else:
        nh, nw = imsize, max(1, round(imsize * w / h))
    return img.resize((nw, nh), Image.BILINEAR)


def resize_masks_nearest(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbour (H0, W0) -> (h, w), matching scipy order-0 zoom."""
    ri = np.minimum((np.arange(h) * (mask.shape[0] / h)).round(),
                    mask.shape[0] - 1).astype(np.int64)
    ci = np.minimum((np.arange(w) * (mask.shape[1] / w)).round(),
                    mask.shape[1] - 1).astype(np.int64)
    return mask[np.ix_(ri, ci)]


def sequence_from_masks(ins: np.ndarray, seg: np.ndarray,
                        max_seq_len: int, native: bool = True
                        ) -> np.ndarray:
    """Split an instance map into the packed per-instance target tensor.

    The hot path (``native=True``) runs the C++ single-pass builder
    (kernels/_binding.pack_target, ~100x this numpy implementation, which
    is kept as the oracle/reference and for exotic dtypes). Equal-area
    instances may order differently between the two (numpy's argsort tie
    order is unspecified; any order is a valid target permutation).
    """
    if native:
        try:
            from ..kernels._binding import pack_target
            if (np.issubdtype(ins.dtype, np.integer)
                    and np.issubdtype(seg.dtype, np.integer)
                    and int(np.max(seg, initial=0)) <= 255):
                return pack_target(ins, seg, max_seq_len
                                   ).astype(np.float32)
        except Exception:
            pass
    h, w = ins.shape
    instance_ids = np.unique(ins)
    instance_ids = instance_ids[instance_ids != 0]
    total = len(instance_ids)

    n = max(max_seq_len, total)
    gt_classes = np.zeros((n, 1), dtype=np.float32)
    gt_seg = np.zeros((n, h * w), dtype=np.float32)
    sizes = np.zeros((n,), dtype=np.float32)
    sw_mask = np.zeros((n, 1), dtype=np.float32)
    sw_class = np.zeros((n, 1), dtype=np.float32)

    for i, inst_id in enumerate(instance_ids):
        sel = ins == inst_id
        class_ids = np.unique(seg[sel])
        gt_classes[i] = float(class_ids[0])
        m = sel.astype(np.float32).reshape(-1)
        gt_seg[i] = m
        sizes[i] = m.sum()
        sw_mask[i] = 1.0
        sw_class[i] = 1.0

    order = np.argsort(sizes)[::-1]
    gt_classes = gt_classes[order][:max_seq_len]
    gt_seg = gt_seg[order][:max_seq_len]
    sw_mask = sw_mask[order][:max_seq_len]
    sw_class = sw_class[order][:max_seq_len]

    if max_seq_len > total:
        gt_classes[total:] = 0.0
        gt_seg[total:] = 0.0
        sw_class[total] = 1.0  # <eos> slot trains the class head

    return np.concatenate([gt_seg, gt_classes, sw_mask, sw_class], axis=1)


def unpack_target(targets: np.ndarray):
    """(B, N, H*W+3) -> (y_mask, y_class, sw_mask, sw_class).

    Mirrors ``batch_to_var`` (reference: src/utils/utils.py:113-127).
    """
    y_mask = targets[:, :, :-3]
    y_class = targets[:, :, -3].astype(np.int32)
    sw_mask = targets[:, :, -2]
    sw_class = targets[:, :, -1]
    return y_mask, y_class, sw_mask, sw_class


class InstanceDataset:
    """Base class; subclasses implement file discovery and get_raw_sample."""

    classes: Sequence[str] = ()

    def __init__(self, cfg, split: str = "train", augment: bool = False,
                 imsize: int = 256, resize: bool = False,
                 crop: bool = False, seed: int = 0,
                 wire_dtype: str = "float32"):
        self.cfg = cfg
        self.split = split
        self.imsize = imsize
        self.resize = resize
        self.crop = crop
        self.flip = augment
        self.max_seq_len = cfg.gt_maxseqlen
        # "uint8": raw resized pixels + uint8 packed targets cross the
        # host->device boundary (4x less transfer) and normalization /
        # unpacking runs on device (train/step.decode_batch)
        self.wire_dtype = wire_dtype
        self.rng = np.random.default_rng(seed)
        if augment:
            zoom = (None if (not resize and cfg.dataset != "pascal")
                    else ((cfg.zoom, max(cfg.zoom * 2, 1.0))
                          if cfg.dataset == "pascal" else (cfg.zoom, 1.0)))
            self.affine: Optional[RandomAffine] = RandomAffine(
                rotation_range=cfg.rotation,
                translation_range=cfg.translation,
                shear_range=cfg.shear,
                zoom_range=zoom,
                interp="nearest",
                rng=self.rng)
        else:
            self.affine = None

    # -- subclass API -------------------------------------------------------
    def get_raw_sample(self, index: int):
        raise NotImplementedError

    def get_sample_list(self):
        return self.image_files  # type: ignore[attr-defined]

    def get_classes(self):
        return list(self.classes)

    def __len__(self):
        return len(self.image_files)  # type: ignore[attr-defined]

    # -- pipeline -----------------------------------------------------------
    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        img, ins, seg = self.get_raw_sample(index)
        img = resize_image(img, self.imsize, square=self.resize)
        raw_u8 = np.asarray(img, dtype=np.uint8)
        img = (raw_u8 if self.wire_dtype == "uint8"
               else normalize_image(raw_u8))
        h, w = img.shape[:2]

        ins = resize_masks_nearest(np.asarray(ins), h, w)
        seg = resize_masks_nearest(np.asarray(seg), h, w)

        img_chw = np.moveaxis(img, -1, 0)
        if self.flip and self.rng.random() < 0.5:
            img_chw, ins, seg = horizontal_flip([img_chw, ins, seg])
        if self.crop:
            img_chw, ins, seg = random_crop(
                [img_chw, ins, seg], (self.imsize, self.imsize), self.rng)
        if self.affine is not None:
            img_chw, ins, seg = self.affine(img_chw, ins, seg)

        out_img = np.moveaxis(img_chw, 0, -1)
        if self.wire_dtype == "uint8":
            assert int(np.max(seg, initial=0)) <= 255, \
                "class id exceeds uint8 wire"
            try:
                from ..kernels._binding import pack_target
                target = pack_target(np.asarray(ins), np.asarray(seg),
                                     self.max_seq_len)
            except Exception:
                target = sequence_from_masks(
                    ins.astype(np.int64), seg.astype(np.int64),
                    self.max_seq_len, native=False).astype(np.uint8)
            return out_img.astype(np.uint8), target
        target = sequence_from_masks(ins.astype(np.int64),
                                     seg.astype(np.int64), self.max_seq_len)
        return out_img.astype(np.float32), target
