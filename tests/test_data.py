"""Tests for the data layer: packing, augmentation geometry, loader."""

import numpy as np
import pytest

from rsis_tpu.config import Config
from rsis_tpu.data import (
    DataLoader, SyntheticBlobs, sequence_from_masks, unpack_target)
from rsis_tpu.data.augment import (
    RandomAffine, affine_warp, random_crop, rotation_matrix,
    translation_matrix, zoom_matrix)


class TestSequenceFromMasks:
    def test_packing_layout(self):
        ins = np.zeros((4, 4), dtype=np.int64)
        ins[0:2, 0:2] = 1          # 4 px
        ins[2:4, 0:3] = 2          # 6 px (bigger -> sorted first)
        seg = np.zeros_like(ins)
        seg[ins == 1] = 3
        seg[ins == 2] = 5
        tgt = sequence_from_masks(ins, seg, max_seq_len=4)
        assert tgt.shape == (4, 16 + 3)
        y_mask, y_class, sw_mask, sw_class = unpack_target(tgt[None])
        # sorted by size: instance 2 first
        assert y_class[0, 0] == 5 and y_class[0, 1] == 3
        assert y_mask[0, 0].sum() == 6 and y_mask[0, 1].sum() == 4
        np.testing.assert_array_equal(sw_mask[0], [1, 1, 0, 0])
        # eos slot (first padding position) gets class weight 1
        np.testing.assert_array_equal(sw_class[0], [1, 1, 1, 0])
        # padded rows are zero
        assert y_mask[0, 2:].sum() == 0 and (y_class[0, 2:] == 0).all()

    def test_truncation_when_crowded(self):
        ins = np.arange(16).reshape(4, 4) % 5  # ids 0..4 -> 4 instances
        seg = (ins > 0).astype(np.int64)
        tgt = sequence_from_masks(ins.astype(np.int64), seg, max_seq_len=2)
        y_mask, y_class, sw_mask, sw_class = unpack_target(tgt[None])
        assert tgt.shape[0] == 2
        np.testing.assert_array_equal(sw_mask[0], [1, 1])
        # no eos slot when truncated
        np.testing.assert_array_equal(sw_class[0], [1, 1])

    def test_empty_instance_map(self):
        ins = np.zeros((4, 4), dtype=np.int64)
        seg = np.zeros_like(ins)
        tgt = sequence_from_masks(ins, seg, max_seq_len=3)
        y_mask, y_class, sw_mask, sw_class = unpack_target(tgt[None])
        assert sw_mask[0].sum() == 0
        np.testing.assert_array_equal(sw_class[0], [1, 0, 0])


class TestAffine:
    def test_identity(self):
        x = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
        out = affine_warp(x, np.eye(3), "bilinear")
        # the reference bilinear gather clamps coords to [0, size-2], so the
        # last row/col interpolate from their neighbours; interior is exact
        np.testing.assert_allclose(out[:, :-1, :-1], x[:, :-1, :-1],
                                   atol=1e-6)
        out_n = affine_warp(x, np.eye(3), "nearest")
        np.testing.assert_array_equal(out_n, x)

    def test_translation_shifts_content(self):
        x = np.zeros((8, 8), dtype=np.float32)
        x[4, 4] = 1.0
        # inverse warp: output(p) = input(M p + b); b=(2,0) samples 2 rows
        # down, moving content 2 rows UP
        m = translation_matrix(2.0, 0.0)
        out = affine_warp(x, m, "nearest")
        assert out[2, 4] == 1.0

    def test_rotation_90(self):
        x = np.zeros((9, 9), dtype=np.float32)
        x[1, 4] = 1.0  # top-center
        out = affine_warp(x, rotation_matrix(90.0), "nearest")
        # 90 deg rotation about center maps content consistently; energy kept
        assert out.sum() == 1.0
        assert out[1, 4] != 1.0 or True  # moved somewhere deterministic
        pos = np.argwhere(out == 1.0)[0]
        assert tuple(pos) in [(4, 1), (4, 7)]

    def test_zoom_out_preserves_center(self):
        x = np.zeros((9, 9), dtype=np.float32)
        x[4, 4] = 1.0
        out = affine_warp(x, zoom_matrix(2.0, 2.0), "nearest")
        assert out[4, 4] == 1.0

    def test_matches_reference_torch_gather_semantics(self):
        """Cross-check the full warp against a torch implementation of the
        reference th_affine2d (gather-based, clamped)."""
        import torch
        rng = np.random.default_rng(1)
        x = rng.random((2, 12, 10)).astype(np.float32)
        m = (rotation_matrix(17.0) @ translation_matrix(1.3, -2.1)
             @ zoom_matrix(0.8, 1.1))

        def torch_affine(x, matrix, mode):
            xt = torch.from_numpy(x)
            h, w = x.shape[-2:]
            rows, cols = torch.meshgrid(torch.arange(h, dtype=torch.float64),
                                        torch.arange(w, dtype=torch.float64),
                                        indexing="ij")
            coords = torch.stack([rows.reshape(-1) - (h / 2. - 0.5),
                                  cols.reshape(-1) - (w / 2. - 0.5)], -1)
            a = torch.from_numpy(matrix[:2, :2])
            b = torch.from_numpy(matrix[:2, 2])
            new = coords @ a.T + b
            new[:, 0] += h / 2. - 0.5
            new[:, 1] += w / 2. - 0.5
            flat = xt.reshape(x.shape[0], -1)
            if mode == "nearest":
                r = new[:, 0].clamp(0, h - 1).round().long()
                c = new[:, 1].clamp(0, w - 1).round().long()
                return flat[:, r * w + c].reshape(x.shape).numpy()
            r = new[:, 0].clamp(0, h - 2)
            c = new[:, 1].clamp(0, w - 2)
            r0, c0 = r.floor(), c.floor()
            rd, cd = (r - r0).float(), (c - c0).float()
            r0, c0 = r0.long(), c0.long()
            v00 = flat[:, r0 * w + c0]
            v10 = flat[:, (r0 + 1) * w + c0]
            v01 = flat[:, r0 * w + c0 + 1]
            v11 = flat[:, (r0 + 1) * w + c0 + 1]
            out = (v00 * (1 - rd) * (1 - cd) + v10 * rd * (1 - cd)
                   + v01 * (1 - rd) * cd + v11 * rd * cd)
            return out.reshape(x.shape).numpy()

        for mode in ["nearest", "bilinear"]:
            ours = affine_warp(x, m, mode)
            want = torch_affine(x, m, mode)
            np.testing.assert_allclose(ours, want, atol=1e-5)

    def test_random_affine_applies_same_matrix_to_all(self):
        rng = np.random.default_rng(3)
        aug = RandomAffine(rotation_range=30, translation_range=0.1,
                           shear_range=0.1, zoom_range=(0.8, 1.2),
                           rng=rng)
        img = np.zeros((3, 16, 16), dtype=np.float32)
        img[:, 4:12, 4:12] = 1.0
        ins = (img[0] > 0).astype(np.int64)
        seg = ins.copy()
        img2, ins2, seg2 = aug(img, ins, seg)
        # masks transformed with the same geometry as the image
        np.testing.assert_array_equal(ins2, seg2)
        np.testing.assert_allclose((img2[0] > 0.5).astype(np.int64), ins2)

    def test_random_crop_no_crash_and_shape(self):
        rng = np.random.default_rng(4)
        arrays = [np.random.random((3, 40, 60)), np.random.random((40, 60))]
        out = random_crop(arrays, (32, 32), rng)
        assert out[0].shape == (3, 32, 32)
        assert out[1].shape == (32, 32)


class TestLoaderAndSynthetic:
    def test_loader_shapes_and_determinism(self):
        cfg = Config(dataset="synthetic", batch_size=4, gt_maxseqlen=6,
                     imsize=32, num_classes=3, resize=True)
        ds = SyntheticBlobs(cfg, split="train", imsize=32, length=10,
                            num_classes=3)
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        imgs, tgts = batches[0]
        assert imgs.shape == (4, 32, 32, 3)
        assert tgts.shape == (4, 6, 32 * 32 + 3)
        # samples are deterministic per index
        a = ds[3]
        b = ds[3]
        np.testing.assert_array_equal(a[0], b[0])

    def test_augmented_synthetic(self):
        cfg = Config(dataset="synthetic", batch_size=2, gt_maxseqlen=4,
                     imsize=32, num_classes=3, resize=True, augment=True)
        ds = SyntheticBlobs(cfg, split="train", imsize=32, length=4,
                            num_classes=3, augment=True)
        img, tgt = ds[0]
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()


def test_random_choice_wrapper_family():
    """The reference's RandomChoice{Rotate,Translate,Shear,Zoom} surface:
    each must equal its fixed transform at the drawn value."""
    import numpy as np
    from rsis_tpu.data.augment import (
        Rotate, Shear, Translate, Zoom, RandomChoiceRotate,
        RandomChoiceShear, RandomChoiceTranslate, RandomChoiceZoom)

    img = np.random.default_rng(0).normal(size=(3, 20, 24)).astype(
        np.float32)
    rng = np.random.default_rng(5)
    deg = RandomChoiceRotate([7.0], rng=rng)(img)
    np.testing.assert_array_equal(deg, Rotate(7.0)(img))
    tr = RandomChoiceTranslate([(0.1, -0.05)], rng=rng)(img)
    np.testing.assert_array_equal(tr, Translate(0.1, -0.05)(img))
    sh = RandomChoiceShear([4.0], rng=rng)(img)
    np.testing.assert_array_equal(sh, Shear(4.0)(img))
    zm = RandomChoiceZoom([0.8], rng=rng)(img)
    np.testing.assert_array_equal(zm, Zoom(0.8)(img))
    # multi-value draw stays within the list
    outs = {RandomChoiceRotate([3.0, -3.0], rng=rng)(img).tobytes()
            for _ in range(8)}
    want = {Rotate(3.0)(img).tobytes(), Rotate(-3.0)(img).tobytes()}
    assert outs <= want and len(outs) >= 1
