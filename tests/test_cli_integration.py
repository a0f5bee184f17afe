"""CLI integration tests over miniature on-disk dataset trees.

Builds real directory layouts (CVPPP A1, Cityscapes gtFine, Pascal VOCAug
with palette PNGs), then drives the actual CLI entry points: train ->
checkpoint -> eval/exporters -> metrics. This covers the file-discovery and
format code the unit tests can't reach.
"""

import os

import numpy as np
import pytest
from PIL import Image

from rsis_tpu.config import Config


def tiny_overrides(tmp_path, dataset, **extra):
    ov = dict(base_model="tiny", hidden_size=16, num_classes=2,
              imsize=32, maxseqlen=2, gt_maxseqlen=4, batch_size=2,
              max_epoch=1, print_every=1, models_root=str(tmp_path / "m"),
              log_term=True, num_workers=2, dataset=dataset,
              class_loss_after=0, stop_loss_after=0, finetune_after=0,
              num_devices=1, resize=True)
    ov.update(extra)
    return ov


def blob_image(rng, s=48, n=2):
    img = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
    ins = np.zeros((s, s), dtype=np.uint8)
    yy, xx = np.ogrid[:s, :s]
    for i in range(1, n + 1):
        cy, cx = rng.integers(8, s - 8, 2)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) <= rng.integers(16, 64)
        ins[blob] = i
    return img, ins


@pytest.fixture()
def leaves_tree(tmp_path):
    d = tmp_path / "A1"
    d.mkdir()
    rng = np.random.default_rng(0)
    # the split takes the first 96 files for train; make 98 so val has 2
    for i in range(98):
        img, ins = blob_image(rng)
        Image.fromarray(img).save(d / f"plant{i:03d}_rgb.png")
        Image.fromarray(ins).save(d / f"plant{i:03d}_label.png")
    return str(d)


class TestLeavesCLI:
    def test_train_then_eval_leaves(self, tmp_path, leaves_tree):
        from rsis_tpu.cli.train import main as train_main
        from rsis_tpu.cli.eval_leaves import main as eval_main

        ov = tiny_overrides(tmp_path, "leaves", leaves_dir=leaves_tree,
                            model_name="leavescli")
        argv = ["-model_name", "leavescli", "-dataset", "leaves",
                "-base_model", "tiny", "-hidden_size", "16",
                "-num_classes", "2", "-imsize", "32", "--resize",
                "-maxseqlen", "2", "-gt_maxseqlen", "4",
                "-batch_size", "2", "-max_epoch", "1", "-print_every", "1",
                "--log_term", "-num_workers", "2", "-leaves_dir",
                leaves_tree, "-models_root", str(tmp_path / "m"),
                "-class_loss_after", "0", "-stop_loss_after", "0",
                "-finetune_after", "0", "-num_devices", "1"]
        train_main(argv)
        ckpt = tmp_path / "m" / "leavescli" / "state.msgpack"
        assert ckpt.exists()

        eval_argv = ["-model_name", "leavescli", "-dataset", "leaves",
                     "-batch_size", "2", "-eval_split", "val",
                     "-class_th", "0.0", "-leaves_dir", leaves_tree,
                     "-models_root", str(tmp_path / "m"), "--log_term",
                     "-num_workers", "2"]
        eval_main(eval_argv)
        results = tmp_path / "m" / "leavescli" / "leavescli_results" / "A1"
        assert len(list(results.glob("*_label.png"))) == 2


@pytest.fixture()
def cityscapes_tree(tmp_path):
    root = tmp_path / "cs"
    rng = np.random.default_rng(1)
    for split in ["val"]:
        img_dir = root / "leftImg8bit" / split / "cityA"
        gt_dir = root / "gtFine" / split / "cityA"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            img, ins_small = blob_image(rng, s=64, n=2)
            # official encoding: instance ids = label_id*1000 + n for the
            # 8 instance classes; give both blobs class 24 (person)
            ins_ids = np.zeros((64, 64), dtype=np.int32)
            ins_ids[ins_small == 1] = 24000
            ins_ids[ins_small == 2] = 24001
            labels = np.where(ins_ids > 0, 24, 0).astype(np.uint8)
            name = f"cityA_{i:06d}_000019"
            Image.fromarray(img).save(
                img_dir / f"{name}_leftImg8bit.png")
            Image.fromarray(ins_ids, mode="I").save(
                gt_dir / f"{name}_gtFine_instanceIds.png")
            Image.fromarray(labels).save(
                gt_dir / f"{name}_gtFine_labelIds.png")
    return str(root)


class TestCityscapesCLI:
    def test_dataset_remapping(self, cityscapes_tree):
        from rsis_tpu.data.catalogs import CityScapes
        cfg = Config(dataset="cityscapes", cityscapes_dir=cityscapes_tree,
                     gt_maxseqlen=4, batch_size=1)
        ds = CityScapes(cfg, split="val", imsize=32, resize=True)
        assert len(ds) == 2
        img, ins, seg = ds.get_raw_sample(0)
        assert set(np.unique(seg)) <= {0, 1}   # person -> class 1
        assert len(np.unique(ins)) >= 2        # bg + instances

    def test_export_and_builtin_ap(self, tmp_path, cityscapes_tree):
        import jax
        from rsis_tpu.evals.cityscapes_ap import evaluate_exported
        from rsis_tpu.evals.exporters import CityscapesExporter
        from rsis_tpu.models.rsis import init_variables
        from rsis_tpu.data.catalogs import CityScapes

        cfg = Config(dataset="cityscapes", cityscapes_dir=cityscapes_tree,
                     base_model="tiny", hidden_size=16, num_classes=9,
                     imsize=32, maxseqlen=2, gt_maxseqlen=4, batch_size=2,
                     resize=True, eval_split="val", num_workers=2)
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        ds = CityScapes(cfg, split="val", imsize=32, resize=True)
        exporter = CityscapesExporter(cfg, variables, dataset=ds)
        written = exporter.export(str(tmp_path / "res"))
        assert len(written) == 2
        # every txt line points at an existing mask png
        with open(written[0]) as fp:
            lines = fp.read().strip().splitlines()
        assert len(lines) == 2 * 8  # T * 8 classes
        res = evaluate_exported(str(tmp_path / "res"), ds.ins_files,
                                [os.path.basename(p) for p in written])
        assert 0.0 <= res["allAp"] <= 1.0


@pytest.fixture()
def pascal_tree(tmp_path):
    from rsis_tpu.data.tools.palettes import pascal_palette
    root = tmp_path / "voc"
    for sub in ["JPEGImages", "SegmentationClass", "SegmentationObject",
                "ImageSets/Segmentation"]:
        (root / sub).mkdir(parents=True)
    inv = {v: k for k, v in pascal_palette().items()}
    rng = np.random.default_rng(2)
    names = []
    for i in range(3):
        name = f"2007_{i:06d}"
        names.append(name)
        img, ins = blob_image(rng, s=40, n=2)
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        seg_rgb = np.zeros((40, 40, 3), dtype=np.uint8)
        obj_rgb = np.zeros((40, 40, 3), dtype=np.uint8)
        seg_rgb[ins == 1] = inv[15]   # person
        seg_rgb[ins == 2] = inv[7]    # car
        obj_rgb[ins == 1] = inv[1]
        obj_rgb[ins == 2] = inv[2]
        Image.fromarray(seg_rgb).save(
            root / "SegmentationClass" / f"{name}.png")
        Image.fromarray(obj_rgb).save(
            root / "SegmentationObject" / f"{name}.png")
    for split in ["train", "val", "test"]:
        with open(root / "ImageSets/Segmentation" / f"{split}.txt",
                  "w") as fp:
            fp.write("\n".join(names) + "\n")
    return str(root)


class TestPascalPipeline:
    def test_precompute_then_dataset_then_eval(self, tmp_path, pascal_tree):
        import jax
        from rsis_tpu.data.tools.pascal_precompute import run as precompute
        from rsis_tpu.data.catalogs import PascalVOC
        from rsis_tpu.evals.evaluator import Evaluator
        from rsis_tpu.models.rsis import init_variables

        out = precompute(pascal_tree, "test")
        assert os.path.exists(out)
        assert os.path.exists(os.path.join(pascal_tree, "ProcMasks",
                                           "2007_000000.npy"))

        cfg = Config(dataset="pascal", pascal_dir=pascal_tree,
                     base_model="tiny", hidden_size=16, num_classes=21,
                     imsize=32, maxseqlen=2, gt_maxseqlen=4, batch_size=3,
                     resize=True, eval_split="test", num_workers=2,
                     stop_th=0.0, min_size=0.0)
        ds = PascalVOC(cfg, split="test", imsize=32, resize=True)
        assert len(ds) == 3
        img, tgt = ds[0]
        assert img.shape == (32, 32, 3)

        variables = init_variables(cfg, jax.random.PRNGKey(0))
        ev = Evaluator(cfg, variables, dataset=ds)
        assert ev.gt_anns is not None and len(ev.gt_anns) >= 6
        results = ev.run_eval()
        stats = np.asarray(results["stats"])
        assert stats.shape == (12,)
        assert ((stats >= -1) & (stats <= 1)).all()
