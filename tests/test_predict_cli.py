"""End-to-end test of the generic prediction CLI (cli/predict.py).

A checkpoint is written directly (init + save, no trainer), then the CLI
runs on a directory of real PNG files and must produce label images and
a COCO-style predictions.json whose RLEs decode to the PNG contents.
"""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from rsis_tpu.config import Config
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.train.checkpoint import save_checkpoint
from rsis_tpu.train.step import create_train_state


@pytest.fixture()
def model_and_images(tmp_path):
    cfg = Config(base_model="tiny", hidden_size=16, num_classes=3,
                 imsize=32, maxseqlen=3, gt_maxseqlen=4, batch_size=2,
                 resize=True, models_root=str(tmp_path / "m"),
                 model_name="predcli")
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    save_checkpoint(cfg, state)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):  # 3 images, batch 2: exercises the padded tail
        arr = rng.integers(0, 255, (40 + 8 * i, 52, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    return cfg, str(img_dir), str(tmp_path / "out")


class TestPredictCLI:
    def test_end_to_end(self, model_and_images):
        from rsis_tpu.cli.predict import main

        cfg, img_dir, out_dir = model_and_images
        argv = ["-model_name", "predcli", "-models_root", cfg.models_root,
                "-predict_input", img_dir, "-predict_output", out_dir,
                "-batch_size", "2", "-imsize", "32", "--resize",
                "-maxseqlen", "3",
                # untrained model: accept everything so outputs exist
                "-stop_th", "-1.0", "-mask_th", "0.4", "-min_size", "0"]
        main(argv)

        pngs = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
        assert pngs == [f"im{i}_instances.png" for i in range(3)]
        with open(os.path.join(out_dir, "predictions.json")) as fp:
            anns = json.load(fp)
        assert anns, "no instances despite stop_th=-1"

        # label PNGs are at native size; instance pixels must agree with
        # the union of that image's decoded RLEs
        from rsis_tpu.kernels import mask as maskUtils
        for i in range(3):
            lab = np.asarray(Image.open(
                os.path.join(out_dir, f"im{i}_instances.png")))
            assert lab.shape == (40 + 8 * i, 52)
            im_anns = [a for a in anns if a["image_id"] == f"im{i}"]
            union = np.zeros_like(lab)
            for a in im_anns:
                rle = {"size": a["segmentation"]["size"],
                       "counts": a["segmentation"]["counts"]}
                m = maskUtils.decode(rle)
                assert m.shape == lab.shape
                union |= m
                x, y, w, h = a["bbox"]
                assert 0 <= x <= lab.shape[1] and 0 <= y <= lab.shape[0]
                assert 0.0 <= a["score"] <= 1.0
            # later instances overwrite earlier ones in the label image,
            # so the label's support is a subset of the RLE union and
            # every labeled pixel is covered
            np.testing.assert_array_equal((lab > 0) & (union == 0),
                                          np.zeros_like(lab, bool))

    def test_single_file_and_glob(self, model_and_images):
        from rsis_tpu.cli.predict import list_images

        _, img_dir, _ = model_and_images
        one = os.path.join(img_dir, "im0.png")
        assert list_images(one) == [one]
        assert len(list_images(os.path.join(img_dir, "im*.png"))) == 3
        assert list_images(os.path.join(img_dir, "nope*.png")) == []

    def test_missing_input_exits(self, model_and_images):
        from rsis_tpu.cli.predict import main

        cfg, _, _ = model_and_images
        with pytest.raises(SystemExit):
            main(["-model_name", "predcli",
                  "-models_root", cfg.models_root])
