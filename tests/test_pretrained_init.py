"""Pretrained-encoder initialization for fresh training runs.

The reference *always* trains from an ImageNet-pretrained torchvision
backbone (reference: src/modules/model.py:25-34). rsis_tpu mirrors that via
``-torch_encoder <path>`` consumed at the trainer's fresh-start branch
(train/loop.py) through ``models.torch_import.init_encoder_from_torch``.

Covers both accepted layouts (torchvision backbone state_dict and reference
``encoder.pt`` FeatureExtractor), the .npz torch-free fallback, and — per
VERDICT r2 item 2 — an end-to-end trainer run asserting the imported
backbone params were actually used (not random init).
"""

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from rsis_tpu.config import Config
from rsis_tpu.models import torch_import as ti
from rsis_tpu.models.rsis import init_variables

from tests.torch_replica import BasicBlock, FeatureExtractor, ResNetTaps


def _sd_to_npz(sd, path):
    np.savez(path, **{k: v.detach().numpy() for k, v in sd.items()})


@pytest.fixture(scope="module")
def resnet34_sd():
    torch.manual_seed(0)
    return ResNetTaps(BasicBlock, (3, 4, 6, 3)).state_dict()


class TestInitEncoderFromTorch:
    def test_backbone_npz_replaces_base_only(self, resnet34_sd, tmp_path):
        path = str(tmp_path / "resnet34.npz")
        _sd_to_npz(resnet34_sd, path)
        cfg = Config(base_model="resnet34", hidden_size=16, num_classes=3,
                     imsize=32, maxseqlen=2, gt_maxseqlen=3, batch_size=2)
        fresh = init_variables(cfg, jax.random.PRNGKey(0))
        merged = ti.init_encoder_from_torch(path, "resnet34", fresh)

        want = resnet34_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        got = np.asarray(merged["params"]["encoder"]["base"]["conv1"]["kernel"])
        np.testing.assert_array_equal(got, want)
        # batch_stats come along for the backbone
        np.testing.assert_array_equal(
            np.asarray(merged["batch_stats"]["encoder"]["base"]["bn1"]["mean"]),
            resnet34_sd["bn1.running_mean"].numpy())
        # skip heads keep their fresh init, like the reference constructor
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["encoder"]["sk1"]["kernel"]),
            np.asarray(fresh["params"]["encoder"]["sk1"]["kernel"]))
        # input pytree not mutated
        assert not np.array_equal(
            np.asarray(fresh["params"]["encoder"]["base"]["conv1"]["kernel"]),
            want)
        # decoder untouched
        assert merged["params"]["decoder"] is fresh["params"]["decoder"]

    def test_torch_pt_file(self, resnet34_sd, tmp_path):
        path = str(tmp_path / "resnet34.pt")
        torch.save(resnet34_sd, path)
        cfg = Config(base_model="resnet34", hidden_size=16, num_classes=3,
                     imsize=32, maxseqlen=2, gt_maxseqlen=3, batch_size=2)
        fresh = init_variables(cfg, jax.random.PRNGKey(0))
        merged = ti.init_encoder_from_torch(path, "resnet34", fresh)
        want = resnet34_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["encoder"]["base"]["conv1"]["kernel"]),
            want)

    def test_reference_encoder_pt_layout(self, tmp_path):
        torch.manual_seed(1)
        enc = FeatureExtractor(ResNetTaps(BasicBlock, (3, 4, 6, 3)),
                               (512, 256, 128, 64, 64), hidden_size=16)
        path = str(tmp_path / "encoder.npz")
        _sd_to_npz(enc.state_dict(), path)
        cfg = Config(base_model="resnet34", hidden_size=16, num_classes=3,
                     imsize=32, maxseqlen=2, gt_maxseqlen=3, batch_size=2)
        fresh = init_variables(cfg, jax.random.PRNGKey(0))
        merged = ti.init_encoder_from_torch(path, "resnet34", fresh)
        # full FeatureExtractor layout: skip heads replaced too
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["encoder"]["sk1"]["kernel"]),
            enc.state_dict()["sk1.weight"].numpy().transpose(2, 3, 1, 0))

    def test_unknown_base_model_raises(self, resnet34_sd, tmp_path):
        path = str(tmp_path / "sd.npz")
        _sd_to_npz(resnet34_sd, path)
        cfg = Config(base_model="tiny", hidden_size=16, num_classes=3,
                     imsize=32, maxseqlen=2, gt_maxseqlen=3, batch_size=2)
        fresh = init_variables(cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="base_model"):
            ti.init_encoder_from_torch(path, "tiny", fresh)


class TestTrainerUsesPretrainedEncoder:
    def test_one_step_from_state_dict(self, resnet34_sd, tmp_path,
                                      monkeypatch):
        """E2E: a fresh trainer run with -torch_encoder trains from the
        imported backbone, not random init (VERDICT r2 item 2)."""
        from rsis_tpu.data import catalogs
        from rsis_tpu.train import Trainer

        path = str(tmp_path / "resnet34.npz")
        _sd_to_npz(resnet34_sd, path)

        orig = catalogs.SyntheticBlobs.__init__

        def small_init(self, c, **kw):
            kw["length"] = 2
            orig(self, c, **kw)

        monkeypatch.setattr(catalogs.SyntheticBlobs, "__init__", small_init)

        cfg = Config(
            dataset="synthetic", base_model="resnet34", hidden_size=16,
            num_classes=3, imsize=32, maxseqlen=2, gt_maxseqlen=3,
            batch_size=2, resize=True, max_epoch=1, print_every=1,
            models_root=str(tmp_path), model_name="pretrained", log_term=True,
            num_workers=0, finetune_after=-1,  # encoder stays frozen
            num_devices=1, torch_encoder=path)
        state = Trainer(cfg).run()

        want = resnet34_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        got = np.asarray(state.params["encoder"]["base"]["conv1"]["kernel"])
        # frozen encoder (finetune_after=-1) -> params still exactly the
        # imported weights after the step
        np.testing.assert_array_equal(got, want)
