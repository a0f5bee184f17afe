"""End-to-end slice: train on synthetic data -> checkpoint -> resume ->
inference -> exporters -> SBD. Proves the whole loop per SURVEY.md §7 step 4.
"""

import os

import numpy as np
import pytest
import jax

from rsis_tpu.config import Config
from rsis_tpu.evals.cvppp import evaluate_batch
from rsis_tpu.evals.exporters import LeavesExporter
from rsis_tpu.evals.forward import run_forward
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.train import (
    Trainer, checkpoint_exists, create_train_state, load_checkpoint,
    save_checkpoint)
from rsis_tpu.utils.plot_curves import parse_train_log


@pytest.fixture()
def cfg(tmp_path):
    return Config(
        dataset="synthetic", base_model="tiny", hidden_size=16,
        num_classes=3, imsize=32, maxseqlen=3, gt_maxseqlen=5,
        batch_size=4, resize=True, max_epoch=2, print_every=1,
        models_root=str(tmp_path), model_name="e2e", log_term=True,
        num_workers=2, finetune_after=1, class_loss_after=0,
        stop_loss_after=0, num_devices=1)


class TestEndToEnd:
    def test_train_checkpoint_resume_eval(self, cfg, capsys, monkeypatch):
        # keep the synthetic dataset tiny
        from rsis_tpu.data import catalogs

        orig = catalogs.SyntheticBlobs.__init__

        def small_init(self, c, **kw):
            kw["length"] = 8
            orig(self, c, **kw)

        monkeypatch.setattr(catalogs.SyntheticBlobs, "__init__", small_init)

        state = Trainer(cfg).run()
        out = capsys.readouterr().out
        assert "Epoch 0" in out
        assert "iter 0:" in out
        # log line format parseable (the format is an API)
        log_path = os.path.join(cfg.models_root, "logcheck.log")
        with open(log_path, "w") as fp:
            fp.write(out)
        curves = parse_train_log(log_path)
        assert len(curves["train"]["total"]) == 2
        assert len(curves["val"]["total"]) == 2

        # checkpoint written (best val)
        assert checkpoint_exists(cfg)

        # resume restores state exactly
        variables = init_variables(cfg, jax.random.PRNGKey(cfg.seed))
        template = create_train_state(cfg, variables)
        restored, saved_cfg = load_checkpoint(cfg, template)
        assert saved_cfg.model_name == "e2e"
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(jax.device_get(state.params))):
            assert a.shape == np.asarray(b).shape

        # resumed training must continue the absolute epoch numbering in
        # the parseable log grammar (not restart at 0 and overlap the old
        # curve in plot_curves)
        Trainer(cfg.replace(resume=True, max_epoch=1)).run()
        out2 = capsys.readouterr().out
        resumed_epochs = sorted({
            int(ln.split(":")[0].split()[1]) for ln in out2.splitlines()
            if ln.startswith("Epoch") and ":" in ln.split()[1] + ":"
            and "\t" in ln})
        assert resumed_epochs and min(resumed_epochs) >= 1, out2

        # inference forward on the trained weights
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}
        x = np.random.default_rng(0).normal(
            size=(2, 32, 32, 3)).astype(np.float32)
        masks, clss, stops = run_forward(cfg, variables, x)
        assert masks.shape == (2, 3, 32, 32)
        assert clss.shape == (2, 3, 3)
        assert stops.shape == (2, 3, 1)
        assert np.isfinite(masks).all()
        assert (masks >= 0).all() and (masks <= 1).all()

    def test_leaves_exporter_and_sbd(self, cfg, tmp_path, monkeypatch):
        from rsis_tpu.data import catalogs

        orig = catalogs.SyntheticBlobs.__init__

        def small_init(self, c, **kw):
            kw["length"] = 4
            orig(self, c, **kw)

        monkeypatch.setattr(catalogs.SyntheticBlobs, "__init__", small_init)

        variables = init_variables(cfg, jax.random.PRNGKey(0))
        ds = catalogs.SyntheticBlobs(cfg, split="val", imsize=cfg.imsize,
                                     num_classes=cfg.num_classes)
        exp = LeavesExporter(cfg.replace(class_th=0.0), variables,
                             dataset=ds)
        written = exp.export(str(tmp_path / "results"))
        assert len(written) == 4
        preds = exp.predicted_labels()
        assert len(preds) == 4
        # SBD of predictions vs the synthetic GT instance maps runs clean
        gts = [np.asarray(ds.get_raw_sample(i)[1]) for i in range(4)]
        res = evaluate_batch(list(preds.values()), gts)
        assert 0.0 <= res["SBD"] <= 1.0
        assert res["n"] == 4


class TestTransfer:
    def test_transfer_swaps_class_head(self, cfg, monkeypatch):
        import jax
        from rsis_tpu.data import catalogs
        from rsis_tpu.train.loop import Trainer

        orig = catalogs.SyntheticBlobs.__init__

        def small_init(self, c, **kw):
            kw["length"] = 8
            orig(self, c, **kw)

        monkeypatch.setattr(catalogs.SyntheticBlobs, "__init__", small_init)

        # train the source model (dataset "synthetic")
        src_cfg = cfg.replace(model_name="src", max_epoch=1)
        Trainer(src_cfg).run()

        # transfer to a new "dataset" with a different class count
        dst_cfg = cfg.replace(model_name="dst", transfer=True,
                              transfer_from="src", num_classes=5,
                              max_epoch=1, dataset="synthetic")
        # force a dataset-name mismatch so fc_class is swapped
        import rsis_tpu.train.loop as looper
        from rsis_tpu.config import Config as Cfg
        saved = Cfg.load(f"{cfg.models_root}/src/args.json")
        saved = saved.replace(dataset="leaves")
        saved.save(f"{cfg.models_root}/src/args.json")

        state = Trainer(dst_cfg).run()
        fc = jax.device_get(state.params["decoder"]["fc_class"]["kernel"])
        assert fc.shape[-1] == 5
