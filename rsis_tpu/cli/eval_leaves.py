"""CVPPP label-image export + SBD/|DiC| scoring entry point
(reference: src/eval_leaves.py:136-139 plus src/CVPPP/evaluation.m — the
MATLAB metric step is built in here)."""

from __future__ import annotations

import os

import jax
import numpy as np
from PIL import Image

from ..config import config_from_args
from ..evals.cvppp import evaluate_batch
from ..evals.exporters import LeavesExporter
from ..train.checkpoint import model_dir
from .eval import load_eval_variables


def main(argv=None):
    jax.config.update("jax_default_matmul_precision", "highest")
    cfg = config_from_args(argv)
    # eval-invocation args already take precedence (arch fields come
    # from the saved train config inside load_eval_variables)
    model_cfg, variables = load_eval_variables(cfg)
    results_dir = os.path.join(model_dir(cfg), cfg.model_name + "_results")
    print("Creating annotations for leaves validation...")
    exporter = LeavesExporter(model_cfg, variables)
    written = exporter.export(results_dir)
    print(f"wrote {len(written)} label images to {results_dir}")

    # score against GT when the split has labels (val); test has none
    ds = exporter.dataset
    if getattr(ds, "gt_files", None):
        preds, gts = [], []
        for i, gt_file in enumerate(ds.gt_files):
            gt = np.array(Image.open(gt_file))
            pred = np.array(Image.open(written[i]))
            preds.append(pred)
            gts.append(gt)
        res = evaluate_batch(preds, gts)
        print("SBD: %.4f  |DiC|: %.4f  (n=%d)"
              % (res["SBD"], res["absDiC"], res["n"]))


if __name__ == "__main__":
    main()
