"""Cityscapes official-format export entry point
(reference: src/eval_cityscapes.py:171-177)."""

from __future__ import annotations

import os

import jax

from ..config import config_from_args
from ..evals.exporters import CityscapesExporter
from ..train.checkpoint import model_dir
from .eval import load_eval_variables


def main(argv=None):
    jax.config.update("jax_default_matmul_precision", "highest")
    cfg = config_from_args(argv)
    # eval-invocation args already take precedence (arch fields come
    # from the saved train config inside load_eval_variables)
    model_cfg, variables = load_eval_variables(cfg)
    results_dir = os.path.join(model_dir(cfg), cfg.model_name + "_results")
    print("Creating annotations for cityscapes validation...")
    exporter = CityscapesExporter(model_cfg, variables)
    written = exporter.export(results_dir)
    print(f"wrote {len(written)} result files to {results_dir}")

    # built-in instance AP (the reference defers to external
    # cityscapesScripts; rsis_tpu scores the export directly)
    gt_files = getattr(exporter.dataset, "ins_files", [])
    if gt_files and all(os.path.exists(f) for f in gt_files[:1]):
        from ..evals.cityscapes_ap import evaluate_exported
        txt_names = [os.path.basename(p) for p in written]
        res = evaluate_exported(results_dir, gt_files[:len(txt_names)],
                                txt_names)
        print("allAp: %.4f  allAp50%%: %.4f" % (res["allAp"],
                                                res["allAp50%"]))


if __name__ == "__main__":
    main()
