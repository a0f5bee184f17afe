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
    model_cfg, variables = load_eval_variables(cfg)
    model_cfg = model_cfg.replace(mask_th=cfg.mask_th,
                                  eval_split=cfg.eval_split)
    results_dir = os.path.join(model_dir(cfg), cfg.model_name + "_results")
    print("Creating annotations for cityscapes validation...")
    written = CityscapesExporter(model_cfg, variables).export(results_dir)
    print(f"wrote {len(written)} result files to {results_dir}")


if __name__ == "__main__":
    main()
