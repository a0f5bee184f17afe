"""Evaluate a soak-trained checkpoint on its synthetic val split (on TPU).

The silicon-soak closer: loads the checkpoint the end-to-end training run
produced (TRAINRUN.md), runs the shared inference forward through the CVPPP
exporter machinery (evals/exporters.LeavesExporter with an injected
synthetic dataset — the exporter is dataset-agnostic), and scores the
predicted label images with the built-in SBD / |DiC| metrics
(evals/cvppp.py, reference: src/CVPPP/evaluation.m:17-31) against the
synthetic GT instance maps. This is the reference's train->eval arc
(reference: src/train.py:199-503 then src/eval_leaves.py + evaluation.m)
executed on real hardware.

Usage (dataset flags must match the training invocation — the eval
invocation owns runtime/dataset params, like the reference eval scripts):

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/soak_eval.py \
      -model_name soak -models_root /root/repo/runs -dataset synthetic \
      -synthetic_length 128 -synthetic_max_instances 8 -num_classes 5 \
      -imsize 256 --resize -maxseqlen 8 -gt_maxseqlen 10 -batch_size 16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from rsis_tpu.cli.eval import load_eval_variables
    from rsis_tpu.config import config_from_args
    from rsis_tpu.data import get_dataset
    from rsis_tpu.evals.cvppp import evaluate_batch
    from rsis_tpu.evals.exporters import LeavesExporter

    cfg = config_from_args(argv)
    print("backend:", jax.default_backend(), jax.devices()[0])
    eval_cfg, variables = load_eval_variables(cfg)
    ds = get_dataset(eval_cfg, split="val", augment=False)
    t0 = time.time()
    exporter = LeavesExporter(eval_cfg, variables, dataset=ds)
    labels = exporter.predicted_labels()
    t1 = time.time()

    preds, gts = [], []
    for i, name in enumerate(ds.get_sample_list()):
        preds.append(labels[os.path.basename(name)])
        gts.append(np.asarray(ds.get_raw_sample(i)[1]))
    res = evaluate_batch(preds, gts)
    res["forward_s"] = round(t1 - t0, 2)
    res["n_images"] = len(preds)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
