"""Evaluation entry point: COCO-style eval on Pascal
(``python -m rsis_tpu.cli.eval -model_name ...``), mirroring the reference
``python eval.py`` (reference: src/eval.py:401-414).
"""

from __future__ import annotations

import os
import sys

import jax

from ..config import Config, config_from_args
from ..evals.evaluator import Evaluator
from ..models.rsis import init_variables
from ..train.checkpoint import load_checkpoint, model_dir
from ..train.step import create_train_state


def load_eval_variables(cfg: Config):
    """Rebuild the model from the pickled train config + checkpoint.

    Reference precedence (src/eval.py:233-246): the saved train args define
    ONLY the model architecture; every runtime choice (dataset dirs,
    thresholds, display, maxseqlen, batch size) comes from the eval
    invocation. Returns (eval_cfg, variables)."""
    saved = Config.load(os.path.join(model_dir(cfg), "args.json"))
    eval_cfg = cfg.replace(
        base_model=saved.base_model, hidden_size=saved.hidden_size,
        kernel_size=saved.kernel_size, skip_mode=saved.skip_mode,
        num_classes=saved.num_classes, compute_dtype=saved.compute_dtype,
        dropout=0.0, dropout_stop=0.0, dropout_cls=0.0)
    variables = init_variables(eval_cfg, jax.random.PRNGKey(cfg.seed))
    template = create_train_state(eval_cfg, variables)
    state, _ = load_checkpoint(cfg, template)
    return eval_cfg, {"params": state.params,
                      "batch_stats": state.batch_stats}


def main(argv=None):
    # evaluation compares against fp32 torch-trained weights; keep matmuls
    # exact (bf16 is the training/bench fast path)
    jax.config.update("jax_default_matmul_precision", "highest")
    cfg = config_from_args(argv)
    if not cfg.log_term:
        log_path = os.path.join(model_dir(cfg), "eval.log")
        print("Eval logs will be saved to:", log_path)
        sys.stdout = open(log_path, "w")
    eval_cfg, variables = load_eval_variables(cfg)
    ev = Evaluator(eval_cfg, variables)
    print("Dataset is %s" % eval_cfg.dataset)
    print("Split is %s" % eval_cfg.eval_split)
    print("Evaluating for %d images" % len(ev.sample_list))
    print("Number of classes is %d" % len(ev.class_names))
    if eval_cfg.no_run_coco_eval:
        ev.create_annotations()
    else:
        ev.run_eval()


if __name__ == "__main__":
    main()
