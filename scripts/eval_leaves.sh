#!/usr/bin/env bash
python -m rsis_tpu.cli.eval_leaves -model_name=leaves -dataset=leaves \
  -batch_size=5 -maxseqlen=20 --resize -imsize=400 -class_th=0.2 --log_term
