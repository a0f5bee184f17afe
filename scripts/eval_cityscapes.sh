#!/usr/bin/env bash
python -m rsis_tpu.cli.eval_cityscapes -model_name=cityscapes \
  -dataset=cityscapes -batch_size=5 -maxseqlen=20 --no_run_coco_eval \
  --log_term
