#!/usr/bin/env bash
# mirror of reference scripts/display_cityscapes.sh (eval with overlay display)
python -m rsis_tpu.cli.eval -model_name=cityscapes -dataset=cityscapes \
  -batch_size=5 -maxseqlen=20 --no_run_coco_eval --display --log_term
