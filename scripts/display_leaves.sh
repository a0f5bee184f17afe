#!/usr/bin/env bash
# mirror of reference scripts/display_leaves.sh (eval with overlay display)
python -m rsis_tpu.cli.eval -model_name=leaves -dataset=leaves \
  -batch_size=5 -maxseqlen=20 --resize -imsize=400 --display --log_term
