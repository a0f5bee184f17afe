#!/usr/bin/env bash
# mirror of reference scripts/display_pascal.sh (eval with overlay display)
python -m rsis_tpu.cli.eval -model_name rsis-pascal --resize -class_th=0.7 \
  --display --log_term
