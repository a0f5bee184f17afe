#!/usr/bin/env bash
# canonical Pascal training run (reference: scripts/train_pascal.sh)
python -m rsis_tpu.cli.train -model_name rsis-pascal --resize
