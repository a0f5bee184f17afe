#!/usr/bin/env bash
python -m rsis_tpu.cli.eval -model_name rsis-pascal --resize --log_term
