"""Minimal repro/bisect driver for the bench train step on silicon.

Usage: python scripts/repro_train.py T [ENV=VAL ...]
Builds the exact bench.py train_step_bench configuration (resnet101 b32
256x512) at decode length T, runs compile + 2 steps, prints the losses.
Env overrides given on argv are applied BEFORE any jax import so the
trace-time kill-switches (RSIS_DYFOLD / RSIS_PALLAS_DWT /
RSIS_TRAIN_ROWMAJOR) take effect.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
T = int(sys.argv[1]) if len(sys.argv) > 1 else 5
for kv in sys.argv[2:]:
    k, v = kv.split("=", 1)
    os.environ[k] = v

import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

import numpy as np
import jax.numpy as jnp

from bench import _synthetic_wire_batch
from rsis_tpu.config import Config
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.train.step import StepFlags, create_train_state, make_train_step

print(f"repro T={T} env: dyfold={os.environ.get('RSIS_DYFOLD', 'on')} "
      f"dwt={os.environ.get('RSIS_PALLAS_DWT', 'on')} "
      f"rowmajor={os.environ.get('RSIS_TRAIN_ROWMAJOR', 'on')}", flush=True)
cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
             imsize=256, maxseqlen=T, gt_maxseqlen=20, batch_size=32,
             augment=True, compute_dtype="bfloat16")
h, w = 256, 512
variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
state = create_train_state(cfg, variables)
rng = np.random.default_rng(0)
imgs, tgt = _synthetic_wire_batch(rng, cfg.batch_size, h, w,
                                  cfg.gt_maxseqlen, cfg.num_classes)
batch = (jax.device_put(imgs), jax.device_put(tgt))
flags = StepFlags(use_class_loss=jnp.float32(1.0),
                  use_stop_loss=jnp.float32(1.0),
                  update_encoder=jnp.float32(1.0))
train_step, _ = make_train_step(cfg, donate=True)
key = jax.random.PRNGKey(1)
t0 = time.time()
state, metrics = train_step(state, batch, flags, jax.random.fold_in(key, 0))
loss0 = float(metrics[0])
print(f"step 0 OK loss={loss0:.4f} ({time.time() - t0:.0f}s incl. compile)",
      flush=True)
t0 = time.time()
state, metrics = train_step(state, batch, flags, jax.random.fold_in(key, 1))
loss1 = float(metrics[0])
print(f"step 1 OK loss={loss1:.4f} ({time.time() - t0:.1f}s)", flush=True)
print("REPRO PASS", flush=True)
