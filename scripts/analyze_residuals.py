"""Enumerate what the T=20 train step's backward actually saves.

The round-4 trace anatomy priced the decode scan's saved-activation DUS
stacking at ~39 ms/step (docs/PERF.md) and called it structural. This
script makes that claim inspectable: `jax.ad_checkpoint.saved_residuals`
lists every tensor the AD partial-eval stores for the backward pass —
scan-stacked residuals show up with a leading (T, ...) axis — so we can
price the save set in bytes and see which buffers to attack (VERDICT r4
item 2b: a selective save-list instead of all-or-nothing remat).

Runs entirely on CPU: residual selection happens in JAX's partial-eval,
before XLA, so the set is identical to the TPU program's (the rowmajor
Pallas path is forced with pallas="on", which traces interpret-mode
kernels through the same custom_vjp boundaries).

Usage: python scripts/analyze_residuals.py [T] [--remat]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax._src.ad_checkpoint import saved_residuals

from rsis_tpu.config import Config
from rsis_tpu.models.rsis import build_models, init_variables
from rsis_tpu.train import step as step_mod

T = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20
REMAT = "--remat" in sys.argv

cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
             imsize=256, maxseqlen=T, gt_maxseqlen=20, batch_size=32,
             augment=False, compute_dtype="bfloat16", pallas="on")
H, W = 256, 512

variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
params, batch_stats = variables["params"], variables["batch_stats"]
encoder, decoder = build_models(cfg)

x = jnp.zeros((cfg.batch_size, H, W, 3), jnp.bfloat16)
y_mask = jnp.zeros((cfg.batch_size, cfg.gt_maxseqlen, H * W), jnp.uint8)
rng = jax.random.PRNGKey(1)


def fwd_loss(params):
    masks, clss, stops, costs, _ = step_mod._forward_with_costs(
        cfg, encoder, decoder, params, batch_stats, x, y_mask, T,
        train=True, rng=rng, remat=REMAT)
    # stand-in scalar loss touching every output like _losses does
    return (jnp.sum(masks.astype(jnp.float32)) + jnp.sum(clss)
            + jnp.sum(stops) + jnp.sum(costs.astype(jnp.float32)))


res = saved_residuals(fwd_loss, params)
rows = []
total = 0
scan_total = 0
for aval, descr in res:
    nbytes = int(np.prod(aval.shape)) * aval.dtype.itemsize if aval.shape \
        else aval.dtype.itemsize
    total += nbytes
    is_scan = len(aval.shape) >= 1 and aval.shape[0] == T
    scan_total += nbytes if is_scan else 0
    rows.append((nbytes, is_scan, str(aval.shape), str(aval.dtype),
                 " ".join(str(descr).split())[:140]))

rows.sort(reverse=True)
print(f"T={T} remat={'on' if REMAT else 'off'}  "
      f"residuals: {len(rows)}  total={total / 1e6:.1f} MB  "
      f"scan-stacked (leading T): {scan_total / 1e6:.1f} MB", flush=True)
print(f"{'MB':>9}  scan  shape x dtype  <- source")
for nbytes, is_scan, shape, dtype, descr in rows[:40]:
    print(f"{nbytes / 1e6:9.2f}  {'T' if is_scan else ' '}    "
          f"{shape} {dtype}  <- {descr}", flush=True)
