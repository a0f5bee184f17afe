"""Silicon bisect: run the one-pass dwt kernel at EVERY decoder cell
geometry of the cityscapes train recipe (imsize 256x512, hidden 128,
batch 32) against the shifted-einsum oracle. Round-3's tpu_smoke only
checked cell4 — the full train step crashed anyway, so one of the other
cell shapes breaks the kernel on hardware.

Usage: python scripts/probe_dwt_cells.py [batch] [dtype]
(dtype: float32 | bfloat16 — the train step feeds the kernel bf16)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

import time

import jax.numpy as jnp

from rsis_tpu.ops.pallas_decode import pad_hcw
from rsis_tpu.ops.pallas_decode_vjp import _weight_grad, weight_grad_rowmajor

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
DTYPE = jnp.dtype(sys.argv[2]) if len(sys.argv) > 2 else jnp.float32
TOL = 2e-4 if DTYPE == jnp.float32 else 2e-2
# (cx, ch, H, W) per decoder cell at imsize 256x512, hidden 128
CELLS = [
    (0, 128, 8, 16),
    (128, 64, 16, 32),
    (64, 32, 32, 64),
    (32, 16, 64, 128),
    (16, 8, 128, 256),
]
interpret = jax.default_backend() != "tpu"
print(f"backend={jax.default_backend()} b={B} dtype={DTYPE} "
      f"interpret={interpret}", flush=True)
fails = 0
for i, (cx, ch, h, w) in enumerate(CELLS):
    ks = jax.random.split(jax.random.PRNGKey(100 + i), 3)
    hp = jax.random.normal(ks[0], (B, h, ch, w), DTYPE)
    x_pad = (pad_hcw(jax.random.normal(ks[1], (B, h, cx, w), DTYPE))
             if cx else None)
    dg = jax.random.normal(ks[2], (B, h, 4 * ch, w), DTYPE)
    t0 = time.time()
    try:
        out = weight_grad_rowmajor(hp, x_pad, dg, cx=cx, ch=ch,
                                   interpret=interpret)
        ref = _weight_grad(hp, x_pad if cx else None, dg, cx, ch)
        d = float(jnp.max(jnp.abs(out - ref.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        ok = d <= TOL * (1.0 + s)
        fails += not ok
        print(f"cell{i} cx={cx} ch={ch} {h}x{w}: max|d|={d:.3e} "
              f"scale={s:.3e} {'OK' if ok else 'MISMATCH'} "
              f"({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:
        fails += 1
        print(f"cell{i} cx={cx} ch={ch} {h}x{w}: CRASH {type(e).__name__}: "
              f"{str(e)[:160]} ({time.time() - t0:.1f}s)", flush=True)
print("PROBE " + ("PASS" if fails == 0 else f"FAIL ({fails})"), flush=True)
