"""Silicon check + decode-bench A/B of the mask-head kernel tails.

The banded VPU tail (RSIS_HEAD_VPU, ops/pallas_mask_head._head_kernel_vpu)
replaces the dense (2th, 3W) @ (3W, 2W) column-interp matmul with 4 lane
rolls + 12 per-lane FMAs and a bf16-pair int32 lane interleave. This
probe (1) validates it against the matmul tail on hardware at the bench
head geometry, then (2) A/Bs the full decode bench (the step-level
protocol — isolated probes over the tunnel are noise-dominated,
docs/PERF.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_head.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import decode_bench  # noqa: E402
from rsis_tpu.ops.pallas_mask_head import mask_head_pallas  # noqa: E402


def check_correctness():
    rng = np.random.default_rng(7)
    b, h, c, w = 8, 256, 8, 512  # bench head geometry (smaller batch)
    hs = jnp.asarray(rng.normal(size=(b, h, c, w)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, c, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    got = np.asarray(mask_head_pallas(hs, k, bias, variant="vpu"),
                     np.float32)
    want = np.asarray(mask_head_pallas(hs, k, bias, variant="matmul"),
                      np.float32)
    err = np.max(np.abs(got - want))
    rel = err / max(np.max(np.abs(want)), 1e-6)
    print(f"silicon vpu-vs-matmul: max abs {err:.5f} rel {rel:.5f}",
          flush=True)
    assert rel < 2e-2, "VPU head tail diverges from the matmul tail"


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    check_correctness()
    results = []
    for val, desc in (("0", "matmul tail"), ("1", "banded VPU tail")):
        os.environ["RSIS_HEAD_VPU"] = val
        r = decode_bench(small=False)
        results.append((val, desc, r["value"]))
        print(f"RSIS_HEAD_VPU={val}  {r['value']:8.2f} img/s  ({desc})",
              flush=True)
    best = max(results, key=lambda t: t[2])
    print(f"best: RSIS_HEAD_VPU={best[0]} at {best[2]:.2f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
