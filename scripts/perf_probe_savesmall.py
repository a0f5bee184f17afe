"""Step-level A/B of the save-small training residuals (RSIS_SAVE_SMALL).

RSIS_SAVE_SMALL=1 routes the training decode through the upsample-fused
cell vjp + sparse-gmax custom_vjps, which cut the scan's per-step
saved-residual stacking from 3.6 GB to 1.95 GB at T=20 b32
(scripts/analyze_residuals.py; the round-4 trace priced that DUS traffic
at ~39 ms/step). Measured on v5e 2026-08-19: 253.3 (off) vs 256.7 ms
(on) — the byte savings do NOT buy step time (docs/PERF.md round 5), so
the default is OFF and =1 is an opt-in memory lever. The switch is read
at step-build (trace) time; each train_step_bench call rebuilds the
step, so flips between phases take effect (same contract as
RSIS_PALLAS_DWT).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_savesmall.py [T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402

SETTINGS = (
    ("0", "round-4 residuals (x_pad + max-vjp saves stacked) (default)"),
    ("1", "save-small (upsample-fused cell vjp + sparse gmax)"),
)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()} T={T}", flush=True)
    results = []
    for val, desc in SETTINGS:
        os.environ["RSIS_SAVE_SMALL"] = val
        r = train_step_bench(small=False, T=T)
        ms = r[f"train_step_T{T}_ms"]
        loss_d = r[f"train_step_T{T}_loss_delta"]
        results.append((val, desc, ms))
        print(f"RSIS_SAVE_SMALL={val!r} {ms:8.2f} ms  loss_delta={loss_d}"
              f"   ({desc})", flush=True)
    best = min(results, key=lambda t: t[2])
    print(f"best: RSIS_SAVE_SMALL={best[0]!r} at {best[2]:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
