"""Step-level A/B of the dwt kernel enable policy (RSIS_PALLAS_DWT).

The isolated per-cell probe (perf_probe_dwt.py) has ~±30% run-to-run
noise over the TPU tunnel; the full train step with 12 back-to-back
donated-state iterations is stable to ~0.2%, so the enable policy is
decided HERE. RSIS_PALLAS_DWT is read in the cell VJP's bwd Python at
trace time; each train_step_bench call rebuilds the jitted step via
make_train_step, so flipping the env var between phases takes effect.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_dwt_step.py [T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402

# policy -> which train-geometry cells run the Pallas dwt kernel
SETTINGS = (
    ("0", "einsum everywhere"),
    ("8", "cell4 only (ch=8, W=256) (== auto at this geometry)"),
    ("8,16", "cells 3+4"),
    # lane-packed arms (pack > 1). Round-5 silicon status (2026-08-20,
    # scripts/repro_dwt_fault.py + this probe): pack=2 ("...32") and
    # pack=4 ("64") now pass the full step; pack=8 (ch=128, cell0)
    # still faults — but ONLY with the dy-fold kernels in the same
    # program (step-nodyfold passes). The "all" arm therefore DIES with
    # `TPU backend error (Internal)` unless RSIS_DYFOLD=0; it runs last
    # so the safe arms always report.
    ("8,16,32", "cells 2+3+4 (cell2 lane-packed)"),
    ("all", "every cell incl. pack=8 (FAULTS at HEAD with dyfold on)"),
)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()} T={T}", flush=True)
    results = []
    for val, desc in SETTINGS:
        os.environ["RSIS_PALLAS_DWT"] = val
        r = train_step_bench(small=False, T=T)
        ms = r[f"train_step_T{T}_ms"]
        results.append((val, desc, ms))
        print(f"RSIS_PALLAS_DWT={val!r:8} {ms:8.2f} ms   ({desc})",
              flush=True)
    best = min(results, key=lambda t: t[2])
    print(f"best: RSIS_PALLAS_DWT={best[0]!r} at {best[2]:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
