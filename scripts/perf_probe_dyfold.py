"""A/B probe: T=20 cityscapes-recipe train step with dy-fold off vs on.

Measures the full shipped training step (bench.py's train_step_bench
protocol: donated state, back-to-back enqueue, one scalar sync) twice in
one process — RSIS_DYFOLD is read at trace time, so flipping it between
the two make_train_step traces selects the kernel variant.

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_dyfold.py [T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()} T={T}", flush=True)
    os.environ["RSIS_DYFOLD"] = "0"
    std = train_step_bench(small=False, T=T)
    print("standard:", std, flush=True)
    os.environ["RSIS_DYFOLD"] = "1"
    dy = train_step_bench(small=False, T=T)
    print("dyfold:  ", dy, flush=True)
    ms0 = std[f"train_step_T{T}_ms"]
    ms1 = dy[f"train_step_T{T}_ms"]
    print(f"delta: {ms0:.1f} -> {ms1:.1f} ms "
          f"({ms0 / ms1:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
