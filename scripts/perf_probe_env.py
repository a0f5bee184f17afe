"""Generic train-step A/B probe over one kernel env-switch.

Runs bench.py's train_step_bench twice per T with VAR=0 then VAR=1 —
env switches are read when make_train_step rebuilds the step trace
(the RSIS_DYFOLD contract), so flipping between runs selects the
variant. Step-level protocol only: isolated probes over the tunnel are
noise-dominated (docs/PERF.md).

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_env.py RSIS_COST_MATMUL [T ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402


def main():
    var = sys.argv[1]
    ts = [int(a) for a in sys.argv[2:]] or [20]
    print(f"backend={jax.default_backend()} var={var} T={ts}", flush=True)
    for T in ts:
        res = {}
        for val in ("0", "1"):
            os.environ[var] = val
            r = train_step_bench(small=False, T=T)
            res[val] = r[f"train_step_T{T}_ms"]
            print(f"T={T} {var}={val}  {res[val]:8.2f} ms "
                  f"({r[f'train_step_T{T}_images_per_sec']:.1f} img/s)",
                  flush=True)
        print(f"T={T} delta: {res['0']:.1f} -> {res['1']:.1f} ms "
              f"({res['0'] / res['1']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
