"""A/B probe: decode-scan remat ON vs OFF in the full train step.

Round 3 measured the remat replay at 37.5 ms and set `-remat auto` to
OFF while activations fit HBM. The round-4 trace anatomy shows the
remat-OFF step paying ~60 ms/step of saved-activation traffic (gates
DUS/DS + async copies), and the round-4 kernels (dy-fold, one-pass
dwt) made the replayed forward cheaper — so the trade needs
re-measuring. Patches _resolve_remat (probe-local) so bench.py's
step-level protocol runs both arms.

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_remat.py [T ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402
from rsis_tpu.train import step as step_mod  # noqa: E402


def main():
    ts = [int(a) for a in sys.argv[1:]] or [20]
    print(f"backend={jax.default_backend()} T={ts}", flush=True)
    for T in ts:
        res = {}
        for val in (False, True):
            step_mod._resolve_remat = lambda cfg, T, _v=val: _v
            r = train_step_bench(small=False, T=T)
            res[val] = r[f"train_step_T{T}_ms"]
            print(f"T={T} remat={val}  {res[val]:8.2f} ms "
                  f"({r[f'train_step_T{T}_images_per_sec']:.1f} img/s)",
                  flush=True)
        print(f"T={T} off->on: {res[False]:.1f} -> {res[True]:.1f} ms "
              f"({res[False] / res[True]:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
