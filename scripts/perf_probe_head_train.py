"""A/B probe: train-step cost of the mask-head kernel tails.

The decode-bench A/B picked the banded VPU tail at the inference head
geometry (256x512 — scripts/perf_probe_head.py). The TRAIN step's head
runs at 128x256 inside the checkpointed decode scan (remat replays the
forward), so its winner must be measured separately; this probe runs
bench.py's train_step_bench twice per T with RSIS_HEAD_VPU flipped
(read when make_train_step rebuilds the step trace, like RSIS_DYFOLD).

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_head_train.py [T ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import train_step_bench  # noqa: E402


def main():
    ts = [int(a) for a in sys.argv[1:]] or [20]
    print(f"backend={jax.default_backend()} T={ts}", flush=True)
    for T in ts:
        res = {}
        for val, desc in (("0", "matmul tail"), ("1", "banded VPU tail")):
            os.environ["RSIS_HEAD_VPU"] = val
            r = train_step_bench(small=False, T=T)
            res[val] = r[f"train_step_T{T}_ms"]
            print(f"T={T} RSIS_HEAD_VPU={val}  {res[val]:8.2f} ms "
                  f"({r[f'train_step_T{T}_images_per_sec']:.1f} img/s, "
                  f"{desc})", flush=True)
        print(f"T={T} delta: {res['0']:.1f} -> {res['1']:.1f} ms "
              f"({res['0'] / res['1']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
