"""Anatomy of the train step's layout copies (VERDICT r4 #2a).

The round-4 trace priced "copies at Pallas call boundaries" at
20.5 ms/step but never said WHICH boundaries. This script traces the
shipped step (same setup as perf_trace_step.py) and prints every
copy/transpose/bitcast row on the device lane WITH its HLO metadata
(shape + source), so the 20.5 ms can be attributed to specific
producer/consumer pairs — the prerequisite for making adjacent kernels
share one layout.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_copy_anatomy.py [T] [steps]
Reuses TRACE_DIR (default /tmp/step_trace) if ANALYZE_ONLY=1.
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPYISH = ("copy", "transpose", "bitcast", "relayout")


def analyze(logdir: str, n_steps: int) -> None:
    from rsis_tpu.utils.profiling import _lane_tids, load_trace_events

    events = load_trace_events(logdir)
    tids = _lane_tids(events, "XLA Ops")
    rows = [e for e in events
            if e.get("ph") == "X" and "dur" in e
            and (not tids or (e.get("pid"), e.get("tid")) in tids)]

    # Sum durations per op NAME (copy ops never nest children, so raw sums
    # equal self times for them) and keep one args sample per name.
    by_name: dict[str, float] = defaultdict(float)
    sample: dict[str, dict] = {}
    for e in rows:
        n = e["name"]
        if any(k in n.lower() for k in COPYISH):
            by_name[n] += float(e["dur"])
            sample.setdefault(n, e.get("args", {}) or {})

    # bucket by mechanism: scan residual stacking (DUS) / unstacking
    # (DS), async memory-space copy-start/done pairs, and true layout
    # copies/transposes
    buckets: dict[str, float] = defaultdict(float)
    for n, us in by_name.items():
        ln = n.lower()
        if "dynamic-update-slice" in ln:
            b = "scan DUS stacking"
        elif "dynamic-slice" in ln:
            b = "scan DS unstacking"
        elif "copy-done" in ln or "copy-start" in ln:
            b = "async copy pairs"
        else:
            b = "layout copies"
        buckets[b] += us

    total = sum(by_name.values()) / 1e3 / n_steps
    print(f"\ncopy-like device ops: {total:.2f} ms/step "
          f"({len(by_name)} distinct)")
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  bucket {b:20s} {us / 1e3 / n_steps:7.2f} ms/step")
    for n, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        args = sample[n]
        meta = args.get("long_name") or args.get("tf_op") or ""
        src = args.get("source") or ""
        print(f"  {us / 1e3 / n_steps:8.3f} ms  {n}")
        if meta:
            print(f"              {str(meta)[:220]}")
        if src:
            print(f"              src: {str(src)[:160]}")


def main() -> None:
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    logdir = os.environ.get("TRACE_DIR", "/tmp/step_trace")
    if os.environ.get("ANALYZE_ONLY"):
        analyze(logdir, n_steps)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bench import _synthetic_wire_batch
    from rsis_tpu.config import Config
    from rsis_tpu.models.rsis import init_variables
    from rsis_tpu.train.step import (StepFlags, create_train_state,
                                     make_train_step)
    from rsis_tpu.utils.profiling import trace

    print(f"backend={jax.default_backend()} T={T}", flush=True)
    cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
                 imsize=256, maxseqlen=T, gt_maxseqlen=20, batch_size=32,
                 augment=True, compute_dtype="bfloat16")
    variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
    state = create_train_state(cfg, variables)
    rng = np.random.default_rng(0)
    imgs, tgt = _synthetic_wire_batch(rng, cfg.batch_size, 256, 512,
                                      cfg.gt_maxseqlen, cfg.num_classes)
    batch = (jax.device_put(imgs), jax.device_put(tgt))
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
    # DONATE=0 disables state donation; default matches the production
    # step (donate=True) — donation changes which copies XLA inserts, so
    # attribution must run the program bench.py actually times.
    donate = os.environ.get("DONATE", "1") != "0"
    step, _ = make_train_step(cfg, donate=donate)

    key = jax.random.PRNGKey(1)
    st, metrics = step(state, batch, flags, key)  # compile + warm
    print(f"warm loss={float(metrics[0]):.4f}", flush=True)
    with trace(logdir):
        for i in range(n_steps):
            st, metrics = step(state, batch, flags,
                               jax.random.fold_in(key, i))
        float(metrics[0])
    analyze(logdir, n_steps)


if __name__ == "__main__":
    main()
