"""Trace the shipped train step and print the nesting-aware op table.

Rebuilds bench.py's train_step_bench setup (cityscapes recipe, donated
state), warms the compile, traces a few steps with jax.profiler, and
prints per-op SELF times via utils/profiling — the anatomy that decides
where the next optimization goes (docs/PERF.md budgets).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_trace_step.py [T] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import _synthetic_wire_batch  # noqa: E402
from rsis_tpu.config import Config  # noqa: E402
from rsis_tpu.models.rsis import init_variables  # noqa: E402
from rsis_tpu.train.step import (StepFlags, create_train_state,  # noqa: E402
                                 make_train_step)
from rsis_tpu.utils.profiling import (load_trace_events,  # noqa: E402
                                      op_table, trace)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    logdir = os.environ.get("TRACE_DIR", "/tmp/step_trace")
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
    step, _ = make_train_step(cfg, donate=False)  # no donation: state reuse

    key = jax.random.PRNGKey(1)
    st, metrics = step(state, batch, flags, key)  # compile + warm
    print(f"warm loss={float(metrics[0]):.4f}", flush=True)

    with trace(logdir):
        for i in range(n_steps):
            st, metrics = step(state, batch, flags,
                               jax.random.fold_in(key, i))
        sync = float(metrics[0])  # force completion inside the trace
    print(f"traced {n_steps} steps (loss {sync:.4f}); analyzing {logdir}",
          flush=True)

    events = load_trace_events(logdir)
    rows = op_table(events, top=30,
                    group=lambda n: n.split(".")[0].split("(")[0])
    width = max(len(n) for n, _ in rows)
    for name, ms in rows:
        print(f"{name:<{width}}  {ms / n_steps:9.3f} ms/step")
    total = sum(ms for _, ms in rows)
    print(f"{'TOTAL (top 30)':<{width}}  {total / n_steps:9.3f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
