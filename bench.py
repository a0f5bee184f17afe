"""Benchmark: Cityscapes-style 512x1024 inference decode throughput.

Measures steady-state images/sec of the flagship configuration (ResNet-101
encoder, hidden 128, T=20 ConvLSTM decode — the canonical cityscapes run,
reference: scripts/train_cityscapes.sh) at 512x1024 in bfloat16, end-to-end
jitted (encoder + scanned decode + mask upsample + sigmoid).

Measurement protocol: the timed loop runs *inside* one jitted
``lax.fori_loop`` with a serial data dependency between iterations, and only
a scalar checksum leaves the device — so neither per-dispatch latency nor
host transfer of the (B, T, 512, 1024) mask tensor pollutes the number
(the TPU here sits behind a network tunnel where those costs are large and
unrepresentative of on-device throughput).

Output contract (the driver parses the LAST JSON line on stdout):
  1. The headline decode line prints — flushed — the moment the decode
     metric exists. If everything after that is killed by a timeout, the
     headline number still stands (round 2 lost its number to exactly
     this: the train bench's multi-minute compile ran *before* the print).
  2. The optional train-step benches (T=5 curriculum start, then T=20
     canonical cityscapes) each re-print the full line enriched with their
     metrics, so the tail line is always a superset of the headline line.

Environment knobs:
  BENCH_SMALL=1       tiny CPU smoke run.
  BENCH_FAST=1        decode headline only; skip the train benches.
  BENCH_BUDGET_S=N    total wall-clock budget (default 2100 s). A train
                      bench phase only starts while the budget allows.

Baseline: the reference repo publishes no throughput numbers (BASELINE.md);
``vs_baseline`` is computed against an estimated 3.0 images/sec for the
reference PyTorch-0.2 pipeline on its contemporaneous single GPU (~12 GB,
README.md:113) at this geometry — the conservative estimate underlying the
>=10x north-star target.
"""

import json
import os
import time

_T_START = time.monotonic()

import jax
import jax.numpy as jnp
from jax import lax

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compile when the runtime supports it
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

REFERENCE_IMAGES_PER_SEC_ESTIMATE = 3.0


def _budget_s() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "2100"))


def _remaining_s() -> float:
    return _budget_s() - (time.monotonic() - _T_START)


def _synthetic_wire_batch(rng, batch, h, w, n_inst, num_classes):
    """Host-side synthetic uint8 wire batch at the cityscapes train geometry
    (blobby packed instance masks, area-sorted like sequence_from_masks)."""
    import numpy as np
    imgs = rng.integers(0, 255, (batch, h, w, 3), dtype=np.uint8)
    tgt = np.zeros((batch, n_inst, h * w + 3), dtype=np.uint8)
    yy, xx = np.ogrid[:h, :w]
    for b in range(batch):
        k = int(rng.integers(2, min(6, n_inst)))
        sizes = []
        for i in range(k):
            cy, cx = rng.integers(h // 8, h - h // 8), rng.integers(
                w // 8, w - w // 8)
            r = int(rng.integers(h // 16, h // 6))
            m = (((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r)
            tgt[b, i, :h * w] = m.reshape(-1)
            tgt[b, i, -3] = int(rng.integers(1, num_classes))
            tgt[b, i, -2] = 1
            tgt[b, i, -1] = 1
            sizes.append(m.sum())
        order = np.argsort(sizes)[::-1]
        tgt[b, :k] = tgt[b, order]
        if k < n_inst:
            tgt[b, k, -1] = 1  # <eos> slot
    return imgs, tgt


def train_step_bench(small: bool, T: int = 5) -> dict:
    """Images/sec of the full shipped training path at the reference's
    cityscapes recipe (scripts/train_cityscapes.sh: resnet101, hidden 128,
    batch 32) on synthetic uint8-wire batches with on-device augmentation.
    T=5 is the curriculum start, T=20 the canonical end-state. Steps are
    enqueued back-to-back on donated state (how the real trainer runs) and
    synced once at the end, so the tunnel's dispatch latency amortizes
    instead of serializing."""
    import numpy as np
    import jax.numpy as jnp
    from rsis_tpu.config import Config
    from rsis_tpu.models.rsis import init_variables
    from rsis_tpu.train.step import (StepFlags, create_train_state,
                                     make_train_step)

    if small:
        cfg = Config(base_model="tiny", hidden_size=16, num_classes=3,
                     imsize=32, maxseqlen=3, gt_maxseqlen=5, batch_size=2,
                     augment=True, compute_dtype="bfloat16")
        h, w, steps = 32, 64, 3
    else:
        cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
                     imsize=256, maxseqlen=T, gt_maxseqlen=20, batch_size=32,
                     augment=True, compute_dtype="bfloat16")
        h, w, steps = 256, 512, 12

    variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
    state = create_train_state(cfg, variables)
    rng = np.random.default_rng(0)
    imgs, tgt = _synthetic_wire_batch(rng, cfg.batch_size, h, w,
                                      cfg.gt_maxseqlen, cfg.num_classes)
    batch = (jax.device_put(imgs), jax.device_put(tgt))
    flags = StepFlags(use_class_loss=jnp.float32(1.0),
                      use_stop_loss=jnp.float32(1.0),
                      update_encoder=jnp.float32(1.0))
    train_step, _ = make_train_step(cfg, donate=True)

    key = jax.random.PRNGKey(1)
    for i in range(2):  # compile + warmup
        state, metrics = train_step(state, batch, flags,
                                    jax.random.fold_in(key, i))
    loss0 = float(metrics[0])  # sync (block_until_ready no-ops here)

    start = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, flags,
                                    jax.random.fold_in(key, 100 + i))
    loss1 = float(metrics[0])
    elapsed = time.perf_counter() - start
    tag = f"T{cfg.maxseqlen}"
    return {
        f"train_step_{tag}_images_per_sec": round(
            cfg.batch_size * steps / elapsed, 3),
        f"train_step_{tag}_ms": round(elapsed / steps * 1e3, 3),
        # repeated steps on one batch must reduce the loss — a cheap
        # on-hardware "the optimizer actually learns" signal
        f"train_step_{tag}_loss_delta": round(loss1 - loss0, 4),
        f"train_step_{tag}_config":
            f"{cfg.base_model} b{cfg.batch_size} {h}x{w} "
            f"T={cfg.maxseqlen} uint8-wire devaug",
    }


def decode_bench(small: bool) -> dict:
    from rsis_tpu.config import Config
    from rsis_tpu.models.rsis import forward, init_variables

    if small:  # quick CPU sanity mode
        cfg = Config(base_model="tiny", hidden_size=32, num_classes=9,
                     maxseqlen=3, compute_dtype="bfloat16")
        h, w, batch, inner, outer = 64, 128, 2, 2, 2
    else:
        cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
                     maxseqlen=20, compute_dtype="bfloat16")
        h, w, batch, inner, outer = 512, 1024, 32, 6, 3

    rng = jax.random.PRNGKey(0)
    # param shapes are spatial-independent: init at a small geometry to
    # avoid compiling full-resolution initializers
    variables = init_variables(cfg, rng, (64, 128))

    @jax.jit
    def timed_loop(variables, x):
        def body(i, acc):
            # serial dependency: perturb the input by the running checksum
            masks, clss, stops = forward(cfg, variables,
                                         x + acc.astype(x.dtype) * 1e-6)
            return acc + (masks[0, 0, 0, 0].astype(jnp.float32)
                          + stops.mean().astype(jnp.float32))
        return lax.fori_loop(0, inner, body, jnp.float32(0.0))

    x = jax.random.normal(rng, (batch, h, w, 3), jnp.float32)
    for attempt in range(3):  # back off batch size on OOM
        try:
            float(timed_loop(variables, x))  # compile + warmup
            break
        except Exception:
            batch = max(1, batch // 2)
            x = jax.random.normal(rng, (batch, h, w, 3), jnp.float32)
            if attempt == 2:
                raise

    start = time.perf_counter()
    for _ in range(outer):
        float(timed_loop(variables, x))
    elapsed = time.perf_counter() - start
    images_per_sec = batch * inner * outer / elapsed

    metric = ("bench_smoke_images_per_sec" if small
              else "cityscapes_512x1024_decode_images_per_sec")
    return {
        "metric": metric,
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(
            images_per_sec / REFERENCE_IMAGES_PER_SEC_ESTIMATE, 3),
    }


def main():
    small = os.environ.get("BENCH_SMALL", "") == "1"
    if small:
        jax.config.update("jax_platforms", "cpu")

    line = decode_bench(small)
    # HEADLINE FIRST: everything below is optional enrichment — if a later
    # phase hangs past the driver's timeout, this line is what survives
    print(json.dumps(line), flush=True)

    if os.environ.get("BENCH_FAST", "") == "1":
        return
    # secondary metrics appended to the same (re-printed) JSON line: full
    # training-step throughput at the curriculum-start and canonical T
    # (the reference's only perf signal was wall-clock per print_every,
    # src/train.py:397-401 — it never published a number). Each phase only
    # starts while the wall-clock budget allows; the compile itself cannot
    # be preempted, so the margins are sized for a cold compile (~300 s
    # over the tunnel; warm cache makes them nearly free).
    # experimental-kernel kill-switches, tried in order after a failure:
    # one bad kernel must degrade the train metric to its fallback number,
    # never erase it (round 3 lost both train benches to exactly this).
    # The env vars are read at TRACE time, and every retry rebuilds the
    # jitted step via make_train_step, so flipping them here takes effect.
    kill_switch_sets = (
        {},                                           # shipped defaults
        {"RSIS_DYFOLD": "0", "RSIS_PALLAS_DWT": "0",
         "RSIS_HEAD_VPU": "0"},         # experimental kernel variants off
        {"RSIS_DYFOLD": "0", "RSIS_PALLAS_DWT": "0", "RSIS_HEAD_VPU": "0",
         "RSIS_TRAIN_ROWMAJOR": "0"},                 # XLA training path
    )
    for T, margin_s in ((5, 600.0), (20, 700.0)):
        if small and T != 5:
            break
        if _remaining_s() < margin_s:
            line[f"train_step_T{T}_skipped"] = (
                f"budget: {_remaining_s():.0f}s left < {margin_s:.0f}s")
            break
        for switches in kill_switch_sets:
            os.environ.update(switches)
            try:
                line.update(train_step_bench(small, T=T))
                if switches:
                    line[f"train_step_T{T}_regressed_kernels"] = \
                        ",".join(sorted(switches))
                break
            except Exception as e:  # the headline metric must still stand
                line[f"train_step_T{T}_error"] = \
                    f"{type(e).__name__}: {e}"[:200]
                if _remaining_s() < margin_s / 2:
                    break
        for k in kill_switch_sets[-1]:  # restore defaults for the next T
            os.environ.pop(k, None)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
