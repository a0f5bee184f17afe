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

Baseline: the reference repo publishes no throughput numbers (BASELINE.md);
``vs_baseline`` is computed against an estimated 3.0 images/sec for the
reference PyTorch-0.2 pipeline on its contemporaneous single GPU (~12 GB,
README.md:113) at this geometry — the conservative estimate underlying the
>=10x north-star target. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import os
import time

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


def train_step_bench(small: bool) -> dict:
    """Images/sec of the full shipped training path at the reference's
    cityscapes recipe (scripts/train_cityscapes.sh: resnet101, hidden 128,
    batch 32, curriculum start T=5) on synthetic uint8-wire batches with
    on-device augmentation. Steps are enqueued back-to-back on donated
    state (how the real trainer runs) and synced once at the end, so the
    tunnel's dispatch latency amortizes instead of serializing."""
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
                     imsize=256, maxseqlen=5, gt_maxseqlen=20, batch_size=32,
                     augment=True, compute_dtype="bfloat16")
        h, w, steps = 256, 512, 12

    variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
    state = create_train_state(cfg, variables)
    rng = __import__("numpy").random.default_rng(0)
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
    float(metrics[0])  # sync (block_until_ready is a no-op on this backend)

    start = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, flags,
                                    jax.random.fold_in(key, 100 + i))
    float(metrics[0])
    elapsed = time.perf_counter() - start
    return {
        "train_step_images_per_sec": round(
            cfg.batch_size * steps / elapsed, 3),
        "train_step_ms": round(elapsed / steps * 1e3, 3),
        "train_step_config": "resnet101 b32 256x512 T=5 uint8-wire devaug",
    }


def main():
    small = os.environ.get("BENCH_SMALL", "") == "1"
    if small:
        jax.config.update("jax_platforms", "cpu")
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
    line = {
        "metric": metric,
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(
            images_per_sec / REFERENCE_IMAGES_PER_SEC_ESTIMATE, 3),
    }
    # secondary metric in the same single JSON line: full training-step
    # throughput (the reference's only perf signal was wall-clock per
    # print_every, src/train.py:397-401 — it never published a number)
    try:
        line.update(train_step_bench(small))
    except Exception as e:  # the headline metric must still print
        line["train_step_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
