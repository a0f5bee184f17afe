"""Minimal-context bisect of the lane-packed dwt in-step fault.

Round-4 finding (docs/PERF.md): the one-pass dwt kernel's lane-packed
variant (pack > 1, i.e. cell width < 128 lanes) passes interpret mode AND
isolated silicon runs at every cell geometry/dtype, yet faults with
``TPU backend error (Internal)`` when embedded in the full train step
(`RSIS_PALLAS_DWT=32` at the cityscapes recipe). The shipped guard
(`ops/pallas_decode_vjp._dwt_kernel_enabled`, auto = W >= 256) is an
empirical workaround; this script shrinks the fault to the SMALLEST
context that reproduces it so the guard has a committed repro + compiler
signature and can be retired when the toolchain fixes it.

Round-5 status (2026-08-20, v5e): at round-4's faulting geometry (cell2,
ch=32, pack=2) ALL six ladder levels now PASS — and so does the full
step at ch=64 (pack=4). The fault survives only at ch=128 (cell0,
pack=8, 8x16): `RSIS_PALLAS_DWT=128` (or "all") still dies with
``TPU backend error (Internal)`` at run time. The default geometry
below is therefore cell0; `REPRO_CH=32` reruns round 4's target.

Context ladder at the target geometry (cx=2ch, b=32, bf16), each level
run in a FRESH process (a faulted TPU client can poison later work in
the same process):

  kernel        isolated weight_grad_rowmajor call   (known PASS)
  cell          custom_vjp cell grad, single step
  scan          the same cell inside lax.scan over T=20, grad wrt weights
  scan-donate   scan + jit with donated carry (the train step's donation)
  step          full train step, RSIS_PALLAS_DWT=32  (known FAIL)
  step-nodyfold full step with RSIS_DYFOLD=0 — isolates kernel coexistence

Usage:
  python scripts/repro_dwt_fault.py            # run the whole ladder
  python scripts/repro_dwt_fault.py <level>    # one level, in-process
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = ["kernel", "cell", "scan", "scan-donate", "step", "step-nodyfold"]
# Geometry by hidden width (REPRO_CH). Round-5 in-step bisect on v5e
# (2026-08-20, docs/PERF.md round 5): pack=2 (ch=32) and pack=4 (ch=64)
# now PASS the full step individually; only pack=8 — cell0, ch=128,
# 8x16 — still faults, so that is the default repro target. ch=32 was
# round 4's faulting geometry (it passed the whole ladder at HEAD).
CH = int(os.environ.get("REPRO_CH", "128"))
CX, W = 2 * CH, 16 * (128 // CH)
H, B, T = W // 2, 32, 20
# REPRO_SMALL=1: tiny batch/T + interpret-on-CPU self-test of the ladder
if os.environ.get("REPRO_SMALL"):
    B, T = 2, 3


def _interpret():
    import jax
    return jax.default_backend() != "tpu"


def _setup_jax():
    import jax
    if os.environ.get("REPRO_SMALL"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    return jax


def _cell_inputs(jax, jnp):
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    dt = jnp.bfloat16
    from rsis_tpu.ops.pallas_decode import pack_cell_weights, pad_hcw
    x = jax.random.normal(ks[0], (B, H, CX, W), dt)
    hp = jax.random.normal(ks[1], (B, H, CH, W), dt)
    cp = jax.random.normal(ks[2], (B, H, CH, W), dt)
    kern = jax.random.normal(ks[3], (3, 3, CX + CH, 4 * CH), dt) * 0.3
    s = jax.random.normal(ks[4], (B, H, 4 * CH, W), dt) * 0.2
    wt = pack_cell_weights(kern, CX, CH, dtype=dt)
    return pad_hcw(x), hp, cp, s, wt


def run_kernel():
    jax = _setup_jax()
    import jax.numpy as jnp
    from rsis_tpu.ops.pallas_decode import pad_hcw
    from rsis_tpu.ops.pallas_decode_vjp import weight_grad_rowmajor
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    dt = jnp.bfloat16
    hp = jax.random.normal(ks[0], (B, H, CH, W), dt)
    x_pad = pad_hcw(jax.random.normal(ks[1], (B, H, CX, W), dt))
    dg = jax.random.normal(ks[2], (B, H, 4 * CH, W), dt)
    out = weight_grad_rowmajor(hp, x_pad, dg, cx=CX, ch=CH,
                               interpret=_interpret())
    return float(jnp.sum(out))


def run_cell():
    jax = _setup_jax()
    import jax.numpy as jnp
    from rsis_tpu.ops.pallas_decode_vjp import make_fused_cell_vjp
    x_pad, hp, cp, s, wt = _cell_inputs(jax, jnp)
    cell = make_fused_cell_vjp(CX, CH, interpret=_interpret())

    def obj(wt):
        hh, cc = cell(hp, x_pad, cp, s, wt)
        return jnp.sum(hh.astype(jnp.float32)) + jnp.sum(
            cc.astype(jnp.float32))

    g = jax.jit(jax.grad(obj))(wt)
    return float(jnp.sum(g.astype(jnp.float32)))


def _scan_obj(jax, jnp, donate: bool):
    from jax import lax
    from rsis_tpu.ops.pallas_decode_vjp import make_fused_cell_vjp
    x_pad, hp, cp, s, wt = _cell_inputs(jax, jnp)
    cell = make_fused_cell_vjp(CX, CH, interpret=_interpret())

    def obj(wt):
        def body(carry, _):
            hh, cc = carry
            hh, cc = cell(hh, x_pad, cp, s, wt)
            return (hh, cc), jnp.sum(hh.astype(jnp.float32))
        (_, _), ys = lax.scan(body, (hp, cp), jnp.arange(T))
        return jnp.sum(ys)

    fn = jax.grad(obj)
    fn = jax.jit(fn, donate_argnums=(0,) if donate else ())
    g = fn(wt)
    return float(jnp.sum(g.astype(jnp.float32)))


def run_scan():
    jax = _setup_jax()
    import jax.numpy as jnp
    return _scan_obj(jax, jnp, donate=False)


def run_scan_donate():
    jax = _setup_jax()
    import jax.numpy as jnp
    return _scan_obj(jax, jnp, donate=True)


def run_step():
    # full bench train step; RSIS_PALLAS_DWT=32 already set by the driver
    jax = _setup_jax()
    import numpy as np
    import jax.numpy as jnp
    from bench import _synthetic_wire_batch
    from rsis_tpu.config import Config
    from rsis_tpu.train.step import (StepFlags, create_train_state,
                                     make_train_step)
    from rsis_tpu.models.rsis import init_variables
    cfg = Config(base_model="resnet101", hidden_size=128, num_classes=9,
                 imsize=256, maxseqlen=T, gt_maxseqlen=20, batch_size=32,
                 augment=True, compute_dtype="bfloat16")
    variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
    state = create_train_state(cfg, variables)
    rng = np.random.default_rng(0)
    imgs, tgt = _synthetic_wire_batch(rng, 32, 256, 512, 20, 9)
    flags = StepFlags(use_class_loss=jnp.float32(1.0),
                      use_stop_loss=jnp.float32(1.0),
                      update_encoder=jnp.float32(1.0))
    train_step, _ = make_train_step(cfg, donate=True)
    state, metrics = train_step(state, (jax.device_put(imgs),
                                        jax.device_put(tgt)),
                                flags, jax.random.PRNGKey(1))
    return float(metrics[0])


RUNNERS = {"kernel": run_kernel, "cell": run_cell, "scan": run_scan,
           "scan-donate": run_scan_donate, "step": run_step,
           "step-nodyfold": run_step}


def main():
    if len(sys.argv) > 1:  # child: one level in-process
        level = sys.argv[1]
        os.environ["RSIS_PALLAS_DWT"] = str(CH)
        if level == "step-nodyfold":
            os.environ["RSIS_DYFOLD"] = "0"
        val = RUNNERS[level]()
        print(f"LEVEL {level}: PASS checksum={val:.4f}", flush=True)
        return

    levels = LEVELS
    if os.environ.get("REPRO_SMALL"):  # CPU self-test: no full-step levels
        levels = [lv for lv in LEVELS if not lv.startswith("step")]
    results = {}
    for level in levels:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), level],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ, "PYTHONPATH": "/root/repo:/root/.axon_site"})
        dt = time.time() - t0
        if p.returncode == 0 and "PASS" in p.stdout:
            results[level] = "PASS"
            print(f"{level:14s} PASS  ({dt:.0f}s)", flush=True)
        else:
            results[level] = "FAULT"
            sig = (p.stderr.strip().splitlines() or ["<no stderr>"])[-1]
            print(f"{level:14s} FAULT ({dt:.0f}s)  signature: {sig[:200]}",
                  flush=True)
    first = next((lv for lv in levels if results[lv] == "FAULT"), None)
    print(f"\nminimal faulting context: {first or 'none (all pass)'}",
          flush=True)


if __name__ == "__main__":
    main()
