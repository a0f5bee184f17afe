"""Real-TPU correctness smoke for the Pallas fast paths (sub-minute after
compile cache warmup; VERDICT r2 item 6).

All Pallas unit tests run interpret-mode on CPU (this environment has no
local TPU attached to pytest), so kernel correctness *on silicon* would
otherwise rest entirely on the long bench finishing. This script is the
cheap independent check: at a small geometry it runs

  1. the Pallas row-major inference decode (ops/pallas_decode +
     ops/pallas_mask_head via models/rowmajor_decoder) vs the XLA
     fast-decoder fallback, and
  2. one training step through the custom_vjp Pallas cells
     (ops/pallas_decode_vjp via train/step.py) vs the XLA training path,

asserting element-wise closeness on device (only scalars are pulled back
over the tunnel — host transfers here run ~10 MB/s).

Usage:  python scripts/tpu_smoke.py          # on the real TPU
        SMOKE_CPU=1 python scripts/tpu_smoke.py   # CPU self-test (interpret)

Exits non-zero with a diff report on any mismatch; prints one OK line per
check otherwise.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SMOKE_CPU", "") == "1":
    jax.config.update("jax_platforms", "cpu")
# parity checks need f32 matmuls (platform default is bf16)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeat smoke runs skip the multi-minute
# remote compiles (same cache dir as bench.py)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from rsis_tpu.config import Config
from rsis_tpu.models.rsis import build_models, forward, init_variables

# tiny backbone. Inference rowmajor guard needs H%8 at EVERY pyramid
# level -> imsize 256 (levels 128,64,32,16,8); the training guard only
# needs even H -> imsize 128 (levels 64..4) keeps its compile cheap.
H_INF, W_INF = 256, 512
H_TR, W_TR = 128, 256
if os.environ.get("SMOKE_CPU", "") == "1":
    # off-TPU the inference compare degrades to fused-XLA vs plain-XLA
    # (rowmajor_path_available gates on hardware) — keep the self-test
    # geometry small; the Pallas interpret coverage lives in tests/
    H_INF, W_INF = 64, 128


def _cfg(pallas: str, imsize: int) -> Config:
    return Config(base_model="tiny", hidden_size=32, num_classes=4,
                  imsize=imsize, maxseqlen=4, gt_maxseqlen=6, batch_size=2,
                  pallas=pallas, compute_dtype="float32")


def _report(name: str, a, b, atol: float) -> bool:
    # max-abs-diff computed ON DEVICE; only the scalar crosses the tunnel
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32))))
    s = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
    ok = d <= atol * (1.0 + s)
    print(f"  {name}: max|delta|={d:.3e} scale={s:.3e} "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def check_inference_decode() -> bool:
    H, W = H_INF, W_INF
    cfg_p, cfg_x = _cfg("on", H), _cfg("off", H)
    variables = init_variables(cfg_p, jax.random.PRNGKey(0), (H, W))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3), jnp.float32)

    from rsis_tpu.models.rowmajor_decoder import rowmajor_path_available
    enc, _ = build_models(cfg_p)
    skips = jax.eval_shape(
        lambda v, xx: enc.apply(
            {"params": v["params"]["encoder"],
             "batch_stats": v["batch_stats"]["encoder"]}, xx, train=False),
        variables, x)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not rowmajor_path_available(cfg_p, skips):
        print("  geometry rejected by rowmajor guard — smoke misconfigured")
        return False

    t0 = time.time()
    mp, cp, sp = jax.jit(lambda v, x: forward(cfg_p, v, x))(variables, x)
    mx, cx, sx = jax.jit(lambda v, x: forward(cfg_x, v, x))(variables, x)
    ok = True
    ok &= _report("masks", mp, mx, 2e-5)
    ok &= _report("class logits", cp, cx, 2e-5)
    ok &= _report("stop logits", sp, sx, 2e-5)
    print(f"  (inference decode, {time.time() - t0:.1f}s incl. compile; "
          f"pallas path {'hardware' if on_tpu else 'interpret'})",
          flush=True)
    return ok


def check_train_step() -> bool:
    from rsis_tpu.train.step import (StepFlags, create_train_state,
                                     make_train_step)

    from bench import _synthetic_wire_batch  # repo-root bench.py
    from rsis_tpu.models.rowmajor_decoder import training_rowmajor_selected

    H, W = H_TR, W_TR

    def one_step(pallas: str):
        cfg = _cfg(pallas, H)
        variables = init_variables(cfg, jax.random.PRNGKey(0), (H, W))
        # prove the two configs genuinely diverge at the selection
        # predicate the step branches on (guards against a vacuous
        # pallas-vs-pallas or XLA-vs-XLA comparison)
        enc, _ = build_models(cfg)
        skips = jax.eval_shape(
            lambda v, xx: enc.apply(
                {"params": v["params"]["encoder"],
                 "batch_stats": v["batch_stats"]["encoder"]},
                xx, train=False),
            variables, jax.ShapeDtypeStruct((2, H, W, 3), jnp.float32))
        assert training_rowmajor_selected(cfg, skips) == (pallas == "on"), (
            pallas, [s.shape for s in skips])
        state = create_train_state(cfg, variables)
        rng = np.random.default_rng(0)
        imgs, tgt = _synthetic_wire_batch(rng, cfg.batch_size, H, W,
                                          cfg.gt_maxseqlen, cfg.num_classes)
        train_step, _ = make_train_step(cfg, donate=False)
        flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
        st, metrics = train_step(state, (jnp.asarray(imgs),
                                         jnp.asarray(tgt)), flags,
                                 jax.random.PRNGKey(2))
        return st, metrics

    t0 = time.time()
    st_p, m_p = one_step("on")
    st_x, m_x = one_step("off")
    ok = _report("train loss", m_p[0], m_x[0], 1e-4)
    # spot-check updated params flow through both optimizer paths equally
    a = st_p.params["decoder"]["conv_out"]["kernel"]
    b = st_x.params["decoder"]["conv_out"]["kernel"]
    ok &= _report("post-step conv_out kernel", a, b, 1e-3)
    print(f"  (train step, {time.time() - t0:.1f}s incl. compile)",
          flush=True)
    return ok


def check_matcher() -> bool:
    """Pallas LAP kernel vs the unrolled XLA JV at the train-step shape.

    Continuous random costs have a unique optimum, so the two solvers
    must return the identical permutation (the kernel's lane-padding
    handling is exactly what interpret mode cannot exercise — this is
    the silicon check; see ops/pallas_matching.py docstring)."""
    from rsis_tpu.ops.matching import hungarian, hungarian_pallas

    interpret = jax.default_backend() != "tpu"
    t0 = time.time()
    costs = jax.random.normal(jax.random.PRNGKey(3), (8, 20, 20),
                              jnp.float32) * 10.0
    ref = hungarian(costs)
    got = hungarian_pallas(costs, interpret=interpret)
    d = int(jnp.sum(jnp.abs(ref - got)))
    ok = d == 0
    print(f"  perm delta={d} {'OK' if ok else 'MISMATCH'} "
          f"({time.time() - t0:.1f}s incl. compile)", flush=True)
    return ok


def check_dyfold() -> bool:
    """dy-folded cell/dgates kernels vs the standard kernels at the REAL
    cityscapes cell4 geometry (the tiny smoke model's channels are too
    small for the tile-cost model to pick the fold, so this exercises it
    explicitly — Mosaic padding behavior at these shapes is what
    interpret mode cannot see). Runs BOTH dtypes: the training step feeds
    the kernels bfloat16, and Mosaic compiles bf16 and f32 differently
    (round 3 shipped an f32-only-smoked kernel that crashed at bf16)."""
    from rsis_tpu.ops.pallas_decode import (fused_cell_rowmajor,
                                            pack_cell_weights)
    from rsis_tpu.ops.pallas_decode_vjp import _cell_backward_dgates

    interpret = jax.default_backend() != "tpu"
    cx, ch, b, h, w = 16, 8, 4, 128, 256
    ok = True
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        k = jax.random.PRNGKey(5)
        ks = jax.random.split(k, 7)
        hp = jax.random.normal(ks[0], (b, h, ch, w), dtype)
        x = jax.random.normal(ks[1], (b, h, cx, w), dtype)
        cp = jax.random.normal(ks[2], (b, h, ch, w), dtype)
        kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch),
                                 jnp.float32) * 0.3
        s = (jax.random.normal(ks[4], (b, h, 4 * ch, w), jnp.float32)
             * 0.2).astype(dtype)
        dh = jax.random.normal(ks[5], (b, h, ch, w), dtype)
        dc = jax.random.normal(ks[6], (b, h, ch, w), dtype)
        wt = pack_cell_weights(kern, cx, ch, dtype=dtype)
        x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))

        t0 = time.time()
        tag = jnp.dtype(dtype).name
        h0, c0 = fused_cell_rowmajor(hp, x_pad, cp, s, wt, cx=cx, ch=ch,
                                     interpret=interpret, dyfold=False)
        h1, c1 = fused_cell_rowmajor(hp, x_pad, cp, s, wt, cx=cx, ch=ch,
                                     interpret=interpret, dyfold=True)
        ok &= _report(f"dyfold cell h [{tag}]", h1, h0, tol)
        ok &= _report(f"dyfold cell c [{tag}]", c1, c0, tol)
        dg0, dcp0 = _cell_backward_dgates(hp, x_pad, cp, s, wt, dh, dc,
                                          cx=cx, ch=ch, interpret=interpret,
                                          dyfold=False)
        dg1, dcp1 = _cell_backward_dgates(hp, x_pad, cp, s, wt, dh, dc,
                                          cx=cx, ch=ch, interpret=interpret,
                                          dyfold=True)
        ok &= _report(f"dyfold dgates [{tag}]", dg1, dg0, tol)
        ok &= _report(f"dyfold dc_prev [{tag}]", dcp1, dcp0, tol)
        print(f"  (dyfold cell4 geometry [{tag}], {time.time() - t0:.1f}s "
              "incl. compile)", flush=True)
    return ok


def check_head_tails() -> bool:
    """Banded VPU mask-head tail vs the matmul tail at the bench head
    geometry, bf16 (the tail is bf16-only by construction). The lane
    rolls + the bf16-pair int32 interleave/bitcast are exactly what
    interpret mode cannot exercise; round 4 made this tail the default
    (RSIS_HEAD_VPU, ops/pallas_mask_head._head_variant)."""
    from rsis_tpu.ops.pallas_mask_head import mask_head_pallas

    interpret = jax.default_backend() != "tpu"
    b, h, c, w = 2, 256, 8, 512
    if os.environ.get("SMOKE_CPU", "") == "1":
        b, h, c, w = 2, 64, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    hs = jax.random.normal(ks[0], (b, h, c, w),
                           jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (3, 3, c, 1), jnp.float32) * 0.3
    bias = jax.random.normal(ks[2], (1,), jnp.float32)
    t0 = time.time()
    vpu = mask_head_pallas(hs, k, bias, interpret=interpret, variant="vpu")
    mat = mask_head_pallas(hs, k, bias, interpret=interpret,
                           variant="matmul")
    ok = _report("head vpu-vs-matmul [bf16]", vpu, mat, 2e-2)
    print(f"  (mask-head tails, {time.time() - t0:.1f}s incl. compile)",
          flush=True)
    return ok


def check_dwt() -> bool:
    """One-pass Pallas weight-grad kernel vs the shifted-einsum oracle —
    EVERY decoder cell geometry of the train recipe, BOTH dtypes (the
    round-3 regression was a bf16-only Mosaic compile crash the f32-only
    cell4 smoke couldn't see; scripts/probe_dwt_cells.py is the full
    bisect version of this check)."""
    from rsis_tpu.ops.pallas_decode import pad_hcw
    from rsis_tpu.ops.pallas_decode_vjp import (_weight_grad,
                                                weight_grad_rowmajor)

    interpret = jax.default_backend() != "tpu"
    b = 4
    cells = [(0, 128, 8, 16), (128, 64, 16, 32), (64, 32, 32, 64),
             (32, 16, 64, 128), (16, 8, 128, 256)]
    ok = True
    for dtype, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 2e-2)):
        tag = jnp.dtype(dtype).name
        t0 = time.time()
        for i, (cx, ch, h, w) in enumerate(cells):
            ks = jax.random.split(jax.random.PRNGKey(11 + i), 3)
            hp = jax.random.normal(ks[0], (b, h, ch, w), dtype)
            x_pad = (pad_hcw(jax.random.normal(ks[1], (b, h, cx, w), dtype))
                     if cx else None)
            dg = jax.random.normal(ks[2], (b, h, 4 * ch, w), dtype)
            ref = _weight_grad(hp, x_pad, dg, cx, ch)
            out = weight_grad_rowmajor(hp, x_pad, dg, cx=cx, ch=ch,
                                       interpret=interpret)
            ok &= _report(f"dwt cell{i} [{tag}]", out, ref, tol)
        print(f"  (dwt all-cell geometries [{tag}], {time.time() - t0:.1f}s "
              "incl. compile)", flush=True)
    return ok


def main() -> int:
    # announced BEFORE backend init: when the TPU tunnel is down,
    # jax.devices() blocks indefinitely — this line makes the hang
    # identifiable in logs (observed 2026-08-18: multi-hour outage)
    print("tpu_smoke: acquiring backend...", flush=True)
    print(f"tpu_smoke on backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", flush=True)
    ok = True
    print("inference decode: pallas rowmajor vs XLA fallback", flush=True)
    ok &= check_inference_decode()
    print("training step: custom_vjp pallas cells vs XLA path", flush=True)
    ok &= check_train_step()
    print("LAP matcher: pallas kernel vs unrolled XLA JV", flush=True)
    ok &= check_matcher()
    print("dy-fold kernels: folded vs standard at cell4 geometry",
          flush=True)
    ok &= check_dyfold()
    print("dwt kernel: one-pass Pallas weight grad vs einsum oracle",
          flush=True)
    ok &= check_dwt()
    print("mask-head tails: banded VPU vs column matmul", flush=True)
    ok &= check_head_tails()
    print("SMOKE " + ("PASS" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
