"""Fused banded mask head: conv3x3(upsample2x_align_corners(h)) in Pallas.

The decoder's mask head (reference: src/modules/model.py:163-167) upsamples
the finest ConvLSTM hidden state 2x (align_corners=True) and applies a 3x3
conv to 1 channel. ops/mask_head.mask_head_fused evaluates the composition
as dense interpolation matmuls — exact, but it spends 12 dense einsums
(~1.6 GFLOP/img at the bench geometry) on interpolation matrices that are
2-banded, and measures ~1.4 ms/step at B=32 (docs/PERF.md). Expressing the
banded structure in plain XLA loses even harder (~10 ms): the (9, N, 2H, W)
tap intermediates round-trip HBM.

This kernel keeps the taps in VMEM. Structure per (batch, row-tile) grid
program, exploiting the phase-split regularity of align-corners 2x
interpolation (floor(2m(H-1)/(2H-1)) == m-1, floor((2m+1)(H-1)/(2H-1)) == m):

  q[2m]   = a[m] z[m-1] + b[m] z[m]      a[m] = m/(2H-1),   b = 1 - a
  q[2m+1] = c[m] z[m]   + d[m] z[m+1]    d[m] = (H-1-m)/(2H-1), c = 1 - d

  1. channel contraction  z_t = sum_c k9[t, c] * plane_c   (VPU MACs over
     contiguous (th+2, W) channel planes — input arrives (B, C, H, W))
  2. banded row upsample + the conv's row shift: even/odd output phases
     assembled from two shifted (th+1, W) block combinations per tap; the
     dy-sum folds the tap axis 9 -> 3 before any matmul
  3. ONE dense matmul for both phases stacked: (2*th, 3W) @ (3W, 2W)
     against the column interp matrices (the dx lane shift is
     pre-composed into the matrix) — full-M MXU occupancy at th=64
  4. bias + interleaved row writes of the (1, 2*th, 2W) output block

Measured at the bench geometry (B=32, 256x8x512 -> 512x1024, bf16):
0.67 ms/step vs 1.39 for mask_head_fused (the producer-fused transpose to
planes-major is ~free; reading the native layout sublane-strided in the
kernel instead measured 2.4 ms).

Out-of-image halo rows from the clamped index maps need no explicit
masking: a[0] == 0 and d[H-1] == 0 exactly, and the only two genuinely
out-of-range q rows (q[-1] on the first tile, q[2H] on the last) are
zeroed by grid-position masks.

Inference-path only (linear op; the training step keeps the autodiff'd
mask_head_fused). Equivalence vs mask_head_fused is tested in interpret
mode (tests/test_pallas_mask_head.py); the hardware path is exercised by
bench.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import mxu_dot
from .upsample import _interp_matrix


@functools.lru_cache(maxsize=32)
def _col_cat_matrix(w: int) -> np.ndarray:
    """(3W, 2W) stacked column operators: block dx holds the W -> 2W
    align-corners interp matrix with the conv's dx-1 lane shift composed
    (shift after matmul == shifting the matrix's columns, zero fill)."""
    u_t = _interp_matrix(w, 2 * w).T  # (W, 2W)
    blocks = []
    for dx in range(3):
        delta = dx - 1
        m = np.zeros_like(u_t)
        lo = max(0, -delta)
        hi = min(2 * w, 2 * w - delta)
        m[:, lo:hi] = u_t[:, lo + delta:hi + delta]
        blocks.append(m)
    return np.concatenate(blocks, axis=0)


def _fill_phase_blocks(pre_ref, body_ref, post_ref, k9_ref,
                       z_ref, qe_ref, qo_ref, ye_ref,
                       *, th, w, c, h, hr):
    """Stages 1-3 shared by both kernel tails: fill ye (2*th, 3W) with the
    dy-summed, row-upsampled tap blocks (even-phase rows stacked over
    odd-phase rows; dx-major column blocks).

    pre/body/post: 1+th+1 row halo decomposition of the input — aligned
    halo blocks whose last (pre) / first (post) row is the halo row,
    clamped at edges where every clamped-row contribution is zero-weighted
    (see module docstring). Input blocks are channel-planes-major
    (1, C, th, W) — contiguous plane reads; a sublane-strided read of the
    native (1, th, C, W) layout measured 4x slower on hardware.
    k9 (9, C) f32 tap weights. Scratch: z (9*(th+2), W) input dtype,
    qe/qo (9*(th+1), W) f32, ye (2*th, 3W).
    """
    ri = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    dt = z_ref.dtype
    zs = th + 2
    qs = th + 1

    def plane(ch):
        return body_ref[0, ch]              # (th, W)

    def pre_row(ch):
        return pre_ref[0, ch, hr - 1]       # (W,)

    def post_row(ch):
        return post_ref[0, ch, 0]

    # ---- 1. channel contraction into per-tap row blocks ----
    for t in range(9):
        acc = None
        pr = None
        po = None
        for ch in range(c):
            kv = k9_ref[t, ch].astype(jnp.float32)
            term = kv * plane(ch).astype(jnp.float32)       # (th, W)
            acc = term if acc is None else acc + term
            tp = kv * pre_row(ch).astype(jnp.float32)       # (W,)
            pr = tp if pr is None else pr + tp
            tb = kv * post_row(ch).astype(jnp.float32)
            po = tb if po is None else po + tb
        z0 = t * zs
        z_ref[z0] = pr.astype(dt)
        z_ref[z0 + 1:z0 + 1 + th] = acc.astype(dt)
        z_ref[z0 + 1 + th] = po.astype(dt)

    # ---- 2. banded row upsample: even/odd phases per tap ----
    # phase weights for global rows m = r0 + i (qe) / r0 + i - 1 (qo)
    r0 = ri * th
    denom = jnp.float32(2 * h - 1)
    i_e = (jax.lax.broadcasted_iota(jnp.int32, (qs, 1), 0) + r0
           ).astype(jnp.float32)
    a_w = i_e / denom
    b_w = 1.0 - a_w
    i_o = i_e - 1.0
    d_w = (jnp.float32(h - 1) - i_o) / denom
    c_w = 1.0 - d_w
    # q[-1] exists only off the top of the image; q[2H] off the bottom
    mask_top = jnp.where(ri > 0, 1.0, 0.0).astype(jnp.float32)
    mask_bot = jnp.where(ri < n_tiles - 1, 1.0, 0.0).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (qs, 1), 0)
    qo_mask = jnp.where(row_ids == 0, mask_top, 1.0)
    qe_mask = jnp.where(row_ids == th, mask_bot, 1.0)

    for t in range(9):
        z0 = t * zs
        z_lo = z_ref[z0:z0 + qs].astype(jnp.float32)       # rows m-1
        z_hi = z_ref[z0 + 1:z0 + 1 + qs].astype(jnp.float32)  # rows m
        q0 = t * qs
        qe_ref[q0:q0 + qs] = (a_w * z_lo + b_w * z_hi) * qe_mask
        qo_ref[q0:q0 + qs] = (c_w * z_lo + d_w * z_hi) * qo_mask

    # ---- 3. dy-sum into the (2*th, 3W) matmul operand: even-phase rows
    # in the top half, odd-phase in the bottom, so one full-M MXU matmul
    # covers both output phases ----
    for dx in range(3):
        t0, t1, t2 = dx, 3 + dx, 6 + dx  # taps (dy=0..2, this dx)
        e0, e1, e2 = (t * qs for t in (t0, t1, t2))
        ye = (qo_ref[e0:e0 + th]
              + qe_ref[e1:e1 + th]
              + qo_ref[e2 + 1:e2 + 1 + th])
        yo = (qe_ref[e0:e0 + th]
              + qo_ref[e1 + 1:e1 + 1 + th]
              + qe_ref[e2 + 1:e2 + 1 + th])
        ye_ref[:th, dx * w:(dx + 1) * w] = ye.astype(dt)
        ye_ref[th:, dx * w:(dx + 1) * w] = yo.astype(dt)


def _head_kernel(pre_ref, body_ref, post_ref, k9_ref, ucat_ref, bias_ref,
                 out_ref, z_ref, qe_ref, qo_ref, ye_ref,
                 *, th, w, c, h, hr):
    """Matmul tail: one dense (2*th, 3W) @ (3W, 2W) column-interp matmul
    (ucat (3W, 2W) stacked column operators, bias (1, 1) f32), then
    row-interleaved writes of the (1, 2*th, 2W) output block."""
    _fill_phase_blocks(pre_ref, body_ref, post_ref, k9_ref,
                       z_ref, qe_ref, qo_ref, ye_ref,
                       th=th, w=w, c=c, h=h, hr=hr)
    bias = bias_ref[0, 0]
    eo = mxu_dot(ye_ref[...], ucat_ref[...]) + bias
    for i in range(th):
        out_ref[0, 2 * i] = eo[i].astype(out_ref.dtype)
        out_ref[0, 2 * i + 1] = eo[th + i].astype(out_ref.dtype)


def _head_kernel_vpu(pre_ref, body_ref, post_ref, k9_ref, bias_ref,
                     out_ref, z_ref, qe_ref, qo_ref, ye_ref,
                     *, th, w, c, h, hr):
    """Banded-column VPU tail: the dense column matmul is 2-banded per
    output phase, so evaluate it as 4 lane rolls + 12 per-lane FMAs over
    the (2*th, W) dx blocks instead of a (2*th, 3W) @ (3W, 2W) MXU pass
    (0.48 ms of the 0.67 ms step at the bench geometry).

    Derivation (U the (W, 2W) align-corners column interp, δ = dx-1 the
    conv's output-column shift, out[:, j] = Σ_dx (y_dx @ U)[:, j+δ]):

      out[2n]   = a[n]·y1[n-1] + b[n]·y1[n] + c[n-1]·y0[n-1]
                + d[n-1]·y0[n] + c[n]·y2[n] + d[n]·y2[n+1]
      out[2n+1] = a[n]·y0[n-1] + b[n]·y0[n] + c[n]·y1[n]
                + d[n]·y1[n+1] + a[n+1]·y2[n] + b[n+1]·y2[n+1]

    with a[n] = n/(2W-1), b = 1-a, d[n] = (W-1-n)/(2W-1), c = 1-d.
    Every roll-wraparound lane lands on an exactly-zero weight (a[0],
    d[W-1], and the shifted weights zeroed at the edges), so circular
    rolls need no masking of the data.

    The even/odd lane interleave that made this tail "unexplored" in
    round 2 is done with 32-bit VPU ops only (no strided stores): round
    both phases to bf16, place even-phase bits in the low and odd-phase
    bits in the high half of an int32 lane (bf16 == the top 16 bits of
    f32), and emit an int32 (1, 2*th, W) block. The caller's
    ``lax.bitcast_convert_type`` + minor-dim reshape reinterprets it as
    the (2H, 2W) bf16 mask — physically the identical bytes on this
    little-endian backend, so XLA fuses it as a free bitcast.
    bf16-output only by construction.
    """
    _fill_phase_blocks(pre_ref, body_ref, post_ref, k9_ref,
                       z_ref, qe_ref, qo_ref, ye_ref,
                       th=th, w=w, c=c, h=h, hr=hr)
    f32 = jnp.float32
    y0 = ye_ref[:, :w].astype(f32)
    y1 = ye_ref[:, w:2 * w].astype(f32)
    y2 = ye_ref[:, 2 * w:].astype(f32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (2 * th, w), 1)
    n = pos.astype(f32)  # Mosaic iota must be integer-typed
    denom = jnp.float32(2 * w - 1)
    a_w = n / denom
    b_w = 1.0 - a_w
    d_w = (jnp.float32(w - 1) - n) / denom
    c_w = 1.0 - d_w
    first = pos == 0
    last = pos == w - 1
    wm = jnp.float32(w)
    c_m1 = jnp.where(first, 0.0, 1.0 - (wm - n) / denom)   # c[n-1]
    d_m1 = jnp.where(first, 0.0, (wm - n) / denom)         # d[n-1]
    a_p1 = jnp.where(last, 0.0, (n + 1.0) / denom)         # a[n+1]
    b_p1 = jnp.where(last, 0.0, 1.0 - (n + 1.0) / denom)   # b[n+1]

    r1p = pltpu.roll(y1, shift=1, axis=1)        # y1[n-1]
    r0p = pltpu.roll(y0, shift=1, axis=1)        # y0[n-1]
    r1m = pltpu.roll(y1, shift=w - 1, axis=1)    # y1[n+1]
    r2m = pltpu.roll(y2, shift=w - 1, axis=1)    # y2[n+1]

    bias = bias_ref[0, 0]
    oe = (a_w * r1p + b_w * y1 + c_m1 * r0p + d_m1 * y0
          + c_w * y2 + d_w * r2m + bias)
    oo = (a_w * r0p + b_w * y0 + c_w * y1 + d_w * r1m
          + a_p1 * y2 + b_p1 * r2m + bias)

    # lane interleave: bf16(oe) -> low half, bf16(oo) -> high half
    pe = pltpu.bitcast(oe.astype(jnp.bfloat16).astype(f32),
                       jnp.uint32) >> 16
    po = pltpu.bitcast(oo.astype(jnp.bfloat16).astype(f32),
                       jnp.uint32) & jnp.uint32(0xFFFF0000)
    packed = pltpu.bitcast(po | pe, jnp.int32)
    for i in range(th):
        out_ref[0, 2 * i] = packed[i]
        out_ref[0, 2 * i + 1] = packed[th + i]


def _pick_tile(h: int) -> int:
    for th in (64, 32, 16, 8):
        if h % th == 0:
            return th
    return h


def pallas_head_available(shape) -> bool:
    """(B, H, C, W) geometry the hardware kernel supports: H tileable into
    even tiles (the 1-row halo blocks are addressed as 2-row aligned
    blocks) and full-lane W (the ye/yo scratch is sliced at W-column
    boundaries, which must stay 128-aligned for Mosaic stores)."""
    _, h, _, w = shape
    th = _pick_tile(h)
    return h % th == 0 and th % 8 == 0 and w % 128 == 0


def _head_call(x, kernel, bias, *, b, c, h, w, interpret,
               variant="matmul"):
    dtype = x.dtype
    th = _pick_tile(h)
    n_tiles = h // th
    k9 = kernel[..., 0].reshape(9, c).astype(jnp.float32)
    ucat = jnp.asarray(_col_cat_matrix(w), dtype)
    bias2 = bias.reshape(1, 1).astype(jnp.float32)

    # (B, C, H, W): halo blocks live on the sublane dim, so Mosaic needs
    # them 8-row aligned (2-row blocks are only legal when they span the
    # whole dim)
    hr = 8 if th % 8 == 0 else 2
    body = pl.BlockSpec((1, c, th, w), lambda bi, ri: (bi, 0, ri, 0),
                        memory_space=pltpu.VMEM)
    pre = pl.BlockSpec(
        (1, c, hr, w),
        lambda bi, ri: (bi, 0, jnp.maximum(ri * (th // hr) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    post = pl.BlockSpec(
        (1, c, hr, w),
        lambda bi, ri: (bi, 0, jnp.minimum(ri * (th // hr) + th // hr,
                                           h // hr - 1), 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * th, 2 * w),
                            lambda bi, ri: (bi, ri, 0),
                            memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((9 * (th + 2), w), dtype),
        pltpu.VMEM((9 * (th + 1), w), jnp.float32),
        pltpu.VMEM((9 * (th + 1), w), jnp.float32),
        pltpu.VMEM((2 * th, 3 * w), dtype),
    ]
    if variant == "vpu":
        assert dtype == jnp.bfloat16, (
            "the VPU tail packs bf16 pairs into int32 lanes")
        kern = functools.partial(_head_kernel_vpu, th=th, w=w, c=c, h=h,
                                 hr=hr)
        out_i32 = pl.pallas_call(
            kern,
            grid=(b, n_tiles),
            in_specs=[pre, body, post,
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2 * th, w),
                                   lambda bi, ri: (bi, ri, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 2 * h, w), jnp.int32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, x, x, k9, bias2)
        # reinterpret the packed lanes as bf16 pairs: physically the same
        # bytes (little-endian), so this is a free bitcast + minor-dim
        # merge, not a data movement pass
        out = jax.lax.bitcast_convert_type(
            out_i32, jnp.bfloat16).reshape(b, 2 * h, 2 * w)
        return out[..., None]
    kern = functools.partial(_head_kernel, th=th, w=w, c=c, h=h, hr=hr)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[pre, body, post,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, x, k9, ucat, bias2)
    return out[..., None]


def _head_variant(shape, dtype) -> str:
    """Kernel-tail policy, resolved in plain Python at the call boundary
    (env-dependent choices must never be read inside jitted bodies —
    cached traces ignore later env flips; see pallas_decode._dyfold_pick).

    RSIS_HEAD_VPU=1 forces the banded VPU tail where eligible, =0 forces
    the matmul tail; default auto follows the silicon A/Bs (docs/PERF.md).
    The VPU tail is bf16-only (it packs bf16 pairs into int32 lanes)."""
    eligible = dtype == jnp.bfloat16 and pallas_head_available(shape)
    v = os.environ.get("RSIS_HEAD_VPU", "")
    if v == "0" or not eligible:
        return "matmul"
    if v == "1":
        return "vpu"
    # auto, by measured step-level A/Bs on v5e (2026-08-19, docs/PERF.md
    # round 4): the VPU tail wins the decode bench at head width 512
    # (175.3 vs 170.6 img/s, scripts/perf_probe_head.py) but LOSES the
    # train step at head width 256 (254.2 vs 262.7 ms at T=20,
    # scripts/perf_probe_head_train.py) — the rolls+FMA chain beats the
    # dense column matmul only once the lane dim is wide enough.
    return "vpu" if shape[3] >= 512 else "matmul"


def mask_head_pallas(hs: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, interpret: bool = False,
                     variant: str | None = None) -> jnp.ndarray:
    """conv3x3(upsample_2x_align_corners(h)) as one fused Pallas kernel.

    Args:
      hs: (B, H, C, W) finest hidden states (the Pallas decode layout;
        transposed to channel-planes-major for contiguous plane reads).
      kernel: (3, 3, C, 1) HWIO conv weight.
      bias: (1,).
      variant: "matmul" | "vpu" kernel tail; None resolves the policy
        (and the RSIS_HEAD_VPU override) here, outside jit.
    Returns:
      (B, 2H, 2W, 1) mask logits, dtype of hs.
    """
    if variant is None:
        variant = _head_variant((hs.shape[0], hs.shape[1], hs.shape[2],
                                 hs.shape[3]), hs.dtype)
    return _mask_head_pallas_jit(hs, kernel, bias, interpret=interpret,
                                 variant=variant)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def _mask_head_pallas_jit(hs, kernel, bias, *, interpret: bool,
                          variant: str):
    b, h, c, w = hs.shape
    ht = jnp.moveaxis(hs, 2, 1)  # fuses into the producer; measured ~free
    return _head_call(ht, kernel, bias, b=b, c=c, h=h, w=w,
                      interpret=interpret, variant=variant)


def mask_head_pallas_t(ht: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, interpret: bool = False,
                       variant: str | None = None) -> jnp.ndarray:
    """mask_head_pallas on a channel-planes-major (B, C, H, W) input
    (contiguous plane reads; the caller pays the transpose)."""
    b, c, h, w = ht.shape
    if variant is None:
        variant = _head_variant((b, h, c, w), ht.dtype)
    return _mask_head_pallas_t_jit(ht, kernel, bias, interpret=interpret,
                                   variant=variant)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def _mask_head_pallas_t_jit(ht, kernel, bias, *, interpret: bool,
                            variant: str):
    b, c, h, w = ht.shape
    return _head_call(ht, kernel, bias, b=b, c=c, h=h, w=w,
                      interpret=interpret, variant=variant)


def make_mask_head_vjp(interpret: bool = False):
    """Differentiable Pallas head for the training step.

    Forward is the fused kernel; backward is the pullback of the
    mathematically identical dense formulation (ops/mask_head
    .mask_head_fused). The head is linear in ``hs``, so under jit XLA
    dead-code-eliminates the dense forward inside ``jax.vjp`` and only the
    transposed interp matmuls remain — the bwd costs what mask_head_fused's
    bwd already cost, while fwd (and its remat replay inside the scanned,
    checkpointed decode) drops from 1.39 to 0.67 ms/step at the bench
    geometry (docs/PERF.md).

    Returned signature: (hs (B, H, C, W), kernel (3,3,C,1), bias (1,)) ->
    (B, 2H, 2W, 1), matching mask_head_pallas.
    """
    from .mask_head import mask_head_fused

    def _dense(hs, kernel, bias):
        return mask_head_fused(jnp.moveaxis(hs, 2, -1), kernel, bias)

    @jax.custom_vjp
    def head(hs, kernel, bias):
        return mask_head_pallas(hs, kernel, bias, interpret=interpret)

    def fwd(hs, kernel, bias):
        return head(hs, kernel, bias), (hs, kernel, bias)

    def bwd(res, g):
        hs, kernel, bias = res
        _, pullback = jax.vjp(_dense, hs, kernel, bias)
        return pullback(g)

    head.defvjp(fwd, bwd)
    return head


def shard_head_fn(head_fn, mesh):
    """Batch-sharded shard_map wrapper for the Pallas head under a
    multi-device mesh (pallas_call has no GSPMD partitioning rule; same
    contract as ops/pallas_decode.shard_cell_fn — hs shards on batch,
    kernel/bias replicate, check_vma off for custom_vjp composition)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bsp = P(tuple(mesh.axis_names))
    rep = P()
    return shard_map(head_fn, mesh=mesh, in_specs=(bsp, rep, rep),
                     out_specs=bsp, check_vma=False)
