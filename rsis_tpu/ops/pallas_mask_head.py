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


def _head_kernel(pre_ref, body_ref, post_ref, k9_ref, ucat_ref, bias_ref,
                 out_ref, z_ref, qe_ref, qo_ref, ye_ref,
                 *, th, w, c, h, hr):
    """One row-tile: 2*th output rows of one batch element.

    pre/body/post: 1+th+1 row halo decomposition of the input — aligned
    halo blocks whose last (pre) / first (post) row is the halo row,
    clamped at edges where every clamped-row contribution is zero-weighted
    (see module docstring). Input blocks are channel-planes-major
    (1, C, th, W) — contiguous plane reads; a sublane-strided read of the
    native (1, th, C, W) layout measured 4x slower on hardware.
    k9 (9, C) f32 tap weights, ucat (3W, 2W) stacked column operators,
    bias (1, 1) f32. Scratch: z (9*(th+2), W) input dtype,
    qe/qo (9*(th+1), W) f32, ye (2*th, 3W) phase-stacked matmul operand.
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

    # ---- 4. column interp matmul + interleaved writes ----
    bias = bias_ref[0, 0]
    eo = mxu_dot(ye_ref[...], ucat_ref[...]) + bias
    for i in range(th):
        out_ref[0, 2 * i] = eo[i].astype(out_ref.dtype)
        out_ref[0, 2 * i + 1] = eo[th + i].astype(out_ref.dtype)


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


def _head_call(x, kernel, bias, *, b, c, h, w, interpret):
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
        scratch_shapes=[
            pltpu.VMEM((9 * (th + 2), w), dtype),
            pltpu.VMEM((9 * (th + 1), w), jnp.float32),
            pltpu.VMEM((9 * (th + 1), w), jnp.float32),
            pltpu.VMEM((2 * th, 3 * w), dtype),
        ],
        interpret=interpret,
    )(x, x, x, k9, ucat, bias2)
    return out[..., None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mask_head_pallas(hs: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, interpret: bool = False
                     ) -> jnp.ndarray:
    """conv3x3(upsample_2x_align_corners(h)) as one fused Pallas kernel.

    Args:
      hs: (B, H, C, W) finest hidden states (the Pallas decode layout;
        transposed to channel-planes-major for contiguous plane reads).
      kernel: (3, 3, C, 1) HWIO conv weight.
      bias: (1,).
    Returns:
      (B, 2H, 2W, 1) mask logits, dtype of hs.
    """
    b, h, c, w = hs.shape
    ht = jnp.moveaxis(hs, 2, 1)  # fuses into the producer; measured ~free
    return _head_call(ht, kernel, bias, b=b, c=c, h=h, w=w,
                      interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mask_head_pallas_t(ht: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, interpret: bool = False
                       ) -> jnp.ndarray:
    """mask_head_pallas on a channel-planes-major (B, C, H, W) input
    (contiguous plane reads; the caller pays the transpose)."""
    b, c, h, w = ht.shape
    return _head_call(ht, kernel, bias, b=b, c=c, h=h, w=w,
                      interpret=interpret)


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
