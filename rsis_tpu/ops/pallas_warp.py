"""Exact batched affine nearest-warp as two Pallas one-hot-matmul passes.

The on-device augmentation (reference geometry:
src/dataloader/transforms/transforms.py:23-102 RandomAffine;
src/dataloader/transforms/utils.py:67-185 gather-based warp) needs, per
sample, ``out[ch, r, c] = in[ch, R(r,c), C(r,c)]`` with

  R(r,c) = clamp(round(p*r + q*c + m), 0, H-1)
  C(r,c) = clamp(round(v*r + u*c + o), 0, W-1)

XLA lowers this to a per-element gather, which on TPU pays ~per-row:
measured 31 ms for the (B*H*W)-row payload gather at the train geometry
(B=32, 256x512, 4 planes) — the single largest block of the train step
(docs/PERF.md). This module reformulates the warp so the per-element
addressing becomes MXU matmuls against one-hot interpolation matrices plus
small statically-shifted selects, with NO data-dependent gathers:

Pass 1 (column resample, per row r'):
  t_d[ch, r', c] = in[ch, r', clamp(C_H(r', c) + d)]    d in {-1, 0, +1}
  with C_H(r', c) = clamp(round(u'*c + v'*r' + o')),
  u' = u - v*q/p, v' = v/p, o' = o - v'*m.
  Realization per (sample, th-row tile): a shared one-hot matrix selects
  columns base(c) = round(u'*c + phi_tile) (one bf16 MXU matmul over
  statically shifted input copies in_k[*, j] = in[*, clip(j+k)]), then a
  per-row integer select k_sel = clip(target - base, -K, K) picks among
  the K-shifted results. Narrow tiles keep |k_sel| <= K static
  (|v'|*(th-1) + rounding slop + |d|).

Pass 2 (row resample on the transposed stack):
  out[ch, r, c] = t_{d*}[ch, R(r,c), c]
  Same machinery with rows on the lane axis; R(r,c) is computed exactly
  in closed form, so the row index is single-rounding exact. The column
  deviation from evaluating C at r' = R instead of r is |v'|*|R - (p*r +
  q*c + m)| <= |v'|/2 < 1/2, so the true column clamp(C(r,c)) is always
  one of the three d-variants: d* = clip(C - C_H(R, .), -1, 1) (closed
  form). Choosing d* per element makes the composition BIT-EXACT equal to
  the direct formula — including jnp.round's half-to-even ties, because
  every index vector is computed with jnp.round, never reconstructed from
  inequalities.

Rows that clamp (source row off the image, edge replication) would need
columns far outside the d-window, so pass 1 also emits edge planes
  e0[ch, r', c] = in[ch, 0,   clamp(round(u*c + v*r' + o))]
  e1[ch, r', c] = in[ch, H-1, clamp(round(u*c + v*r' + o))]
computed with the TRUE (u, v) per output row r' — pass 2 substitutes them
wherever the unclamped source row falls outside [0, H-1], which restores
exactness at the borders.

The per-sample horizontal flip of the augmentation pipeline folds into
the matrices (negate the column row of A|b in centred coordinates), so
the flip costs nothing here.

Cost at the train geometry: ~340 GFLOP of bf16 one-hot matmuls (one-hot
entries are exact 0/1, so bf16 selection is bit-exact) + small VPU
selects, ~4-6 ms vs 31 ms for the gather. All rounding-sensitive index
math is f32 lane arithmetic with jnp.round, matching
data/device_aug._nearest_index_map bit for bit (the host/device parity
contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import mxu_dot

# static shifted-variant windows (see derivation above; gated by
# warp_available on the per-config coefficient bounds). Row tiles are 8 —
# the Mosaic minimum sublane block.
K1 = 5          # pass-1 select window: |v'|*(TH1-1) + 1 slop + 1 (d)
K2 = 4          # pass-2 select window: |q|*(TC2-1) + 1 slop
KE = 4          # edge-plane window: |v|*(TH1-1) + 1 slop
TH1 = 8         # pass-1 row-tile
TC2 = 8         # pass-2 (transposed) row-tile
# coefficient gates making the windows sufficient (with margin):
#   |v'|*(TH1-1)+2 <= K1,  |q|*(TC2-1)+1 <= K2,  |v|*(TH1-1)+1 <= KE,
#   |v'| <= 0.9 (d* in {-1,0,1} needs |v'|/2 < 0.5)
V1_MAX = (K1 - 2) / (TH1 - 1)    # 0.43
Q_MAX = (K2 - 1) / (TC2 - 1)     # 0.43
VE_MAX = (KE - 1) / (TH1 - 1)    # 0.43
VP_MAX = 0.9


def _sel(target, base, k_lim):
    return jnp.clip(target - base, -k_lim, k_lim)


def _pass1_kernel(x_ref, coef_ref, icoef_ref, out_ref, *, ch, th, w, h,
                  n_k, n_ke):
    """One (sample, th-row) tile: emit 3 d-variant planes + 2 edge planes.

    x_ref: (1, ch, H, W) — the FULL sample (edge rows + tile rows are both
      needed; H*W*ch bf16 is ~1 MB at the train geometry, well inside
      VMEM, and Pallas keeps the block resident across the row-tile grid).
    coef_ref: (1, 8) SMEM f32: p, q, m, u, v, o, up(=u'), vp(=v') ... o'
      is derived in-kernel.
    out_ref: (1, 5*ch, th, W).
    """
    ri = pl.program_id(1)
    p = coef_ref[0, 0, 0]
    q = coef_ref[0, 0, 1]
    m = coef_ref[0, 0, 2]
    u = coef_ref[0, 0, 3]
    v = coef_ref[0, 0, 4]
    o = coef_ref[0, 0, 5]
    iu = icoef_ref[0, 0, 0]
    iv = icoef_ref[0, 0, 1]
    io = icoef_ref[0, 0, 2]

    def anchor(r_int, cols_int):
        # Q16 fixed-point candidate anchor — exact int32, reproducible
        a = iu * cols_int + (iv * r_int + io)
        a = jax.lax.shift_right_arithmetic(a + 32768, 16)
        return jnp.clip(a, 0, w - 1)

    flag = coef_ref[0, 0, 8]

    def reflect(ci):
        # flip folds in as the exact integer reflection C -> (w-1) - C
        return flag * ((w - 1) - ci) + (1.0 - flag) * ci

    r0 = (ri * th).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cols = cols_i.astype(jnp.float32)

    # shared one-hot columns for this tile: the tile-base anchor
    base = anchor(ri * th, cols_i)                          # (1, w) int32
    sub = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    onehot = (sub == base).astype(x_ref.dtype)              # (w, w)
    base_e = reflect(jnp.clip(jnp.round(v * r0 + (u * cols + o)), 0,
                              w - 1)).astype(jnp.int32)
    onehot_e = (sub == base_e).astype(x_ref.dtype)

    # A-operand: tile rows (ch*th) and the two edge rows (2*ch), each in
    # n_k statically shifted copies (edge-replicate shifts)
    tile = x_ref[0, :, pl.ds(ri * th, th), :]               # (ch, th, w)
    rows = tile.reshape(ch * th, w)
    edges = jnp.concatenate([x_ref[0, :, 0, :], x_ref[0, :, h - 1, :]],
                            axis=0)                         # (2*ch, w)

    def shifted(block, k):
        # block[*, clip(j + k, 0, w-1)] along lanes, static k
        # pads are repeated 1-lane slices (Mosaic rejects sub-32-bit
        # repeat/broadcast minor-dim insertions)
        if k == 0:
            return block
        if k > 0:
            return jnp.concatenate(
                [block[:, k:]] + [block[:, -1:]] * k, axis=1)
        return jnp.concatenate(
            [block[:, :1]] * (-k) + [block[:, :k]], axis=1)

    ks = list(range(-(n_k // 2), n_k // 2 + 1))
    kes = list(range(-(n_ke // 2), n_ke // 2 + 1))
    a_op = jnp.concatenate([shifted(rows, k) for k in ks], axis=0)
    g = mxu_dot(a_op, onehot,
                (((1,), (0,)), ((), ())))  # (n_k*ch*th, w)
    a_edge = jnp.concatenate([shifted(edges, k) for k in kes], axis=0)
    ge = mxu_dot(a_edge, onehot_e,
                 (((1,), (0,)), ((), ())))  # (n_ke*2*ch, w)

    # per-row selects
    for rr in range(th):
        r = r0 + rr
        # d-variant targets: J_d = clip(A(r', c) + d) off the int anchor
        i1 = anchor(ri * th + rr, cols_i)
        for di, d in enumerate((-1, 0, 1)):
            jd = jnp.clip(i1 + d, 0, w - 1)
            ksel = _sel(jd, base, (n_k - 1) // 2)           # (1, w) int32
            acc = jnp.zeros((ch, w), jnp.float32)
            g4 = g.reshape(n_k, ch, th, w)
            for ki, k in enumerate(ks):
                mask = (ksel == k).astype(jnp.float32)      # (1, w)
                acc = acc + mask * g4[ki, :, rr]
            out_ref[0, di * ch:(di + 1) * ch, rr, :] = \
                acc.astype(out_ref.dtype)
        # edge planes: true-coefficient columns from rows 0 / h-1
        # (canonical src_col tree: v*r + (u*c + o) — ties must match the
        # gather fallback bit for bit)
        ie = reflect(jnp.clip(jnp.round(v * r + (u * cols + o)), 0,
                              w - 1)).astype(jnp.int32)
        ksel_e = _sel(ie, base_e, (n_ke - 1) // 2)
        acc0 = jnp.zeros((ch, w), jnp.float32)
        acc1 = jnp.zeros((ch, w), jnp.float32)
        for ki, k in enumerate(kes):
            mask = (ksel_e == k).astype(jnp.float32)
            blk = ge[ki * 2 * ch:(ki + 1) * 2 * ch]
            acc0 = acc0 + mask * blk[:ch]
            acc1 = acc1 + mask * blk[ch:]
        out_ref[0, 3 * ch:4 * ch, rr, :] = acc0.astype(out_ref.dtype)
        out_ref[0, 4 * ch:5 * ch, rr, :] = acc1.astype(out_ref.dtype)


def _pass2_kernel(t_ref, coef_ref, icoef_ref, out_ref, *, ch, tc, h, w,
                  n_k):
    """One (sample, tc-col tile) of the TRANSPOSED stack.

    t_ref: (1, 5*ch, W, H) — pass-1 output transposed (last two axes
      swapped): plane[d][ch, c, r'] etc. Lanes are source rows r'.
    out_ref: (1, ch, tc, H) — out[ch, c, r] for the tile's columns.
    """
    ci = pl.program_id(1)
    p = coef_ref[0, 0, 0]
    q = coef_ref[0, 0, 1]
    m = coef_ref[0, 0, 2]
    u = coef_ref[0, 0, 3]
    v = coef_ref[0, 0, 4]
    o = coef_ref[0, 0, 5]
    flag = coef_ref[0, 0, 8]
    iu = icoef_ref[0, 0, 0]
    iv = icoef_ref[0, 0, 1]
    io = icoef_ref[0, 0, 2]

    def anchor(r_int, c_int):
        a = iu * c_int + (iv * r_int + io)
        a = jax.lax.shift_right_arithmetic(a + 32768, 16)
        return jnp.clip(a, 0, w - 1)

    c0 = (ci * tc).astype(jnp.float32)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)   # output r
    lanes_r = lanes_i.astype(jnp.float32)

    base = jnp.clip(jnp.round(p * lanes_r + (q * c0 + m)), 0,
                    h - 1).astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    onehot = (sub == base).astype(t_ref.dtype)                  # (h, h)

    # A-operand: the 3 d-variant plane groups for this column tile, in
    # n_k shifted copies along the r' lane axis
    tile = t_ref[0, :3 * ch, pl.ds(ci * tc, tc), :]             # (3ch,tc,h)
    rows = tile.reshape(3 * ch * tc, h)

    def shifted(block, k):
        # pads are repeated 1-lane slices (Mosaic rejects sub-32-bit
        # repeat/broadcast minor-dim insertions)
        if k == 0:
            return block
        if k > 0:
            return jnp.concatenate(
                [block[:, k:]] + [block[:, -1:]] * k, axis=1)
        return jnp.concatenate(
            [block[:, :1]] * (-k) + [block[:, :k]], axis=1)

    ks = list(range(-(n_k // 2), n_k // 2 + 1))
    a_op = jnp.concatenate([shifted(rows, k) for k in ks], axis=0)
    g = mxu_dot(a_op, onehot,
                (((1,), (0,)), ((), ())))  # (n_k*3ch*tc, h)
    # aligned tc-slice of the edge planes (per-column 1-slices would need
    # 8-aligned sublane starts)
    etile = t_ref[0, 3 * ch:5 * ch, pl.ds(ci * tc, tc), :]  # (2ch, tc, h)

    for cc in range(tc):
        c = c0 + cc
        rraw = p * lanes_r + (q * c + m)                 # unclamped (1,h)
        i2 = jnp.clip(jnp.round(rraw), 0, h - 1).astype(jnp.int32)
        ksel = _sel(i2, base, (n_k - 1) // 2)
        # d* = clip(C_true - A(R, c), -1, 1): C_true is the canonical f32
        # src_col tree; A is the int32 anchor, recomputed here EXACTLY as
        # pass 1 computed it (int ops are reproducible across programs,
        # f32 ones are not at the last ulp)
        ct_raw = jnp.clip(jnp.round(v * lanes_r + (u * c + o)), 0, w - 1)
        ct = (flag * ((w - 1) - ct_raw)
              + (1.0 - flag) * ct_raw).astype(jnp.int32)
        chh = anchor(i2, jnp.int32(ci * tc + cc))
        dstar = jnp.clip(ct - chh, -1, 1)                # (1, h) int32
        acc = jnp.zeros((ch, h), jnp.float32)
        g5 = g.reshape(n_k, 3, ch, tc, h)
        for di, d in enumerate((-1, 0, 1)):
            dmask = (dstar == d).astype(jnp.float32)
            part = jnp.zeros((ch, h), jnp.float32)
            for ki, k in enumerate(ks):
                mask = (ksel == k).astype(jnp.float32)
                part = part + mask * g5[ki, di, :, cc]
            acc = acc + dmask * part
        # border replication: source row off the image -> edge planes
        top = (jnp.round(rraw) < 0).astype(jnp.float32)
        bot = (jnp.round(rraw) > h - 1).astype(jnp.float32)
        mid = 1.0 - top - bot
        e0 = etile[:ch, cc].astype(jnp.float32)
        e1 = etile[ch:, cc].astype(jnp.float32)
        res = mid * acc + top * e0 + bot * e1
        out_ref[0, :, cc, :] = res.astype(out_ref.dtype)


def _coef_from_matrices(matrices: jnp.ndarray, h: int, w: int,
                        flip=None) -> jnp.ndarray:
    """(B, 3, 3) centred-coordinate matrices -> (B, 8) absolute-index
    coefficients [p, q, m, u, v, o, u', v'].

    The CANONICAL index semantics shared by the Pallas warp and the gather
    fallback (device_aug._nearest_index_map delegates here) are, in f32
    with these exact expression trees (tie-sensitive — see module
    docstring):

      src_row(r, c) = p*r + (q*c + m);  R = clip(round(src_row), 0, h-1)
      src_col(r, c) = v*r + (u*c + o);  C = clip(round(src_col), 0, w-1)

    ``flip`` (B,) bool folds a pre-warp horizontal flip into the column
    coefficients (centred flip is c -> -c on the source side)."""
    a = matrices[:, :2, :2].astype(jnp.float32)
    b = matrices[:, :2, 2].astype(jnp.float32)
    cr = np.float32(h / 2.0 - 0.5)
    cc = np.float32(w / 2.0 - 0.5)
    p = a[:, 0, 0]
    q = a[:, 0, 1]
    m = (b[:, 0] + cr) - (a[:, 0, 0] * cr + a[:, 0, 1] * cc)
    u = a[:, 1, 1]
    v = a[:, 1, 0]
    o = (b[:, 1] + cc) - (a[:, 1, 0] * cr + a[:, 1, 1] * cc)
    # a pre-warp horizontal flip is the INTEGER reflection C -> (w-1) - C
    # of the final column index (bit-exact equivalent of physically
    # flipping the image first). The folded f32 coefficients below only
    # steer the candidate windows, so their rounding is uncritical.
    if flip is None:
        flag = jnp.zeros_like(p)
    else:
        flag = jnp.asarray(flip).astype(jnp.float32)
    s = 1.0 - 2.0 * flag
    uf = u * s
    vf = v * s
    of = flag * ((w - 1) - o) + (1.0 - flag) * o
    vp = vf / p
    up = uf - vp * q
    opp = of - vp * m
    return jnp.stack([p, q, m, u, v, o, up, vp, flag, opp], axis=1)


def _anchor_coefs(coef: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) int32 fixed-point (Q16) anchor coefficients [UP, VP, OP].

    The candidate-window anchor A(r', c) = clip((UP*c + (VP*r' + OP) +
    2^15) >> 16) must be BIT-IDENTICAL between the two kernel programs
    (pass 1 defines the d-variant planes by it; pass 2 recomputes it at
    r' = R to pick d*). f32 expressions are not reproducible across
    separately compiled programs at the last ulp (XLA may contract
    mul+add to fma differently), so the anchor uses int32 arithmetic,
    which is exact. Accuracy only affects the window margin: Q16
    quantisation adds <= 2^-16 * (r + c) ~ 0.012 px, absorbed by the
    d in {-1,0,1} window (module docstring bound)."""
    up, vp, opp = coef[:, 6], coef[:, 7], coef[:, 9]
    s = jnp.float32(65536.0)
    return jnp.stack([jnp.round(up * s), jnp.round(vp * s),
                      jnp.round(opp * s)], axis=1).astype(jnp.int32)


def nearest_index_maps(matrices: jnp.ndarray, h: int, w: int,
                       flip=None) -> jnp.ndarray:
    """(B, H*W) flat source indices of the canonical nearest warp — the
    gather-path twin of affine_warp_planes (bit-identical semantics; used
    as the fallback when warp_available is False and as the test oracle)."""
    coef = _coef_from_matrices(matrices, h, w, flip)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)

    def one(cf):
        p, q, m, u, v, o = (cf[i] for i in range(6))
        flag = cf[8].astype(jnp.int32)
        ri = jnp.clip(jnp.round(p * rows + (q * cols + m)), 0,
                      h - 1).astype(jnp.int32)
        ci = jnp.clip(jnp.round(v * rows + (u * cols + o)), 0,
                      w - 1).astype(jnp.int32)
        ci = jnp.where(flag > 0, (w - 1) - ci, ci)
        return ri * w + ci

    return jax.vmap(one)(coef)


def warp_coefficient_bounds(rotation: float, shear: float,
                            zoom_range, translation: float) -> dict:
    """Conservative worst-case |coef| bounds over the augmentation ranges
    (R @ T @ Sh @ Z composition of data/device_aug.sample_affine_matrices),
    used by warp_available's static gate."""
    import math
    th = math.radians(abs(rotation))
    sh = math.radians(abs(shear))
    zmin, zmax = (1.0, 1.0) if zoom_range is None else zoom_range
    zhi = max(abs(zmin), abs(zmax), 1e-6)
    zlo = max(min(abs(zmin), abs(zmax)), 1e-6)
    # exact A = R @ Sh @ Z of sample_affine_matrices (T only offsets b):
    #   A = [[cos(t)*z0, -sin(t+s)*z1], [sin(t)*z0, cos(t+s)*z1]]
    p_min = math.cos(th) * zlo
    q_max = math.sin(th + sh) * zhi
    v_max = math.sin(th) * zhi
    u_min = (math.cos(th + sh) * zlo) if th + sh < math.pi / 2 else 0.0
    vp_max = v_max / max(p_min, 1e-6)
    up_max = zhi + vp_max * q_max
    return {"p_min": p_min, "q_max": q_max, "v_max": v_max,
            "u_min": u_min, "vp_max": vp_max, "up_max": up_max}


def warp_available(h: int, w: int, rotation: float, shear: float,
                   zoom_range, translation: float) -> bool:
    """Static gate: geometry tiles + lane alignment + coefficient windows.

    Falls back to the gather path (device_aug) when False."""
    if h % 128 != 0 or w % 128 != 0:
        return False
    if h % TH1 != 0 or w % TC2 != 0:
        return False
    b = warp_coefficient_bounds(rotation, shear, zoom_range, translation)
    if b["p_min"] <= 0.1 or b["u_min"] <= 0.1:
        return False
    return (b["vp_max"] <= min(V1_MAX, VP_MAX)
            and b["q_max"] <= Q_MAX and b["v_max"] <= VE_MAX)


@functools.partial(jax.jit, static_argnames=("interpret",))
def affine_warp_planes(x: jnp.ndarray, matrices: jnp.ndarray,
                       flip: jnp.ndarray | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Exact nearest-neighbour affine warp of channel planes.

    Args:
      x: (B, CH, H, W) planes (any float dtype; bf16 on the train path).
      matrices: (B, 3, 3) centred-coordinate affine matrices
        (device_aug.sample_affine_matrices).
      flip: optional (B,) bool — fold a pre-warp horizontal flip in.
    Returns:
      (B, CH, H, W) warped planes, bit-identical to the direct
      clamped-round-gather (tests/test_pallas_warp.py).
    """
    b, ch, h, w = x.shape
    coef = _coef_from_matrices(matrices, h, w, flip)
    n_k1 = 2 * K1 + 1
    n_ke = 2 * KE + 1
    n_k2 = 2 * K2 + 1

    icoef = _anchor_coefs(coef)
    k1 = functools.partial(_pass1_kernel, ch=ch, th=TH1, w=w, h=h,
                           n_k=n_k1, n_ke=n_ke)
    t = pl.pallas_call(
        k1,
        grid=(b, h // TH1),
        in_specs=[pl.BlockSpec((1, ch, h, w), lambda bi, ri: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 10), lambda bi, ri: (bi, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 3), lambda bi, ri: (bi, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 5 * ch, TH1, w),
                               lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 5 * ch, h, w), x.dtype),
        interpret=interpret,
    )(x, coef[:, None, :], icoef[:, None, :])

    tt = jnp.swapaxes(t, 2, 3)  # (B, 5ch, W, H)

    k2 = functools.partial(_pass2_kernel, ch=ch, tc=TC2, h=h, w=w,
                           n_k=n_k2)
    out_t = pl.pallas_call(
        k2,
        grid=(b, w // TC2),
        in_specs=[pl.BlockSpec((1, 5 * ch, w, h),
                               lambda bi, ci: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 10), lambda bi, ci: (bi, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 3), lambda bi, ci: (bi, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, ch, TC2, h),
                               lambda bi, ci: (bi, 0, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ch, w, h), x.dtype),
        interpret=interpret,
    )(tt, coef[:, None, :], icoef[:, None, :])
    return jnp.swapaxes(out_t, 2, 3)
