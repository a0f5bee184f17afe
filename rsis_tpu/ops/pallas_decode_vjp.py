"""Differentiable fused ConvLSTM cell: custom_vjp over the Pallas kernel.

Forward is ops/pallas_decode.fused_cell_rowmajor. Backward recomputes the
gates inside a second Pallas kernel (rematerialization — the residuals are
just the forward *inputs*, so a scanned/checkpointed training step stores
nothing extra per timestep) and emits the pre-activation gate cotangent
plus dc_prev; the remaining pieces are expressed with XLA on the same
row-major layout:

  dx      = conv3x3(dgates, flip(Wx)^T)     (transposed-kernel SAME conv)
  dh_prev = conv3x3(dgates, flip(Wh)^T) + (masked halo edges match fwd)
  ds      = dgates                          (s enters additively)
  dwt     = sum_pixels xrow ⊗ dgates        (one-pass Pallas reduction
            kernel weight_grad_rowmajor at lane-full cells, the
            9-shifted-einsum _weight_grad elsewhere — see
            _dwt_kernel_enabled for the policy and RSIS_PALLAS_DWT)

Gate math being differentiated (reference chunk order i,f,o,g,
src/modules/clstm.py:40-62):
  c = sig(f)·c_prev + sig(i)·tanh(g);  h = sig(o)·tanh(c)

Gradient identities used by the backward kernel:
  dc_tot = dc + dh·o·(1 - tanh²(c))
  d(i̇) = dc_tot·g·i(1-i); d(ḟ) = dc_tot·c_prev·f(1-f)
  d(ȯ) = dh·tanh(c)·o(1-o); d(ġ) = dc_tot·i·(1-g²)
  dc_prev = dc_tot·f

Equivalence of the full VJP against jax.grad of the plain-jnp cell is
unit-tested in interpret mode (tests/test_pallas_vjp.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import (_dyfold_gate_rows, _dyfold_th,
                            _edge_masked_row_fn,
                            _fill_dyfold_taps, _gates_geometry,
                            _halo_block_specs, _stack_padded_taps,
                            _stack_shifted_taps, conv3x3_rowmajor,
                            dyfold_selected, fused_cell_rowmajor, mxu_dot,
                            repack_dyfold)


def _bwd_kernel(hpre_ref, hb_ref, hpost_ref, xb_ref, xh_ref, c_ref, s_ref,
                wt_ref, dh_ref, dc_ref, dg_out, dcp_out, xrow_ref,
                *, th, w, cx, ch, pack):
    """Recompute gates, emit pre-activation dgates (1, th, 4C, W) and
    dc_prev (1, th, C, W). Same block layout as the forward kernel."""
    h_row = _edge_masked_row_fn(hpre_ref, hb_ref, hpost_ref, th,
                                xrow_ref.dtype)

    def x_row(r):
        return xb_ref[0, r] if r < th else xh_ref[0, r - th]

    for y0 in range(0, th, pack):
        off = 0
        if cx:
            off = _stack_padded_taps(xrow_ref, x_row, cx, w, pack, y0, off)
        _stack_shifted_taps(xrow_ref, h_row, ch, w, pack, y0, off)

        gates = mxu_dot(wt_ref[...], xrow_ref[...])

        for p in range(pack):
            g_all = gates[:, p * w:(p + 1) * w] \
                + s_ref[0, y0 + p].astype(jnp.float32)
            i_g = jax.nn.sigmoid(g_all[0 * ch:1 * ch])
            f_g = jax.nn.sigmoid(g_all[1 * ch:2 * ch])
            o_g = jax.nn.sigmoid(g_all[2 * ch:3 * ch])
            g_g = jnp.tanh(g_all[3 * ch:4 * ch])
            c_prev = c_ref[0, y0 + p].astype(jnp.float32)
            c_new = f_g * c_prev + i_g * g_g
            tc = jnp.tanh(c_new)

            dh = dh_ref[0, y0 + p].astype(jnp.float32)
            dc = dc_ref[0, y0 + p].astype(jnp.float32)
            dc_tot = dc + dh * o_g * (1.0 - tc * tc)
            d_i = dc_tot * g_g * i_g * (1.0 - i_g)
            d_f = dc_tot * c_prev * f_g * (1.0 - f_g)
            d_o = dh * tc * o_g * (1.0 - o_g)
            d_g = dc_tot * i_g * (1.0 - g_g * g_g)

            dg_out[0, y0 + p, 0 * ch:1 * ch] = d_i.astype(dg_out.dtype)
            dg_out[0, y0 + p, 1 * ch:2 * ch] = d_f.astype(dg_out.dtype)
            dg_out[0, y0 + p, 2 * ch:3 * ch] = d_o.astype(dg_out.dtype)
            dg_out[0, y0 + p, 3 * ch:4 * ch] = d_g.astype(dg_out.dtype)
            dcp_out[0, y0 + p] = (dc_tot * f_g).astype(dcp_out.dtype)


def _bwd_kernel_dyfold(hpre_ref, hb_ref, hpost_ref, xb_ref, xh_ref, c_ref,
                       s_ref, wt2_ref, dh_ref, dc_ref, dg_out, dcp_out,
                       xall_ref, *, th, w, cx, ch):
    """dy-folded gate recompute + dgates epilogue (see _cell_kernel_dyfold
    for the fold; gradient identities as in _bwd_kernel)."""
    h_row = _edge_masked_row_fn(hpre_ref, hb_ref, hpost_ref, th,
                                xall_ref.dtype)

    def x_row(r):
        return xb_ref[0, r] if r < th else xh_ref[0, r - th]

    _fill_dyfold_taps(xall_ref, x_row if cx else None, h_row,
                      th=th, w=w, cx=cx, ch=ch)
    p = mxu_dot(wt2_ref[...], xall_ref[...])
    for r in range(th):
        g_all = _dyfold_gate_rows(p, r, w, 4 * ch) \
            + s_ref[0, r].astype(jnp.float32)
        i_g = jax.nn.sigmoid(g_all[0 * ch:1 * ch])
        f_g = jax.nn.sigmoid(g_all[1 * ch:2 * ch])
        o_g = jax.nn.sigmoid(g_all[2 * ch:3 * ch])
        g_g = jnp.tanh(g_all[3 * ch:4 * ch])
        c_prev = c_ref[0, r].astype(jnp.float32)
        c_new = f_g * c_prev + i_g * g_g
        tc = jnp.tanh(c_new)

        dh = dh_ref[0, r].astype(jnp.float32)
        dc = dc_ref[0, r].astype(jnp.float32)
        dc_tot = dc + dh * o_g * (1.0 - tc * tc)
        d_i = dc_tot * g_g * i_g * (1.0 - i_g)
        d_f = dc_tot * c_prev * f_g * (1.0 - f_g)
        d_o = dh * tc * o_g * (1.0 - o_g)
        d_g = dc_tot * i_g * (1.0 - g_g * g_g)

        dg_out[0, r, 0 * ch:1 * ch] = d_i.astype(dg_out.dtype)
        dg_out[0, r, 1 * ch:2 * ch] = d_f.astype(dg_out.dtype)
        dg_out[0, r, 2 * ch:3 * ch] = d_o.astype(dg_out.dtype)
        dg_out[0, r, 3 * ch:4 * ch] = d_g.astype(dg_out.dtype)
        dcp_out[0, r] = (dc_tot * f_g).astype(dcp_out.dtype)


def _cell_backward_dgates(h_prev, x_pad, c_prev, s_term, wt, dh, dc, *,
                          cx: int, ch: int, interpret: bool = False,
                          dyfold: bool | None = None):
    # plain-Python wrapper: resolve the env-dependent dy-fold choice
    # outside jit so RSIS_DYFOLD flips reach new traces (see
    # pallas_decode.fused_cell_rowmajor)
    if dyfold is None:
        dyfold = dyfold_selected(cx, ch, h_prev.shape[1],
                                 h_prev.shape[3])[0]
    return _cell_backward_dgates_jit(h_prev, x_pad, c_prev, s_term, wt,
                                     dh, dc, cx=cx, ch=ch,
                                     interpret=interpret,
                                     dyfold=bool(dyfold))


@functools.partial(jax.jit, static_argnames=("cx", "ch", "interpret",
                                             "dyfold"))
def _cell_backward_dgates_jit(h_prev, x_pad, c_prev, s_term, wt, dh, dc,
                              *, cx: int, ch: int, interpret: bool,
                              dyfold: bool):
    b, h, _, w = h_prev.shape
    th, pack = _gates_geometry(h, w)
    if dyfold:
        th_dy = _dyfold_th(4 * ch, cx + ch, h, w)
        if th_dy is None:
            raise ValueError("dy-fold unavailable at this geometry")
        th, pack = th_dy, 1
        wt = repack_dyfold(wt, cx, ch)
    dtype = h_prev.dtype
    if x_pad is None:
        assert cx == 0
        x_pad = h_prev

    grid = (b, h // th)

    def body_map(bi, ri):
        return (bi, ri, 0, 0)

    h_pre, h_body, h_post = _halo_block_specs(th, ch, w, h // th)
    x_body = pl.BlockSpec((1, th, x_pad.shape[2], x_pad.shape[3]), body_map,
                          memory_space=pltpu.VMEM)
    x_halo = pl.BlockSpec(
        (1, 2, x_pad.shape[2], x_pad.shape[3]),
        lambda bi, ri: (bi, (ri * th + th) // 2, 0, 0),
        memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, th, ch, w), body_map, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, th, 4 * ch, w), body_map,
                          memory_space=pltpu.VMEM)

    if dyfold:
        kern = functools.partial(_bwd_kernel_dyfold, th=th, w=w, cx=cx,
                                 ch=ch)
        scratch = pltpu.VMEM((3 * (cx + ch), (th + 2) * w), dtype)
    else:
        kern = functools.partial(_bwd_kernel, th=th, w=w, cx=cx, ch=ch,
                                 pack=pack)
        scratch = pltpu.VMEM((9 * (cx + ch), pack * w), dtype)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[h_pre, h_body, h_post, x_body, x_halo, c_spec, g_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  c_spec, c_spec],
        out_specs=[g_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, 4 * ch, w), dtype),
                   jax.ShapeDtypeStruct((b, h, ch, w), dtype)],
        scratch_shapes=[scratch],
        interpret=interpret,
    )(h_prev, h_prev, h_prev, x_pad, x_pad, c_prev, s_term, wt,
      dh, dc)


def _conv_transpose_rowmajor(dg, wt, cin: int, ch: int, take,
                             interpret: bool = False):
    """dinput = conv3x3^T(dgates) for the slice of the packed weight
    selected by ``take`` ("x", "h", or "xh"): a SAME conv of dg
    (B, H, 4C, W) with the spatially-flipped transposed kernels, run
    through the Pallas conv kernel (the 18 rowmajor XLA einsums this
    replaced were the train backward's hottest non-encoder piece).

    take="xh" computes BOTH pullbacks in ONE conv call with the weights
    stacked along the output-channel axis (out (B, H, Cx+C, W): x rows
    first) — the two separate calls each re-read the full dgates tensor
    and re-built the same 9·4C-row im2col scratch, together ~47 ms of
    the 290 ms T=20 b32 train step (docs/PERF.md round 3), and the
    merged matmul also doubles the tiny M = C_out of each pullback."""
    cx_total = wt.shape[1] // 9 - ch
    c_target = {"x": cx_total, "h": ch, "xh": cx_total + ch}[take]
    blocks = []
    for dy in range(3):
        for dx in range(3):
            # the flipped source tap feeding output tap (dy, dx)
            src = (2 - dy) * 3 + (2 - dx)
            parts = []
            if take in ("x", "xh"):
                parts.append(wt[:, src * cx_total:(src + 1) * cx_total].T)
            if take in ("h", "xh"):
                base = 9 * cx_total
                parts.append(wt[:, base + src * ch:base + (src + 1) * ch].T)
            blocks.append(parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=0))
    wpack = jnp.concatenate(blocks, axis=1)              # (c_target, 9*4C)
    return conv3x3_rowmajor(dg, wpack, cin=4 * ch, cout=c_target,
                            interpret=interpret)


def _dwt_kernel(hpre_ref, hb_ref, hpost_ref, xb_ref, xh_ref, dg_ref,
                out_ref, xrow_ref, *, th, w, cx, ch, pack):
    """Accumulate dwt = sum_pixels dgates ⊗ taps over the whole grid.

    Reuses the forward kernel's in-VMEM tap stacking (same halo masking
    and SAME-pad semantics), then contracts dgates rows against the tap
    scratch over the pixel lanes:  (4C, pack·W) x (K, pack·W) -> (4C, K).
    The output block index is constant, so Mosaic keeps the (4C, K) fp32
    accumulator resident in VMEM across the whole sequential grid and
    writes it back once — ONE pass over dgates + inputs, replacing the
    18 shifted full-tensor einsums of _weight_grad (each of which
    re-reads the full dgates tensor from HBM)."""
    h_row = _edge_masked_row_fn(hpre_ref, hb_ref, hpost_ref, th,
                                xrow_ref.dtype)

    def x_row(r):
        return xb_ref[0, r] if r < th else xh_ref[0, r - th]

    bi, ri = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, ri == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for y0 in range(0, th, pack):
        off = 0
        if cx:
            off = _stack_padded_taps(xrow_ref, x_row, cx, w, pack, y0, off)
        _stack_shifted_taps(xrow_ref, h_row, ch, w, pack, y0, off)
        dgp = dg_ref[0, y0] if pack == 1 else jnp.concatenate(
            [dg_ref[0, y0 + p] for p in range(pack)], axis=1)  # (4C, pack·W)
        # operands upcast to f32 AT the dot: Mosaic crashes (tpu_compile
        # subprocess exit 1) on a bf16 dot_general whose contraction is
        # the LANE dim of both operands — observed at every cell geometry
        # on v5e, while the identical f32 contraction compiles and is
        # oracle-exact (scripts/probe_dwt_cells.py). The tap scratch stays
        # in the input dtype so the VPU copies keep their bf16 width.
        # Precision follows the ORIGINAL dtype: for bf16-origin operands
        # the 1-pass bf16 MXU path (DEFAULT) is bit-exact and ~6x the
        # HIGHEST full-f32 decomposition (isolated A/B: cell4 8.0 -> ~3 ms);
        # true-f32 inputs keep HIGHEST for the parity checks.
        prec = (lax.Precision.HIGHEST if dg_ref.dtype == jnp.float32
                else lax.Precision.DEFAULT)
        out_ref[...] += mxu_dot(
            dgp.astype(jnp.float32), xrow_ref[...].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())), precision=prec)


@functools.partial(jax.jit, static_argnames=("cx", "ch", "interpret"))
def weight_grad_rowmajor(h_prev, x_pad, dg, *, cx: int, ch: int,
                         interpret: bool = False):
    """dwt (4C, 9*(cx+ch)) fp32 via the one-pass Pallas kernel; same
    layout and edge semantics as _weight_grad (oracle-tested)."""
    b, h, _, w = h_prev.shape
    th, pack = _gates_geometry(h, w)
    if x_pad is None:
        assert cx == 0
        x_pad = h_prev  # placeholder; kernel never reads it when cx == 0
    grid = (b, h // th)
    body_map = lambda bi, ri: (bi, ri, 0, 0)  # noqa: E731
    h_pre, h_body, h_post = _halo_block_specs(th, ch, w, h // th)
    x_body = pl.BlockSpec((1, th, x_pad.shape[2], x_pad.shape[3]), body_map,
                          memory_space=pltpu.VMEM)
    x_halo = pl.BlockSpec(
        (1, 2, x_pad.shape[2], x_pad.shape[3]),
        lambda bi, ri: (bi, (ri * th + th) // 2, 0, 0),
        memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((1, th, 4 * ch, w), body_map,
                           memory_space=pltpu.VMEM)
    k_dim = 9 * (cx + ch)
    out_spec = pl.BlockSpec((4 * ch, k_dim), lambda bi, ri: (0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_dwt_kernel, th=th, w=w, cx=cx, ch=ch,
                             pack=pack)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[h_pre, h_body, h_post, x_body, x_halo, dg_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((4 * ch, k_dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k_dim, pack * w), h_prev.dtype)],
        interpret=interpret,
    )(h_prev, h_prev, h_prev, x_pad, x_pad, dg)


def _shift2d(x, sy: int, sx: int):
    """Shift (B, H, C, W) by (-sy, -sx) with zero fill: out[y] = x[y+sy]."""
    b, h, c, w = x.shape
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
    return lax.dynamic_slice(x, (0, 1 + sy, 0, 1 + sx), (b, h, c, w))


def _weight_grad(h_prev, x_pad, dg, cx: int, ch: int):
    """dwt (4C, 9*(cx+ch)) = sum_pixels dgates ⊗ shifted inputs."""
    b, h, _, w = dg.shape
    blocks = []
    if cx:
        x = lax.dynamic_slice(x_pad, (0, 1, 0, 1),
                              (b, h, cx, w))  # unpadded view
    for dy in range(3):
        for dx in range(3):
            if cx:
                xs = _shift2d(x, dy - 1, dx - 1)
                blocks.append(jnp.einsum(
                    "bhgw,bhcw->gc", dg, xs,
                    preferred_element_type=jnp.float32))
    for dy in range(3):
        for dx in range(3):
            hs = _shift2d(h_prev, dy - 1, dx - 1)
            blocks.append(jnp.einsum(
                "bhgw,bhcw->gc", dg, hs,
                preferred_element_type=jnp.float32))
    return jnp.concatenate(blocks, axis=1).astype(dg.dtype)  # (4C, K)


def _dwt_kernel_enabled(ch: int, w: int) -> bool:
    """Trace-time switch for the one-pass dwt kernel. RSIS_PALLAS_DWT:
    unset/"" = auto, "all"/"1" = everywhere, "0" = off everywhere, or a
    comma list of hidden widths ("8,16") enabling it only for those cells
    (per-cell silicon bisection, scripts/repro_train.py).

    Auto enables the kernel only at the widest lane-full geometries
    (W >= 256): the silicon-validated domain where it measurably wins.
    Step-level A/B at the T=20 cityscapes recipe (perf_probe_dwt_step,
    2026-08-19, v5e): einsum everywhere 261.2 ms, cell4 only 254.5 ms,
    cells 3+4 254.9 ms — the finest cell carries the entire ~6.5 ms win
    and cell3 is a wash (its isolated numbers are noise-dominated).

    The lane-packed variant (pack > 1, the coarse cells) passes interpret
    mode AND isolated hardware runs at every cell geometry/dtype, but the
    in-step behavior is toolchain-fragile: round 4 (2026-08-18) saw
    `TPU backend error (Internal)` at pack 2/4/8; at round-5 HEAD
    (2026-08-20) pack=2 and pack=4 pass the full step individually
    (253.10 ms for cells 2+3+4 — within the 0.2% run noise of cell4-only)
    while pack=8 (cell0) still faults — see scripts/repro_dwt_fault.py
    for the committed bisect ladder and docs/PERF.md round 5. Auto stays
    at W >= 256: the pack<=4 cells buy noise-level time (dwt cost scales
    with H·W; the coarse cells hold <7% of the decode pixels) and sit in
    a domain the Mosaic toolchain has already miscompiled once."""
    v = os.environ.get("RSIS_PALLAS_DWT", "")
    if v in ("all", "1"):
        return True
    if v == "0":
        return False
    if v in ("", "auto"):
        return w >= 256
    return str(ch) in v.split(",")


def _cell_bwd_core(h_prev, x_pad, c_prev, s_term, wt, dh, dc, *,
                   cx: int, ch: int, interpret: bool):
    """Shared backward body of the fused-cell VJPs.

    Returns (dg, dc_prev, dwt, dx, dh_prev) with dx the UNPADDED up-input
    cotangent (B, H, Cx, W), or None when cx == 0. Ring entries of x_pad
    do reach edge gates, but their cotangent is dropped (zero ring):
    every producer of x_pad in this codebase writes a structurally-zero
    ring (the pad-fused upsample matrices), whose own transpose kills
    those grads anyway — the composed gradient is exact."""
    dg, dc_prev = _cell_backward_dgates(
        h_prev, x_pad, c_prev, s_term, wt, dh, dc, cx=cx, ch=ch,
        interpret=interpret)
    if _dwt_kernel_enabled(ch, h_prev.shape[-1]):
        dwt = weight_grad_rowmajor(
            h_prev, x_pad if cx else None, dg, cx=cx, ch=ch,
            interpret=interpret).astype(dg.dtype)
    else:
        dwt = _weight_grad(h_prev, x_pad, dg, cx, ch)
    if cx:
        # one fused conv for both pullbacks (see take="xh" above)
        dxh = _conv_transpose_rowmajor(dg, wt, cx, ch, take="xh",
                                       interpret=interpret)
        dx, dh_prev = dxh[:, :, :cx], dxh[:, :, cx:]
    else:
        dx = None
        dh_prev = _conv_transpose_rowmajor(dg, wt, cx, ch, take="h",
                                           interpret=interpret)
    return dg, dc_prev, dwt, dx, dh_prev


@functools.lru_cache(maxsize=32)
def make_fused_cell_vjp(cx: int, ch: int, interpret: bool = False):
    """Returns a differentiable fused cell fn(h_prev, x_pad, c_prev, s, wt)
    -> (h, c) with the Pallas forward and the remat backward."""

    @jax.custom_vjp
    def cell(h_prev, x_pad, c_prev, s_term, wt):
        return fused_cell_rowmajor(h_prev, x_pad, c_prev, s_term, wt,
                                   cx=cx, ch=ch, interpret=interpret)

    def fwd(h_prev, x_pad, c_prev, s_term, wt):
        out = fused_cell_rowmajor(h_prev, x_pad, c_prev, s_term, wt,
                                  cx=cx, ch=ch, interpret=interpret)
        return out, (h_prev, x_pad, c_prev, s_term, wt)

    def bwd(res, cts):
        h_prev, x_pad, c_prev, s_term, wt = res
        dh, dc = cts
        dg, dc_prev, dwt, dx, dh_prev = _cell_bwd_core(
            h_prev, x_pad, c_prev, s_term, wt, dh, dc, cx=cx, ch=ch,
            interpret=interpret)
        if cx:
            dx_pad = jnp.pad(dx, ((0, 0), (1, 1), (0, 0), (1, 1)))
        else:
            dx_pad = jnp.zeros_like(x_pad) if x_pad is not None else None
        return dh_prev, dx_pad, dc_prev, dg, dwt

    cell.defvjp(fwd, bwd)
    return cell


def _up_matrices(h_in: int, w_in: int, out_h: int, out_w: int, dtype,
                 pad: bool):
    """Align-corners interp matrices (same construction as
    models/rowmajor_decoder._upsample_rowmajor); pad=True ships the
    zero halo ring as zero border rows/cols."""
    import numpy as np
    from .upsample import _interp_matrix
    rm = _interp_matrix(h_in, out_h)
    cm = _interp_matrix(w_in, out_w)
    if pad:
        rm = np.pad(rm, ((1, 1), (0, 0)))
        cm = np.pad(cm, ((1, 1), (0, 0)))
    return jnp.asarray(rm, dtype), jnp.asarray(cm, dtype)


def _upsample_pad_rowmajor(h_small, out_h: int, out_w: int):
    """(B, h, C, w) -> (B, out_h+2, C, out_w+2) padded bilinear upsample
    (bit-identical to models/rowmajor_decoder._upsample_rowmajor(pad=True):
    same interp matrices, same f32-accumulate-then-cast einsums)."""
    rm, cm = _up_matrices(h_small.shape[1], h_small.shape[3], out_h, out_w,
                          h_small.dtype, pad=True)
    x = jnp.einsum("oh,bhcw->bocw", rm, h_small,
                   preferred_element_type=jnp.float32).astype(h_small.dtype)
    return jnp.einsum("bocw,pw->bocp", x, cm,
                      preferred_element_type=jnp.float32).astype(
                          h_small.dtype)


def _upsample_transpose_rowmajor(dx, in_h: int, in_w: int):
    """Transpose of the (unpadded) bilinear upsample: (B, out_h, C, out_w)
    cotangent -> (B, in_h, C, in_w)."""
    rm, cm = _up_matrices(in_h, in_w, dx.shape[1], dx.shape[3], dx.dtype,
                          pad=False)
    t = jnp.einsum("oh,bocp->bhcp", rm, dx,
                   preferred_element_type=jnp.float32).astype(dx.dtype)
    return jnp.einsum("pw,bhcp->bhcw", cm, t,
                      preferred_element_type=jnp.float32).astype(dx.dtype)


@functools.lru_cache(maxsize=32)
def make_fused_cell_up_vjp(cx: int, ch: int, interpret: bool = False):
    """Upsample-fused differentiable cell: fn(h_small, h_prev, c_prev, s,
    wt) -> (h, c), where the cell's up-input is the padded 2x bilinear
    upsample of ``h_small`` (the previous cell's hidden state), computed
    INSIDE the custom_vjp boundary.

    Why: with the plain cell vjp the scan stacks the padded upsample
    output x_pad (B, 2h+2, Cx, 2w+2) as a per-step residual — ~4x the
    bytes of its source h_small, and h_small is already stored as the
    previous cell's carry residual. At the T=20 b32 cityscapes step the
    x_pads were 1.25 GB of the 3.9 GB save set
    (scripts/analyze_residuals.py). Saving h_small and replaying the two
    interp einsums in the backward trades ~2 cheap MXU matmuls per cell
    per step for that DUS traffic. Math is bit-identical to the unfused
    composition: same upsample einsums forward, and the backward's
    explicit transpose einsums are exactly the AD transpose of the
    forward pair (the pad ring rows of the interp matrices are zero, so
    the unpadded-dx transpose is exact)."""
    assert cx > 0, "cell0 has no up-input"

    @jax.custom_vjp
    def cell(h_small, h_prev, c_prev, s_term, wt):
        x_pad = _upsample_pad_rowmajor(h_small, h_prev.shape[1],
                                       h_prev.shape[3])
        return fused_cell_rowmajor(h_prev, x_pad, c_prev, s_term, wt,
                                   cx=cx, ch=ch, interpret=interpret)

    def fwd(h_small, h_prev, c_prev, s_term, wt):
        out = cell(h_small, h_prev, c_prev, s_term, wt)
        return out, (h_small, h_prev, c_prev, s_term, wt)

    def bwd(res, cts):
        h_small, h_prev, c_prev, s_term, wt = res
        dh, dc = cts
        x_pad = _upsample_pad_rowmajor(h_small, h_prev.shape[1],
                                       h_prev.shape[3])  # replay, not saved
        dg, dc_prev, dwt, dx, dh_prev = _cell_bwd_core(
            h_prev, x_pad, c_prev, s_term, wt, dh, dc, cx=cx, ch=ch,
            interpret=interpret)
        dh_small = _upsample_transpose_rowmajor(dx, h_small.shape[1],
                                                h_small.shape[3])
        return dh_small, dh_prev, dc_prev, dg, dwt

    cell.defvjp(fwd, bwd)
    return cell
