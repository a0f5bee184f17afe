"""Fused ConvLSTM decode-cell kernel in a row-major (B, H, C, W) layout.

Why this exists: the decoder's per-step cost is dominated by 3x3 convs and
LSTM pointwise ops over tensors with tiny channel counts (8..128) at large
spatial extents. XLA-TPU keeps those tensors channels-minor and lane-pads
C to 128, which inflates HBM traffic ~16x at the finest cell and lands the
whole decode step at ~14 ms (measured in-program at the bench geometry,
B=16 — cells alone: 1.4 + 1.3 + 1.4 + 2.7 + 6.9 ms). The MXU itself is
healthy (~108 TFLOP/s on a square bf16 matmul), so the fix is layout +
fusion, not math.

This kernel computes one whole cell update per grid program row-tile:

  gates = W^T @ xrow + s;   c = sig(f)*c_prev + sig(i)*tanh(g);
  h = sig(o)*tanh(c)                      [i,f,o,g gate order — reference
                                           chunk order, src/modules/clstm.py:40-62]

with every tensor stored as (B, H, C, W): the minor two dims (C, W) tile
compactly (W >= 128 lanes at the hot cells; C sublanes pad at most 2x),
and a fixed-row slice [y] yields a contiguous (C, W) slab. Per output row
the 9-tap conv becomes ONE MXU matmul (4C, K) @ (K, W·pack) where
K = 9·(Cin + C) and xrow is built by cheap in-VMEM slice copies
(lane-shifted per tap with zero-filled edges — SAME-conv column padding
never touches HBM). Rows are lane-packed (pack = 128 // W) for the coarse
cells so the matmul N dim stays full. The hidden state is read UNPADDED:
row halos come from aligned pre/body/post 2-row blocks whose out-of-image
contributions are masked by the grid position, so no per-step XLA pad op
exists for h or c. The up-input arrives padded for free (the upsample
einsum's interpolation matrices carry zero border rows/cols —
models/rowmajor_decoder._upsample_rowmajor). The skip contribution
s = conv_s(skip) + bias is scan-constant and precomputed once per decode
(models/fast_decoder.py hoists it the same way).

Serves BOTH paths: inference decodes call ``fused_cell_rowmajor``
directly (models/rowmajor_decoder.py), and the training step routes the
same forward kernel through the custom_vjp in ops/pallas_decode_vjp.py
(backward = dgates-recompute kernel + transpose-conv pullback), selected
by models/rowmajor_decoder.training_rowmajor_selected. Equivalence vs the
reference cell math is unit-tested in interpret mode on CPU and the
hardware path is exercised by bench.py and scripts/tpu_smoke.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mxu_dot(a: jnp.ndarray, b: jnp.ndarray,
            dimension_numbers=None, precision=None) -> jnp.ndarray:
    """MXU contraction with an explicitly pinned precision (fp32 result).

    Kernel lowering must not depend on the process-global
    ``jax_default_matmul_precision``: under "highest" (set by parity
    harnesses such as scripts/tpu_smoke.py and tests/conftest.py) a bf16
    dot lowers to ``tpu.matmul`` with ``contract_precision<fp32>``, which
    Mosaic rejects on v5e ("Bad lhs type"). bf16 operands already
    accumulate exactly into the fp32 accumulator at DEFAULT precision, so
    pinning DEFAULT for sub-fp32 operands loses nothing; fp32 operands
    default to HIGHEST (exact — what the f32 parity checks validated on
    silicon).

    ``precision`` overrides the dtype-based pick. Pass DEFAULT for f32
    operands that were upcast from bf16 (a Mosaic workaround — bf16
    lane-dim contractions don't compile on v5e): the 1-pass bf16 MXU
    path is bit-exact for bf16-origin data and ~6x the throughput of the
    full-f32 HIGHEST decomposition."""
    if precision is None:
        precision = (lax.Precision.HIGHEST if a.dtype == jnp.float32
                     else lax.Precision.DEFAULT)
    if dimension_numbers is None:
        dimension_numbers = (((a.ndim - 1,), (0,)), ((), ()))
    return lax.dot_general(a, b, dimension_numbers, precision=precision,
                           preferred_element_type=jnp.float32)


def pack_cell_weights(kernel: jnp.ndarray, cx: int, ch: int,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """(3, 3, Cx+C, 4C) HWIO gate kernel -> (4C, 9*(Cx+C)) matmul weight.

    Row stacking order of xrow in the kernel: all 9 x-taps first (tap-major,
    channel-minor), then all 9 h-taps. cx == 0 means the cell has no
    up-input (cell 0): only h-taps.
    """
    k = kernel.astype(dtype)
    kx = k[:, :, :cx, :]                      # (3, 3, Cx, 4C)
    kh = k[:, :, cx:, :]                      # (3, 3, C, 4C)
    parts = []
    if cx > 0:
        parts.append(kx.reshape(9 * cx, 4 * ch))
    parts.append(kh.reshape(9 * ch, 4 * ch))
    return jnp.concatenate(parts, axis=0).T   # (4C, K)


def _edge_masked_row_fn(pre_ref, body_ref, post_ref, th, dt):
    """Row accessor over the pre/body/post halo blocks of an UNPADDED
    input: tap row r in [-1, th+1], with out-of-image halo contributions
    masked to zero by grid position."""
    ri = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    mask_top = jnp.where(ri > 0, 1, 0).astype(dt)
    mask_bot = jnp.where(ri < n_tiles - 1, 1, 0).astype(dt)

    def row(r):
        if r < 0:
            return pre_ref[0, 2 + r] * mask_top
        if r < th:
            return body_ref[0, r]
        return post_ref[0, r - th] * mask_bot

    return row


def _stack_shifted_taps(xrow_ref, row_fn, cn, w, pack, y0, off):
    """Write the 9 conv taps of an UNPADDED input into xrow rows
    [off, off+9*cn): lane-shifted copies with zero-filled edge columns
    (SAME padding without touching HBM). Returns the next row offset."""
    zcol = jnp.zeros((1, 1), xrow_ref.dtype)
    for dy in range(3):
        for dx in range(3):
            for p in range(pack):
                slab = row_fn(y0 + p + dy - 1)          # (cn, W)
                lo, hi = p * w, (p + 1) * w
                if dx == 0:      # left neighbour: shift right, zero col
                    xrow_ref[off:off + cn, lo + 1:hi] = slab[:, :w - 1]
                    xrow_ref[off:off + cn, lo:lo + 1] = \
                        jnp.broadcast_to(zcol, (cn, 1))
                elif dx == 1:
                    xrow_ref[off:off + cn, lo:hi] = slab
                else:            # right neighbour: shift left, zero col
                    xrow_ref[off:off + cn, lo:hi - 1] = slab[:, 1:]
                    xrow_ref[off:off + cn, hi - 1:hi] = \
                        jnp.broadcast_to(zcol, (cn, 1))
            off += cn
    return off


def _stack_padded_taps(xrow_ref, x_row_fn, cn, w, pack, y0, off):
    """Write the 9 conv taps of a PRE-PADDED input (rows/cols carry the
    zero halo already) into xrow rows [off, off+9*cn)."""
    for dy in range(3):
        for dx in range(3):
            for p in range(pack):
                xrow_ref[off:off + cn, p * w:(p + 1) * w] = \
                    x_row_fn(y0 + p + dy)[:, dx:dx + w]
            off += cn
    return off


def _tiles128(d: int) -> int:
    return -(-d // 128)


def _dyfold_th(m_out: int, cn: int, h: int, w: int):
    """Largest legal dy-fold tile height at this geometry, or None.

    Pure geometry — no env reads, so jitted kernel bodies may call it
    (their traces are cached; anything env-dependent must be resolved
    OUTSIDE the jit boundary, see the public wrappers below). The tile
    height is the largest whose working set (fp32 partial buffer + bf16
    tap scratch) stays within ~6 MB of VMEM."""
    if w % 128 != 0:
        return None  # lane-packed coarse cells keep the std path
    for th in (32, 16, 8):
        if h % th == 0 and \
                (th + 2) * w * (3 * m_out * 4 + 3 * cn * 2) <= 6_000_000:
            return th
    return None


def _dyfold_pick(m_out: int, cn: int, h: int, w: int):
    """Whether a dy-folded 3x3-conv matmul beats the standard one.

    The standard kernels compute (M, 9*Cn) @ (9*Cn, W) per output row —
    at the finest cells M = 4C = 32 uses a quarter of the MXU's 128 rows
    while K = 9*Cn streams 2+ tiles. Folding the three dy tap rows into
    M instead of K gives (3M, 3*Cn) @ (3*Cn, (th+2)*W): one matmul per
    row-*tile* over per-input-row partial products that three output
    rows each reuse (tap-copy traffic also drops 3x). MXU cost is
    modelled as 128-tile counts; the (th+2)/th factor charges the
    boundary rows the fold recomputes. Returns (use, th).

    RSIS_DYFOLD=0 disables the fold globally (hardware kill-switch).
    Because of the env read this must only run in plain Python at the
    kernel call boundary — never inside a jitted body, whose trace JAX
    caches across later env flips (the round-4 A/B-probe bug: flipping
    RSIS_DYFOLD mid-process was silently ignored for already-traced
    shapes)."""
    if os.environ.get("RSIS_DYFOLD", "") == "0":
        return False, None
    th = _dyfold_th(m_out, cn, h, w)
    if th is None:
        return False, None
    cost_std = _tiles128(m_out) * _tiles128(9 * cn)
    cost_dy = _tiles128(3 * m_out) * _tiles128(3 * cn) * (th + 2) / th
    return cost_dy <= 0.8 * cost_std, th


def dyfold_selected(cx: int, ch: int, h: int, w: int):
    """dy-fold decision for the fused cell kernels (M = 4C gate rows)."""
    return _dyfold_pick(4 * ch, cx + ch, h, w)


def repack_dyfold(wt: jnp.ndarray, cx: int, ch: int) -> jnp.ndarray:
    """(4C, 9*(Cx+C)) packed gate weight -> (12C, 3*(Cx+C)) dy-folded:
    row block dy holds that tap row's weights, columns are dx-major with
    the x channels before the h channels inside each dx block (matching
    the dy-fold scratch layout)."""
    g4 = wt.shape[0]
    parts = []
    if cx:
        parts.append(wt[:, :9 * cx].reshape(g4, 3, 3, cx))
    parts.append(wt[:, 9 * cx:].reshape(g4, 3, 3, ch))
    wcat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return wcat.transpose(1, 0, 2, 3).reshape(3 * g4, 3 * (cx + ch))


def _fill_dyfold_taps(xall_ref, x_row, h_row, *, th, w, cx, ch):
    """Write (th+2) input rows' dx-shifted taps into the dy-fold scratch
    (3*(Cx+C), (th+2)*W): lane block j+1 holds input row j's three
    dx-shifted copies stacked channel-wise (x then h per dx block)."""
    cn = cx + ch
    zcol = jnp.zeros((1, 1), xall_ref.dtype)
    for j in range(-1, th + 1):
        lo = (j + 1) * w
        if cx:
            xs = x_row(j + 1)                    # padded row: (Cx, W+2)
            for dx in range(3):
                xall_ref[dx * cn:dx * cn + cx, lo:lo + w] = \
                    xs[:, dx:dx + w]
        hs = h_row(j)                            # unpadded row: (C, W)
        for dx in range(3):
            base = dx * cn + cx
            if dx == 0:
                xall_ref[base:base + ch, lo + 1:lo + w] = hs[:, :w - 1]
                xall_ref[base:base + ch, lo:lo + 1] = \
                    jnp.broadcast_to(zcol, (ch, 1))
            elif dx == 1:
                xall_ref[base:base + ch, lo:lo + w] = hs
            else:
                xall_ref[base:base + ch, lo:lo + w - 1] = hs[:, 1:]
                xall_ref[base:base + ch, lo + w - 1:lo + w] = \
                    jnp.broadcast_to(zcol, (ch, 1))


def _dyfold_gate_rows(p, r, w, g4):
    """Output row r's pre-activation gates from the partial-product
    buffer: dy block d contributes its product with input row r+d-1
    (lane block r+d)."""
    return (p[0:g4, r * w:(r + 1) * w]
            + p[g4:2 * g4, (r + 1) * w:(r + 2) * w]
            + p[2 * g4:3 * g4, (r + 2) * w:(r + 3) * w])


def _cell_kernel_dyfold(hpre_ref, hb_ref, hpost_ref, xb_ref, xh_ref, c_ref,
                        s_ref, wt2_ref, h_out, c_out, xall_ref,
                        *, th, w, cx, ch):
    """dy-folded cell row-tile: ONE matmul (12C, 3Cn) @ (3Cn, (th+2)*W)
    of per-input-row partials, then the LSTM epilogue sums each output
    row's three dy contributions. Same halo/masking semantics as
    _cell_kernel."""
    h_row = _edge_masked_row_fn(hpre_ref, hb_ref, hpost_ref, th,
                                xall_ref.dtype)

    def x_row(r):
        return xb_ref[0, r] if r < th else xh_ref[0, r - th]

    _fill_dyfold_taps(xall_ref, x_row if cx else None, h_row,
                      th=th, w=w, cx=cx, ch=ch)
    p = mxu_dot(wt2_ref[...], xall_ref[...])  # (12C, (th+2)*W)
    for r in range(th):
        g = _dyfold_gate_rows(p, r, w, 4 * ch) \
            + s_ref[0, r].astype(jnp.float32)
        i_g = jax.nn.sigmoid(g[0 * ch:1 * ch])
        f_g = jax.nn.sigmoid(g[1 * ch:2 * ch])
        o_g = jax.nn.sigmoid(g[2 * ch:3 * ch])
        g_g = jnp.tanh(g[3 * ch:4 * ch])
        c_prev = c_ref[0, r].astype(jnp.float32)
        c_new = f_g * c_prev + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        h_out[0, r] = h_new.astype(h_out.dtype)
        c_out[0, r] = c_new.astype(c_out.dtype)


def _gates_geometry(h: int, w: int):
    """(tile height, lane pack) for a row-major kernel over (H, W)."""
    if h % 2:
        raise ValueError(
            f"H={h} must be even (the 2-row halo blocks' index maps are "
            "off by one for odd tile heights)")
    th = _pick_tile(h)
    pack = max(1, 128 // w)
    while th % pack != 0:
        pack //= 2
    return th, pack


def _halo_block_specs(th, c, w, n_tiles):
    """(pre, body, post) BlockSpecs for the unpadded masked-halo reads:
    aligned 2-row halo blocks whose edge-tile indices clamp in range (the
    kernel masks their contribution)."""
    body = pl.BlockSpec((1, th, c, w), lambda bi, ri: (bi, ri, 0, 0),
                        memory_space=pltpu.VMEM)
    pre = pl.BlockSpec(
        (1, 2, c, w),
        lambda bi, ri: (bi, jnp.maximum(ri * (th // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    post = pl.BlockSpec(
        (1, 2, c, w),
        lambda bi, ri: (bi, jnp.minimum(ri * (th // 2) + th // 2,
                                        (n_tiles * th) // 2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    return pre, body, post


def _cell_kernel(hpre_ref, hb_ref, hpost_ref, xb_ref, xh_ref, c_ref, s_ref,
                 wt_ref, h_out, c_out, xrow_ref, *, th, w, cx, ch, pack):
    """One row-tile: th output rows of one batch element.

    hpre/hb/hpost: 2-row pre-halo + th-row body + 2-row post-halo of the
    UNPADDED h_prev (1, ·, C, W); edge tiles mask the halo contribution.
    xb/xh: body (1, th, Cx, W+2) + halo (1, 2, Cx, W+2) of the row+col
    PADDED up-input (absent when cx == 0 — the wrapper passes the h body
    twice and the kernel ignores it). c (1, th, C, W), s (1, th, 4C, W),
    wt (4C, K). Outputs (1, th, C, W). xrow_ref: (K, pack*W) VMEM scratch
    holding the stacked conv taps.
    """
    h_row = _edge_masked_row_fn(hpre_ref, hb_ref, hpost_ref, th,
                                xrow_ref.dtype)

    def x_row(r):
        # padded up-input row r in [0, th+2)
        return xb_ref[0, r] if r < th else xh_ref[0, r - th]

    for y0 in range(0, th, pack):
        # ---- build xrow (K, pack*W): 9 x-taps then 9 h-taps ----
        off = 0
        if cx:
            off = _stack_padded_taps(xrow_ref, x_row, cx, w, pack, y0, off)
        _stack_shifted_taps(xrow_ref, h_row, ch, w, pack, y0, off)

        gates = mxu_dot(wt_ref[...], xrow_ref[...])  # (4C, pack*W)

        for p in range(pack):
            g = gates[:, p * w:(p + 1) * w] \
                + s_ref[0, y0 + p].astype(jnp.float32)       # (4C, W)
            i_g = jax.nn.sigmoid(g[0 * ch:1 * ch])
            f_g = jax.nn.sigmoid(g[1 * ch:2 * ch])
            o_g = jax.nn.sigmoid(g[2 * ch:3 * ch])
            g_g = jnp.tanh(g[3 * ch:4 * ch])
            c_prev = c_ref[0, y0 + p].astype(jnp.float32)
            c_new = f_g * c_prev + i_g * g_g
            h_new = o_g * jnp.tanh(c_new)
            h_out[0, y0 + p] = h_new.astype(h_out.dtype)
            c_out[0, y0 + p] = c_new.astype(c_out.dtype)


def _pick_tile(h: int) -> int:
    for th in (32, 16, 8):
        if h % th == 0:
            return th
    return h


def _conv_kernel(pre_ref, body_ref, post_ref, wt_ref, out_ref, xrow_ref,
                 *, th, w, cin, cout, pack):
    """Plain 3x3 SAME conv row-tile: out = W^T @ xrow. Same unpadded
    masked-halo layout as the cell kernel, no epilogue."""
    row = _edge_masked_row_fn(pre_ref, body_ref, post_ref, th,
                              xrow_ref.dtype)
    for y0 in range(0, th, pack):
        _stack_shifted_taps(xrow_ref, row, cin, w, pack, y0, 0)
        out = mxu_dot(wt_ref[...], xrow_ref[...])
        for p in range(pack):
            out_ref[0, y0 + p] = out[:, p * w:(p + 1) * w].astype(
                out_ref.dtype)


def _conv_kernel_dyfold(pre_ref, body_ref, post_ref, wt2_ref, out_ref,
                        xall_ref, *, th, w, cin, cout):
    """dy-folded plain 3x3 SAME conv row-tile (see _cell_kernel_dyfold)."""
    row = _edge_masked_row_fn(pre_ref, body_ref, post_ref, th,
                              xall_ref.dtype)
    _fill_dyfold_taps(xall_ref, None, row, th=th, w=w, cx=0, ch=cin)
    p = mxu_dot(wt2_ref[...], xall_ref[...])  # (3*Cout, (th+2)*W)
    for r in range(th):
        out_ref[0, r] = _dyfold_gate_rows(p, r, w, cout).astype(
            out_ref.dtype)


def conv3x3_rowmajor(x: jnp.ndarray, wt: jnp.ndarray, *, cin: int,
                     cout: int, interpret: bool = False,
                     dyfold: bool | None = None) -> jnp.ndarray:
    """3x3 SAME conv on (B, H, Cin, W) with packed weights
    wt (Cout, 9*Cin) (tap-major, channel-minor rows — the kh part of
    pack_cell_weights). Used by the cell VJP for the transposed convs.
    dyfold as in fused_cell_rowmajor (None = tile-cost model, resolved
    in this plain-Python wrapper so RSIS_DYFOLD flips reach new traces)."""
    if dyfold is None:
        dyfold = _dyfold_pick(cout, cin, x.shape[1], x.shape[3])[0]
    return _conv3x3_rowmajor(x, wt, cin=cin, cout=cout,
                             interpret=interpret, dyfold=bool(dyfold))


@functools.partial(jax.jit, static_argnames=("cin", "cout", "interpret",
                                             "dyfold"))
def _conv3x3_rowmajor(x, wt, *, cin: int, cout: int, interpret: bool,
                      dyfold: bool) -> jnp.ndarray:
    b, h, c_dim, w = x.shape
    assert c_dim == cin
    th, pack = _gates_geometry(h, w)
    if dyfold:
        th_dy = _dyfold_th(cout, cin, h, w)
        if th_dy is None:
            raise ValueError(f"dy-fold unavailable for H={h} W={w} "
                             f"cin={cin} cout={cout}")
        th, pack = th_dy, 1
        wt = repack_dyfold(wt, 0, cin)
        kern = functools.partial(_conv_kernel_dyfold, th=th, w=w, cin=cin,
                                 cout=cout)
        scratch = pltpu.VMEM((3 * cin, (th + 2) * w), x.dtype)
    else:
        kern = functools.partial(_conv_kernel, th=th, w=w, cin=cin,
                                 cout=cout, pack=pack)
        scratch = pltpu.VMEM((9 * cin, pack * w), x.dtype)
    grid = (b, h // th)
    pre, body, post = _halo_block_specs(th, cin, w, h // th)
    out_spec = pl.BlockSpec((1, th, cout, w),
                            lambda bi, ri: (bi, ri, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pre, body, post,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, cout, w), x.dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(x, x, x, wt)


def shard_cell_fn(cell_fn, mesh):
    """Run a fused-cell step per-device on its batch shard via shard_map.

    A ``pallas_call`` has no GSPMD partitioning rule, so under a
    multi-device mesh the kernels must be mapped explicitly. The cell math
    is batch-parallel (H stays whole per device — no cross-shard halos),
    so every array operand shards on its leading batch dim over all mesh
    axes and the packed weight replicates. Composes with the custom_vjp
    cells: shard_map differentiates per shard, and the batch-dim grads
    flow back sharded while dwt/ds pick up the psum XLA already inserts
    for replicated->sharded transposes (varying-manual-axes checking is
    disabled — custom_vjp calls do not carry replication-tracking rules).

    cell_fn: (h_prev, x_pad | None, c_prev, s_term, wt) -> (h, c).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bsp = P(tuple(mesh.axis_names))
    rep = P()

    def wrapped(h_prev, x_pad, c_prev, s_term, wt):
        if x_pad is None:
            def no_x(hp, cp, s, w_):
                return cell_fn(hp, None, cp, s, w_)
            return shard_map(no_x, mesh=mesh,
                             in_specs=(bsp, bsp, bsp, rep),
                             out_specs=(bsp, bsp), check_vma=False)(
                                 h_prev, c_prev, s_term, wt)
        return shard_map(cell_fn, mesh=mesh,
                         in_specs=(bsp, bsp, bsp, bsp, rep),
                         out_specs=(bsp, bsp), check_vma=False)(
                             h_prev, x_pad, c_prev, s_term, wt)

    return wrapped


def pad_hcw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, C, W) -> (B, H+2, C, W+2): the zero halo ring for the padded
    up-input path (the h/c path needs no pad — the kernel edge-masks)."""
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))


def fused_cell_rowmajor(h_prev: jnp.ndarray, x_pad: jnp.ndarray | None,
                        c_prev: jnp.ndarray, s_term: jnp.ndarray,
                        wt: jnp.ndarray, *, cx: int, ch: int,
                        interpret: bool = False,
                        dyfold: bool | None = None):
    """One fused ConvLSTM cell step in the (B, H, C, W) layout.

    Args:
      h_prev: (B, H, C, W) previous hidden state (unpadded).
      x_pad: (B, H+2, Cx, W+2) row/col zero-padded up-input, or None when
        cx == 0 (the pad rides along free inside the upsample matrices).
      c_prev: (B, H, C, W).
      s_term: (B, H, 4C, W) scan-constant skip contribution + bias.
      wt: (4C, 9*(Cx+C)) packed weights (pack_cell_weights).
      dyfold: force the dy-folded kernel on/off; None picks by the MXU
        tile-cost model (dyfold_selected) — the fold wins at the finest
        cells where 4C wastes most of the MXU's 128 rows.

    Plain-Python wrapper: the env-dependent dy-fold choice is resolved
    HERE, outside jit, so the jitted impl's trace cache keys on the
    concrete boolean and RSIS_DYFOLD flips take effect on later traces
    (bench.py's kill-switch retry, the A/B probes).

    Returns:
      (h, c): each (B, H, C, W), dtype of h_prev.
    """
    if dyfold is None:
        dyfold = dyfold_selected(cx, ch, h_prev.shape[1],
                                 h_prev.shape[3])[0]
    return _fused_cell_rowmajor(h_prev, x_pad, c_prev, s_term, wt, cx=cx,
                                ch=ch, interpret=interpret,
                                dyfold=bool(dyfold))


@functools.partial(jax.jit,
                   static_argnames=("cx", "ch", "interpret", "dyfold"))
def _fused_cell_rowmajor(h_prev, x_pad, c_prev, s_term, wt, *, cx: int,
                         ch: int, interpret: bool, dyfold: bool):
    b, h, c_dim, w = h_prev.shape
    assert c_dim == ch and c_prev.shape == (b, h, ch, w)
    assert s_term.shape == (b, h, 4 * ch, w), s_term.shape
    th, pack = _gates_geometry(h, w)
    if dyfold:
        th_dy = _dyfold_th(4 * ch, cx + ch, h, w)
        if th_dy is None:
            raise ValueError(f"dy-fold unavailable for H={h} W={w} "
                             f"cx={cx} ch={ch}")
        th, pack = th_dy, 1
        wt = repack_dyfold(wt, cx, ch)
    dtype = h_prev.dtype
    if x_pad is None:
        assert cx == 0
        x_pad = h_prev  # placeholder; kernel never reads it when cx == 0
    else:
        assert x_pad.shape == (b, h + 2, cx, w + 2), x_pad.shape

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
    s_spec = pl.BlockSpec((1, th, 4 * ch, w), body_map,
                          memory_space=pltpu.VMEM)

    if dyfold:
        kern = functools.partial(_cell_kernel_dyfold, th=th, w=w, cx=cx,
                                 ch=ch)
        scratch = pltpu.VMEM((3 * (cx + ch), (th + 2) * w), dtype)
    else:
        kern = functools.partial(_cell_kernel, th=th, w=w, cx=cx, ch=ch,
                                 pack=pack)
        scratch = pltpu.VMEM((9 * (cx + ch), pack * w), dtype)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[h_pre, h_body, h_post, x_body, x_halo, c_spec, s_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, ch, w), dtype),
                   jax.ShapeDtypeStruct((b, h, ch, w), dtype)],
        scratch_shapes=[scratch],
        interpret=interpret,
    )(h_prev, h_prev, h_prev, x_pad, x_pad, c_prev, s_term, wt)
