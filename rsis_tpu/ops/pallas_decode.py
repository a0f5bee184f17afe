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
K = 9·(Cin + C) and xrow is built by 18 cheap in-VMEM slice copies
(lane-offset dx, sublane-group per tap). Rows are lane-packed
(pack = 128 // W) for the coarse cells so the matmul N dim stays full.
The skip contribution s = conv_s(skip) + bias is scan-constant and
precomputed once per decode (models/fast_decoder.py hoists it the same
way). H-halos use the aligned body+halo two-block trick on row-padded
inputs; no manual DMA, everything is standard pipelined BlockSpecs.

Inference-path only (the training step keeps the flax/XLA path for
autodiff). Equivalence vs the reference cell math is unit-tested in
interpret mode on CPU and the wrapper is exercised on hardware by
bench.py when cfg.pallas enables it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _cell_kernel(hb_ref, hh_ref, xb_ref, xh_ref, c_ref, s_ref, wt_ref,
                 h_out, c_out, xrow_ref, *, th, w, cx, ch, pack):
    """One row-tile: th output rows of one batch element.

    hb/hh: body (1, th, C, W+2) + halo (1, 2, C, W+2) of the row+col-padded
    h_prev. xb/xh: same for the padded up-input (absent when cx == 0 —
    the wrapper passes the h blocks twice and the kernel ignores them).
    c (1, th, C, W), s (1, th, 4C, W), wt (4C, K). Outputs (1, th, C, W).
    xrow_ref: (K, pack*W) VMEM scratch holding the stacked conv taps.
    """
    def src_row(b_ref, h_ref, r):
        # static row index into body/halo pair (r in [0, th+2))
        return b_ref[0, r] if r < th else h_ref[0, r - th]

    rows = []
    for dy in range(3):
        for dx in range(3):
            if cx > 0:
                rows.append((xb_ref, xh_ref, cx, dy, dx))
    for dy in range(3):
        for dx in range(3):
            rows.append((hb_ref, hh_ref, ch, dy, dx))

    for y0 in range(0, th, pack):
        # ---- build xrow (K, pack*W): 9 taps x (x-channels, h-channels) ----
        off = 0
        for (b_ref, h_ref, cn, dy, dx) in rows:
            for p in range(pack):
                xrow_ref[off:off + cn, p * w:(p + 1) * w] = \
                    src_row(b_ref, h_ref, y0 + p + dy)[:, dx:dx + w]
            off += cn

        gates = jnp.dot(wt_ref[...], xrow_ref[...],
                        preferred_element_type=jnp.float32)  # (4C, pack*W)

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


def pad_hcw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, C, W) -> (B, H+2, C, W+2): the zero halo ring a 3x3 SAME conv
    needs, applied in the dims the kernel blocks over."""
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))


@functools.partial(jax.jit,
                   static_argnames=("cx", "ch", "interpret"))
def fused_cell_rowmajor(h_pad: jnp.ndarray, x_pad: jnp.ndarray | None,
                        c_prev: jnp.ndarray, s_term: jnp.ndarray,
                        wt: jnp.ndarray, *, cx: int, ch: int,
                        interpret: bool = False):
    """One fused ConvLSTM cell step in the (B, H, C, W) layout.

    Args:
      h_pad: (B, H+2, C, W+2) row/col zero-padded previous hidden state.
      x_pad: (B, H+2, Cx, W+2) padded up-input, or None when cx == 0.
      c_prev: (B, H, C, W).
      s_term: (B, H, 4C, W) scan-constant skip contribution + bias.
      wt: (4C, 9*(Cx+C)) packed weights (pack_cell_weights).
    Returns:
      (h, c): each (B, H, C, W), dtype of h_pad.
    """
    b, hp2, c_dim, wp2 = h_pad.shape
    h, w = hp2 - 2, wp2 - 2
    assert c_dim == ch and c_prev.shape == (b, h, ch, w)
    assert s_term.shape == (b, h, 4 * ch, w), s_term.shape
    th = _pick_tile(h)
    pack = max(1, 128 // w)
    while th % pack != 0:
        pack //= 2
    dtype = h_pad.dtype
    if x_pad is None:
        assert cx == 0
        x_pad = h_pad  # placeholder; kernel never reads it when cx == 0

    grid = (b, h // th)

    def body_map(bi, ri):
        return (bi, ri, 0, 0)

    def halo_map(bi, ri):
        return (bi, (ri * th + th) // 2, 0, 0)

    h_body = pl.BlockSpec((1, th, ch, w + 2), body_map,
                          memory_space=pltpu.VMEM)
    h_halo = pl.BlockSpec((1, 2, ch, w + 2), halo_map,
                          memory_space=pltpu.VMEM)
    x_body = pl.BlockSpec((1, th, x_pad.shape[2], w + 2), body_map,
                          memory_space=pltpu.VMEM)
    x_halo = pl.BlockSpec((1, 2, x_pad.shape[2], w + 2), halo_map,
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, th, ch, w), body_map, memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, th, 4 * ch, w), body_map,
                          memory_space=pltpu.VMEM)

    kern = functools.partial(_cell_kernel, th=th, w=w, cx=cx, ch=ch,
                             pack=pack)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[h_body, h_halo, x_body, x_halo, c_spec, s_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, ch, w), dtype),
                   jax.ShapeDtypeStruct((b, h, ch, w), dtype)],
        scratch_shapes=[
            pltpu.VMEM((9 * (cx + ch), pack * w), dtype),
        ],
        interpret=interpret,
    )(h_pad, h_pad, x_pad, x_pad, c_prev, s_term, wt)
