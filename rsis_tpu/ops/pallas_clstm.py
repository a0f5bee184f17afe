"""Fused ConvLSTM cell step as a single Pallas TPU kernel.

The decoder's hot loop is 5 ConvLSTM cells per timestep at large spatial
extents with tiny channel counts (8..128) — a shape where XLA pays a fixed
per-op cost an order of magnitude above the roofline. This kernel computes
one whole cell update in VMEM:

  gates = sum_{dy,dx} x_slab[dy,dx] @ Wx[dy,dx] + h_slab[dy,dx] @ Wh[dy,dx]
  c = sigmoid(f)*c_prev + sigmoid(i)*tanh(g);  h = sigmoid(o)*tanh(c)

- the 3x3 gate convolution is evaluated as shifted (rows, Cin) @ (Cin, 4C)
  MXU matmuls accumulated in fp32 VMEM scratch;
- concat(x, h) is never built: the weight splits into Wx/Wh and both
  contributions accumulate into the same gates;
- halo handling uses *standard pipelined BlockSpecs* (Mosaic rejects manual
  DMA of non-128-lane slabs from ANY refs): inputs are pre-padded by one
  pixel, each grid tile reads a TILE_H-row body block plus a 2-row bottom
  halo block of the same padded array, and every conv tap splits into a
  body part and a halo part written to disjoint row ranges of the gate
  accumulator;
- the LSTM pointwise update fuses into the epilogue; only h and c return
  to HBM.

Equivalence vs the flax cell is unit-tested in interpreter mode
(tests/test_pallas_clstm.py) and verified compiled on TPU hardware
(max |dh| 4e-3 bf16 vs the XLA cell at 256x512 geometry). Status: correct
but not yet profitable — lane padding forces 2-row tiles at the finest
scales (VMEM budget) and the resulting 2k-program grid underruns the XLA
conv (15.5 vs 5.0 ms/step at cell4/batch16), so the shipped fast decode
(models/fast_decoder.py) stays pure XLA. The round-2 plan is a W-in-lanes
layout (width as the 128-lane axis) or one mega-kernel covering all five
cells per decode step. Kernel contract follows the reference cell semantics
(reference: src/modules/clstm.py:40-62).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import mxu_dot


def _cell_kernel(xa_ref, xb_ref, ha_ref, hb_ref, c_ref, wx_ref, wh_ref,
                 b_ref, h_out, c_out, acc, *, tile_h, width, cx, ch):
    acc[...] = jnp.zeros_like(acc)
    for dy in range(3):
        body_rows = tile_h - dy  # slab rows [dy, tile_h) come from the body
        for dx in range(3):
            if body_rows > 0:
                xa = xa_ref[0, dy:tile_h, dx:dx + width, :].reshape(
                    body_rows * width, cx)
                ha = ha_ref[0, dy:tile_h, dx:dx + width, :].reshape(
                    body_rows * width, ch)
                contrib = mxu_dot(xa, wx_ref[dy, dx])
                contrib += mxu_dot(ha, wh_ref[dy, dx])
                acc[0:body_rows * width, :] += contrib
            if dy > 0:
                # slab rows [tile_h, tile_h + dy) come from the halo block
                xb = xb_ref[0, 0:dy, dx:dx + width, :].reshape(
                    dy * width, cx)
                hb = hb_ref[0, 0:dy, dx:dx + width, :].reshape(
                    dy * width, ch)
                tail = mxu_dot(xb, wx_ref[dy, dx])
                tail += mxu_dot(hb, wh_ref[dy, dx])
                acc[body_rows * width:tile_h * width, :] += tail

    gates = acc[...] + b_ref[:].astype(jnp.float32)
    i_g = jax.nn.sigmoid(gates[:, 0 * ch:1 * ch])
    f_g = jax.nn.sigmoid(gates[:, 1 * ch:2 * ch])
    o_g = jax.nn.sigmoid(gates[:, 2 * ch:3 * ch])
    g_g = jnp.tanh(gates[:, 3 * ch:4 * ch])

    c_prev = c_ref[0].reshape(tile_h * width, ch).astype(jnp.float32)
    c_new = f_g * c_prev + i_g * g_g
    h_new = o_g * jnp.tanh(c_new)
    h_out[0] = h_new.reshape(tile_h, width, ch).astype(h_out.dtype)
    c_out[0] = c_new.reshape(tile_h, width, ch).astype(c_out.dtype)


def _pick_tile_h(h: int, w: int, cx: int, ch: int,
                 budget_bytes: int = 6 * 2**20) -> int:
    """Largest tile height whose VMEM working set (with Mosaic's 128-lane
    padding and double-buffered pipeline blocks) fits the budget."""
    def lanes(c):
        return ((c + 127) // 128) * 128

    for th in (16, 8, 4, 2):
        if h % th != 0:
            continue
        per_row = (w + 2) * (lanes(cx) + lanes(ch)) * 2  # x + h blocks, bf16
        blocks = 2 * ((th + 2) * per_row          # body+halo, double-buffered
                      + 3 * th * w * lanes(ch) * 2)  # c_prev + h/c outs
        acc = th * w * lanes(4 * ch) * 4
        if blocks + acc <= budget_bytes:
            return th
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convlstm_step(x: jnp.ndarray, h_prev: jnp.ndarray,
                        c_prev: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, interpret: bool = False):
    """One ConvLSTM step, 3x3 SAME conv over concat(x, h_prev).

    Args:
      x: (B, H, W, Cx) cell input; H must be divisible by 2.
      h_prev, c_prev: (B, H, W, C) previous state.
      kernel: (3, 3, Cx + C, 4C) HWIO gate conv weight (flax layout,
        gate order [i, f, o, g] like the reference chunk order).
      bias: (4C,).
    Returns:
      (h, c): each (B, H, W, C).
    """
    b, h, w, cx = x.shape
    ch = h_prev.shape[-1]
    dtype = x.dtype
    tile_h = _pick_tile_h(h, w, cx, ch)
    if tile_h == 0:
        raise ValueError(
            f"no feasible tile for H={h}, W={w}, Cx={cx}, C={ch}")
    wx = kernel[:, :, :cx, :].astype(dtype)
    wh = kernel[:, :, cx:, :].astype(dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp = jnp.pad(h_prev.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (b, h // tile_h)

    def body_map(bi, ri):
        return (bi, ri, 0, 0)

    def halo_map(bi, ri):
        # padded rows [ri*tile_h + tile_h, +2) in units of 2-row blocks
        return (bi, (ri * tile_h + tile_h) // 2, 0, 0)

    body_spec_x = pl.BlockSpec((1, tile_h, w + 2, cx), body_map,
                               memory_space=pltpu.VMEM)
    halo_spec_x = pl.BlockSpec((1, 2, w + 2, cx), halo_map,
                               memory_space=pltpu.VMEM)
    body_spec_h = pl.BlockSpec((1, tile_h, w + 2, ch), body_map,
                               memory_space=pltpu.VMEM)
    halo_spec_h = pl.BlockSpec((1, 2, w + 2, ch), halo_map,
                               memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, tile_h, w, ch), body_map,
                              memory_space=pltpu.VMEM)

    kern = functools.partial(_cell_kernel, tile_h=tile_h, width=w,
                             cx=cx, ch=ch)
    h_out, c_out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            body_spec_x, halo_spec_x,
            body_spec_h, halo_spec_h,
            state_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, ch), dtype),
            jax.ShapeDtypeStruct((b, h, w, ch), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h * w, 4 * ch), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, hp, hp, c_prev, wx, wh, bias)
    return h_out, c_out
