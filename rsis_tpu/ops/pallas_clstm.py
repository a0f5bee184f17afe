"""Fused ConvLSTM cell step as a single Pallas TPU kernel.

The decoder's hot loop is 5 ConvLSTM cells per timestep at large spatial
extents with tiny channel counts (8..128) — an HBM-bandwidth-bound shape on
TPU. The XLA path materialises concat(x, h_prev) and the 4C-channel gate
tensor in HBM every step; this kernel keeps both in VMEM:

  gates = sum_{dy,dx} x_slab[dy,dx] @ Wx[dy,dx] + h_slab[dy,dx] @ Wh[dy,dx]
  c = sigmoid(f)*c_prev + sigmoid(i)*tanh(g);  h = sigmoid(o)*tanh(c)

- the 3x3 gate convolution is 9 shifted (TILE_H*W, Cin) @ (Cin, 4C) MXU
  matmuls accumulated in fp32 VMEM scratch-free registers;
- concat(x, h) is never built: the weight is split into Wx/Wh and the two
  contributions accumulate into the same gates;
- inputs arrive pre-padded by one pixel (jnp.pad outside the kernel) so
  every grid tile does two fixed-size async DMAs and zero edge branches;
- the LSTM pointwise update fuses into the epilogue; only h and c ever
  return to HBM.

Used on the inference path (models/rsis.forward); training keeps the XLA
conv so autodiff is untouched. Equivalence vs the flax cell is unit-tested
(tests/test_pallas_clstm.py). Kernel contract follows the reference cell
semantics (reference: src/modules/clstm.py:40-62).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell_kernel(xp_ref, hp_ref, c_ref, wx_ref, wh_ref, b_ref,
                 h_out, c_out, xs, hs, sems, *, tile_h, width, cx, ch):
    bi = pl.program_id(0)
    r = pl.program_id(1)

    copy_x = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(r * tile_h, tile_h + 2)], xs, sems.at[0])
    copy_h = pltpu.make_async_copy(
        hp_ref.at[bi, pl.ds(r * tile_h, tile_h + 2)], hs, sems.at[1])
    copy_x.start()
    copy_h.start()
    copy_x.wait()
    copy_h.wait()

    acc = jnp.zeros((tile_h * width, 4 * ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xk = xs[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, cx)
            acc += jnp.dot(xk, wx_ref[dy, dx],
                           preferred_element_type=jnp.float32)
            hk = hs[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, ch)
            acc += jnp.dot(hk, wh_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)

    i_g = jax.nn.sigmoid(acc[:, 0 * ch:1 * ch])
    f_g = jax.nn.sigmoid(acc[:, 1 * ch:2 * ch])
    o_g = jax.nn.sigmoid(acc[:, 2 * ch:3 * ch])
    g_g = jnp.tanh(acc[:, 3 * ch:4 * ch])

    c_prev = c_ref[0].reshape(tile_h * width, ch).astype(jnp.float32)
    c_new = f_g * c_prev + i_g * g_g
    h_new = o_g * jnp.tanh(c_new)
    h_out[0] = h_new.reshape(tile_h, width, ch).astype(h_out.dtype)
    c_out[0] = c_new.reshape(tile_h, width, ch).astype(c_out.dtype)


def _pick_tile_h(h: int) -> int:
    for th in (16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convlstm_step(x: jnp.ndarray, h_prev: jnp.ndarray,
                        c_prev: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, interpret: bool = False):
    """One ConvLSTM step, 3x3 SAME conv over concat(x, h_prev).

    Args:
      x: (B, H, W, Cx) cell input.
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
    wx = kernel[:, :, :cx, :].astype(dtype)
    wh = kernel[:, :, cx:, :].astype(dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp = jnp.pad(h_prev.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))

    tile_h = _pick_tile_h(h)
    grid = (b, h // tile_h)

    kern = functools.partial(_cell_kernel, tile_h=tile_h, width=w,
                             cx=cx, ch=ch)
    h_out, c_out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile_h, w, ch),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w, ch),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w, ch),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, ch), dtype),
            jax.ShapeDtypeStruct((b, h, w, ch), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w + 2, cx), dtype),
            pltpu.VMEM((tile_h + 2, w + 2, ch), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, hp, c_prev, wx, wh, bias)
    return h_out, c_out
