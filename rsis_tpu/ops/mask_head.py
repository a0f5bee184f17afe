"""Fused mask head: (2x align-corners upsample) ∘ (3x3 conv) as MXU matmuls.

The reference mask head upsamples the finest ConvLSTM hidden state 2x and
applies a 3x3 conv to 1 channel (reference: src/modules/model.py:163-167).
At 512x1024 with 8 input channels that conv is hopeless on TPU (1-channel
output, 8-channel input → 128-lane padding waste; measured 3.3 ms/step vs a
~0.05 ms roofline). Both ops are linear, so the composition is evaluated
exactly as:

  out = sum_dy R_dy @ ( sum_dx (h . k[dy,dx]) @ C_dx^T ) + bias

where ``h . k[dy,dx]`` contracts the channel dim (a (C -> 1) dot per tap),
and R_dy / C_dx are the align-corners interpolation matrices composed with
the conv's +-1 shift (zero rows/cols at the borders reproduce SAME
padding). Every matmul is large and dense on the MXU; the result is
bit-equal to conv(upsample(h)) up to fp32 accumulation order.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .upsample import _interp_matrix


@functools.lru_cache(maxsize=64)
def _shifted_interp(n_in: int, n_out: int, delta: int) -> np.ndarray:
    """(n_out, n_in) matrix of rows ``U[j + delta]`` with zero padding,
    composing the conv's spatial shift with align-corners interpolation."""
    u = _interp_matrix(n_in, n_out)
    m = np.zeros_like(u)
    lo = max(0, -delta)
    hi = min(n_out, n_out - delta)
    m[lo:hi] = u[lo + delta:hi + delta]
    return m


def mask_head_rowmajor(hs: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(upsample_2x_align_corners(h)) over row-major states.

    Same math as mask_head_fused but consuming (N, H, C, W) tensors — the
    Pallas decode layout — so the channel contraction reads compact HBM
    tiles (an NHWC C=8 input is lane-padded 16x by XLA) and N can be T*B:
    the decode scan defers the mask head and runs it ONCE over all
    timesteps, turning 20 small per-step matmul groups into MXU-saturating
    (N*H, W) @ (W, 2W) shapes.

    Args:
      hs: (N, H, C, W) finest hidden states.
      kernel: (3, 3, C, 1) HWIO conv weight.
      bias: (1,).
    Returns:
      (N, 2H, 2W, 1) mask logits.
    """
    n, hh, c, ww = hs.shape
    oh, ow = 2 * hh, 2 * ww
    dtype = hs.dtype
    exact = dtype == jnp.float32
    mdtype = jnp.float32 if exact else dtype
    precision = "highest" if exact else None

    k9 = kernel[..., 0].reshape(9, c).astype(mdtype)       # (9, C)
    hf = hs.astype(mdtype)
    # all 9 channel contractions in one pass over the compact input
    z = jnp.einsum("nhcw,tc->tnhw", hf, k9, precision=precision,
                   preferred_element_type=jnp.float32).astype(mdtype)
    cols = [jnp.asarray(_shifted_interp(ww, ow, dx - 1), mdtype)
            for dx in range(3)]
    rows = [jnp.asarray(_shifted_interp(hh, oh, dy - 1), mdtype)
            for dy in range(3)]
    out = None
    for dy in range(3):
        acc = None
        for dx in range(3):
            t = jnp.einsum("nhw,pw->nhp", z[dy * 3 + dx], cols[dx],
                           precision=precision,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        r = jnp.einsum("nhp,oh->nop", acc.astype(mdtype), rows[dy],
                       precision=precision,
                       preferred_element_type=jnp.float32)
        out = r if out is None else out + r
    out = out + bias[0].astype(out.dtype)
    return out[..., None].astype(dtype)


def mask_head_fused(h: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(upsample_2x_align_corners(h)) for a 1-channel head.

    Args:
      h: (B, H, W, C) finest hidden state.
      kernel: (3, 3, C, 1) HWIO conv weight.
      bias: (1,).
    Returns:
      (B, 2H, 2W, 1) mask logits.
    """
    b, hh, ww, c = h.shape
    oh, ow = 2 * hh, 2 * ww
    dtype = h.dtype
    exact = dtype == jnp.float32
    mdtype = jnp.float32 if exact else dtype
    precision = "highest" if exact else None

    k = kernel[..., 0].astype(mdtype)  # (3, 3, C)
    hf = h.astype(mdtype)
    rows = [jnp.asarray(_shifted_interp(hh, oh, dy - 1), mdtype)
            for dy in range(3)]
    cols = [jnp.asarray(_shifted_interp(ww, ow, dx - 1), mdtype)
            for dx in range(3)]

    out = None
    for dy in range(3):
        acc = None
        for dx in range(3):
            z = jnp.einsum("bhwc,c->bhw", hf, k[dy, dx],
                           precision=precision,
                           preferred_element_type=jnp.float32)
            t = jnp.einsum("bhw,pw->bhp", z.astype(mdtype), cols[dx],
                           precision=precision,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        r = jnp.einsum("bhp,oh->bop", acc.astype(mdtype), rows[dy],
                       precision=precision,
                       preferred_element_type=jnp.float32)
        out = r if out is None else out + r
    out = out + bias[0].astype(out.dtype)
    return out[..., None].astype(dtype)
