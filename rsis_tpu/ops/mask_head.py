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
def _row2x_weights(n_in: int):
    """Phase-split 2-tap weights of the align-corners 2x interp matrix.

    For ``U = _interp_matrix(n_in, 2*n_in)`` the banded structure is
    shift-regular once split into even/odd output phases:

      out[2m]   = a[m] * in[m-1] + b[m] * in[m]     (a[0] = 0)
      out[2m+1] = c[m] * in[m]   + d[m] * in[m+1]   (d[-1] = 0)

    (floor(2m*(n-1)/(2n-1)) == m-1 and floor((2m+1)*(n-1)/(2n-1)) == m for
    every interior m), so row upsampling needs two shifted multiplies
    instead of a dense (2n, n) matmul. Returns (a, b, c, d) float32 vectors
    of length n_in; the reconstruction is asserted equal to U so any
    convention drift in _interp_matrix fails loudly here.
    """
    u = _interp_matrix(n_in, 2 * n_in)
    a = np.zeros(n_in, np.float32)
    b = np.zeros(n_in, np.float32)
    c = np.zeros(n_in, np.float32)
    d = np.zeros(n_in, np.float32)
    for m in range(n_in):
        b[m] = u[2 * m, m]
        if m > 0:
            a[m] = u[2 * m, m - 1]
        c[m] = u[2 * m + 1, m]
        if m + 1 < n_in:
            d[m] = u[2 * m + 1, m + 1]
    recon = np.zeros_like(u)
    for m in range(n_in):
        recon[2 * m, m] += b[m]
        if m > 0:
            recon[2 * m, m - 1] += a[m]
        recon[2 * m + 1, m] += c[m]
        if m + 1 < n_in:
            recon[2 * m + 1, m + 1] += d[m]
    assert np.array_equal(recon, u), "align-corners 2x is not 2-banded?"
    return a, b, c, d


def _row_upsample2x(z: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """(..., H, W) -> (..., 2H, W) align-corners bilinear via the phase
    split of _row2x_weights (no matmul)."""
    a, b, c, d = (jnp.asarray(v)[:, None] for v in _row2x_weights(n_in))
    zp = jnp.concatenate([z[..., :1, :], z[..., :-1, :]], axis=-2)
    zn = jnp.concatenate([z[..., 1:, :], z[..., -1:, :]], axis=-2)
    even = a * zp + b * z
    odd = c * z + d * zn
    q = jnp.stack([even, odd], axis=-2)  # (..., H, 2, W)
    return q.reshape(*z.shape[:-2], 2 * n_in, z.shape[-1])


def _shift_zero(x: jnp.ndarray, delta: int, axis: int) -> jnp.ndarray:
    """out[j] = x[j + delta] along ``axis`` with zero fill (the conv's
    SAME-padding shift composed after interpolation)."""
    if delta == 0:
        return x
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    pad = [(0, 0)] * x.ndim
    if delta > 0:
        idx[axis] = slice(delta, n)
        pad[axis] = (0, delta)
    else:
        idx[axis] = slice(0, n + delta)
        pad[axis] = (-delta, 0)
    return jnp.pad(x[tuple(idx)], pad)


def mask_head_banded(hs: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, layout: str = "nhcw") -> jnp.ndarray:
    """conv3x3(upsample_2x_align_corners(h)) with a banded row stage.

    Same math as mask_head_fused / mask_head_rowmajor, but exploits the
    2-banded structure of the align-corners interp matrices: the row
    interpolation for all 9 conv taps is two shifted multiplies
    (_row_upsample2x), the dy conv shifts ride as zero-fill row shifts, and
    the dy-sum shrinks the tap axis 9 -> 3 *before* the only remaining
    dense matmul (the W -> 2W column interpolation, batched over dx). That
    cuts the head's matmul FLOPs >2x vs the 9 + 3 dense einsums of
    mask_head_fused (the measured cost there is the dense interp FLOPs, not
    layout — docs/PERF.md).

    Args:
      hs: (N, H, C, W) finest hidden states (layout="nhcw", the Pallas
        decode layout — reads compact HBM tiles) or (N, H, W, C)
        (layout="nhwc").
      kernel: (3, 3, C, 1) HWIO conv weight.
      bias: (1,).
    Returns:
      (N, 2H, 2W, 1) mask logits.
    """
    if layout == "nhcw":
        n, hh, c, ww = hs.shape
        spec = "nhcw,tc->tnhw"
    elif layout == "nhwc":
        n, hh, ww, c = hs.shape
        spec = "nhwc,tc->tnhw"
    else:
        raise ValueError(f"unknown layout {layout!r}")
    oh, ow = 2 * hh, 2 * ww
    dtype = hs.dtype
    exact = dtype == jnp.float32
    mdtype = jnp.float32 if exact else dtype
    precision = "highest" if exact else None

    k9 = kernel[..., 0].reshape(9, c).astype(mdtype)
    # all 9 channel contractions in one pass
    z = jnp.einsum(spec, hs.astype(mdtype), k9, precision=precision,
                   preferred_element_type=jnp.float32)  # (9, N, H, W) f32
    q = _row_upsample2x(z, hh)  # (9, N, 2H, W)
    # compose the conv's row shift and reduce the tap axis 9 -> 3 (by dx)
    y = jnp.stack([
        sum(_shift_zero(q[dy * 3 + dx], dy - 1, axis=-2)
            for dy in range(3))
        for dx in range(3)], axis=0).astype(mdtype)  # (3, N, 2H, W)
    ucol = jnp.asarray(_interp_matrix(ww, ow), mdtype)
    ycol = jnp.einsum("xnhw,pw->xnhp", y, ucol, precision=precision,
                      preferred_element_type=jnp.float32)  # (3, N, 2H, 2W)
    out = sum(_shift_zero(ycol[dx], dx - 1, axis=-1) for dx in range(3))
    out = out + bias[0].astype(out.dtype)
    return out[..., None].astype(dtype)


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
