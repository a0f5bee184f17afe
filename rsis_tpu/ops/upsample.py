"""Bilinear upsampling with align_corners=True as two MXU matmuls.

The reference decoder upsamples ConvLSTM hidden states with
``nn.UpsamplingBilinear2d`` (align_corners=True semantics; reference:
src/modules/model.py:149,163). ``jax.image.resize`` only implements
half-pixel (align_corners=False) sampling, and bit-parity with the PyTorch
checkpoints depends on corner alignment (SURVEY.md §7 hard parts), so we
build the separable interpolation explicitly: a (H_out, H_in) row matrix and
a (W_out, W_in) column matrix applied as einsums. On TPU these are plain
matmuls that XLA places on the MXU and fuses with neighbouring elementwise
work — faster than a gather-based resize and exactly reproducible.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear interpolation weights, align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        x = i * scale
        lo = int(np.floor(x))
        hi = min(lo + 1, n_in - 1)
        frac = x - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def upsample_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                    out_w: int) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., out_h, out_w, C), align_corners=True.

    Precision policy: float32 inputs interpolate with exact fp32 matmuls
    (the PyTorch parity budget, <=1e-3 IoU delta per BASELINE.md, does not
    survive bf16-rounded weights); bfloat16 inputs — the throughput path —
    use the MXU's native bf16 multiply with fp32 accumulation, which is
    plenty for 2-tap interpolation weights.
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    exact = dtype == jnp.float32
    precision = "highest" if exact else None
    rm = jnp.asarray(_interp_matrix(h, out_h), dtype=jnp.float32 if exact
                     else dtype)
    cm = jnp.asarray(_interp_matrix(w, out_w), dtype=jnp.float32 if exact
                     else dtype)
    x = jnp.einsum("oh,...hwc->...owc", rm, x, precision=precision,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,...owc->...opc", cm, x, precision=precision,
                   preferred_element_type=jnp.float32)
    return x.astype(dtype)
