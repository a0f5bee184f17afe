"""Interpret-mode equivalence of the row-major fused decode cell
(ops/pallas_decode.py) against the reference cell math
(models/clstm.lstm_state_update + a plain XLA conv)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from rsis_tpu.models.clstm import lstm_state_update
from rsis_tpu.ops.pallas_decode import (
    fused_cell_rowmajor, pack_cell_weights, pad_hcw)


def reference_cell(x_nhwc, h_nhwc, c_nhwc, kernel, s_nhwc):
    """gates = conv(concat(x, h)) + s (bias folded into s); LSTM update."""
    inp = (jnp.concatenate([x_nhwc, h_nhwc], -1) if x_nhwc is not None
           else h_nhwc)
    gates = lax.conv_general_dilated(
        inp, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + s_nhwc
    return lstm_state_update(gates, c_nhwc)


def to_rowmajor(x_nhwc):
    return jnp.moveaxis(x_nhwc, -1, 2)  # (B,H,W,C) -> (B,H,C,W)


def from_rowmajor(x_bhcw):
    return jnp.moveaxis(x_bhcw, 2, -1)


GEOMS = [
    # (H, W, Cx, C) — one geometry per distinct kernel code path (interpret
    # mode executes the unrolled kernel per grid point, so keep these
    # minimal): no-up-input (cell0), lane-packing W<128, full-lane W=128
    (8, 32, 0, 16),
    (8, 16, 16, 8),
    (8, 128, 8, 4),
]


@pytest.mark.parametrize("h,w,cx,ch", GEOMS)
def test_fused_cell_matches_reference(h, w, cx, ch):
    k = jax.random.PRNGKey(h * 1000 + w + cx + ch)
    ks = jax.random.split(k, 6)
    b = 2
    dt = jnp.float32  # interpret mode: compare exactly in f32
    x = (jax.random.normal(ks[0], (b, h, w, cx), dt) if cx else None)
    hp = jax.random.normal(ks[1], (b, h, w, ch), dt)
    cp = jax.random.normal(ks[2], (b, h, w, ch), dt)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), dt) * 0.2
    s = jax.random.normal(ks[4], (b, h, w, 4 * ch), dt) * 0.1

    h_ref, c_ref = reference_cell(x, hp, cp, kern, s)

    wt = pack_cell_weights(kern, cx, ch, dtype=dt)
    x_pad = pad_hcw(to_rowmajor(x)) if cx else None
    h_got, c_got = fused_cell_rowmajor(
        to_rowmajor(hp), x_pad, to_rowmajor(cp), to_rowmajor(s), wt,
        cx=cx, ch=ch, interpret=True)

    np.testing.assert_allclose(np.asarray(from_rowmajor(h_got)),
                               np.asarray(h_ref), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(from_rowmajor(c_got)),
                               np.asarray(c_ref), atol=2e-5, rtol=2e-5)


def test_weight_packing_layout():
    """Row order of the packed weight must match the kernel's xrow stack:
    9 x-taps (tap-major, channel-minor), then 9 h-taps."""
    cx, ch = 2, 3
    kern = jnp.arange(3 * 3 * (cx + ch) * 4 * ch,
                      dtype=jnp.float32).reshape(3, 3, cx + ch, 4 * ch)
    wt = pack_cell_weights(kern, cx, ch, dtype=jnp.float32)
    assert wt.shape == (4 * ch, 9 * (cx + ch))
    # x-tap block row (dy=1, dx=2, cin=1) lives at 9-tap-major position
    row = (1 * 3 + 2) * cx + 1
    np.testing.assert_array_equal(np.asarray(wt[:, row]),
                                  np.asarray(kern[1, 2, 1, :]))
    # h-tap block starts after all x rows
    hrow = 9 * cx + (0 * 3 + 1) * ch + 2
    np.testing.assert_array_equal(np.asarray(wt[:, hrow]),
                                  np.asarray(kern[0, 1, cx + 2, :]))
