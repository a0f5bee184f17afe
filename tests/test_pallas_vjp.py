"""The custom_vjp fused cell must match jax.grad of the plain-jnp cell
math for every input (h_prev, x, c_prev, s, weights) — interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from rsis_tpu.models.clstm import lstm_state_update
from rsis_tpu.ops.pallas_decode import pack_cell_weights, pad_hcw
from rsis_tpu.ops.pallas_decode_vjp import make_fused_cell_vjp


def reference_cell_rowmajor(x, hp, cp, kern, s):
    """Plain-jnp cell on NHWC views of row-major tensors (autodiffable)."""
    def to_nhwc(a):
        return jnp.moveaxis(a, 2, -1)
    inp = (jnp.concatenate([to_nhwc(x), to_nhwc(hp)], -1) if x is not None
           else to_nhwc(hp))
    gates = lax.conv_general_dilated(
        inp, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + to_nhwc(s)
    h, c = lstm_state_update(gates, to_nhwc(cp))
    return jnp.moveaxis(h, -1, 2), jnp.moveaxis(c, -1, 2)


GEOMS = [
    (8, 16, 16, 8),    # up-input cell (lane-packed)
    (8, 32, 0, 16),    # no-up-input cell (cell0)
    (8, 128, 8, 4),    # full-lane path
]


@pytest.mark.parametrize("h,w,cx,ch", GEOMS)
def test_vjp_matches_jax_grad(h, w, cx, ch):
    k = jax.random.PRNGKey(h + w + cx + ch)
    ks = jax.random.split(k, 7)
    b = 2
    dt = jnp.float32
    x = (jax.random.normal(ks[0], (b, h, cx, w), dt) if cx else None)
    hp = jax.random.normal(ks[1], (b, h, ch, w), dt)
    cp = jax.random.normal(ks[2], (b, h, ch, w), dt)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), dt) * 0.3
    s = jax.random.normal(ks[4], (b, h, 4 * ch, w), dt) * 0.2
    dh_ct = jax.random.normal(ks[5], (b, h, ch, w), dt)
    dc_ct = jax.random.normal(ks[6], (b, h, ch, w), dt)

    # scalar objective so jax.grad drives both paths with the same
    # cotangents
    def obj_ref(hp, x, cp, kern, s):
        hh, cc = reference_cell_rowmajor(x, hp, cp, kern, s)
        return jnp.sum(hh * dh_ct) + jnp.sum(cc * dc_ct)

    cell = make_fused_cell_vjp(cx, ch, interpret=True)
    wt_of = lambda kern: pack_cell_weights(kern, cx, ch, dtype=dt)

    def obj_pallas(hp, x, cp, kern, s):
        x_pad = pad_hcw(x) if cx else None
        hh, cc = cell(hp, x_pad, cp, s, wt_of(kern))
        return jnp.sum(hh * dh_ct) + jnp.sum(cc * dc_ct)

    args = (hp, x, cp, kern, s)
    argnums = (0, 2, 3, 4) if cx == 0 else (0, 1, 2, 3, 4)
    g_ref = jax.grad(obj_ref, argnums=argnums)(*args)
    g_pal = jax.grad(obj_pallas, argnums=argnums)(*args)

    names = [("h_prev", "x", "c_prev", "kernel", "s")[i] for i in argnums]
    # primal values must agree too
    np.testing.assert_allclose(float(obj_pallas(*args)),
                               float(obj_ref(*args)), rtol=1e-4)
    for name, a, p in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}")
