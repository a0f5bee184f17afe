"""dy-folded gate matmul kernels vs the plain-jnp cell math.

The dy-fold reshapes the finest cells' gate conv from (4C, 9*Cn) @
(9*Cn, W) per output row into one (12C, 3*Cn) @ (3*Cn, (th+2)*W) matmul
per row-tile (ops/pallas_decode._cell_kernel_dyfold) — at cell4 of the
cityscapes geometry 4C = 32 wastes three quarters of the MXU's 128 rows
while the fold runs at ~2x the tile efficiency. These tests pin:
  * the tile-cost model's decisions at the real pyramid geometries,
  * forward parity (forced dy-fold vs forced standard vs jnp oracle),
  * the full custom_vjp gradient path at a dy-fold-selecting geometry
    (cell fwd + dgates bwd + dy-folded pullback convs) vs jax.grad,
all in interpret mode on CPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from rsis_tpu.models.clstm import lstm_state_update
from rsis_tpu.ops.pallas_decode import (_dyfold_pick, conv3x3_rowmajor,
                                        dyfold_selected,
                                        fused_cell_rowmajor,
                                        pack_cell_weights, pad_hcw)
from rsis_tpu.ops.pallas_decode_vjp import (_cell_backward_dgates,
                                            make_fused_cell_vjp)
from tests.test_pallas_vjp import reference_cell_rowmajor


def test_tile_cost_model_picks():
    # cityscapes pyramid, train (256x512) and bench (512x1024) geometries:
    # the fold must fire exactly at the finest cell and its xh pullback
    assert dyfold_selected(16, 8, 128, 256)[0]       # train cell4
    assert dyfold_selected(16, 8, 256, 512)[0]       # bench cell4
    assert not dyfold_selected(32, 16, 64, 128)[0]   # train cell3
    assert not dyfold_selected(64, 32, 32, 64)[0]    # train cell2 (packed)
    assert not dyfold_selected(0, 128, 8, 16)[0]     # cell0
    assert _dyfold_pick(24, 32, 128, 256)[0]         # cell4 xh pullback
    assert not _dyfold_pick(48, 64, 64, 128)[0]      # cell3 xh pullback


@pytest.mark.parametrize("h,w,cx,ch,dt", [
    (32, 128, 16, 8, jnp.float32),   # cell4-shaped, 2 row-tiles (halo mask)
    (16, 128, 0, 8, jnp.float32),    # forced fold on a no-up-input cell
    (32, 128, 16, 8, jnp.bfloat16),  # the train path's compute dtype
])
def test_dyfold_cell_forward_parity(h, w, cx, ch, dt):
    k = jax.random.PRNGKey(h + w + cx + ch)
    ks = jax.random.split(k, 5)
    b = 2
    x = (jax.random.normal(ks[0], (b, h, cx, w), dt) if cx else None)
    hp = jax.random.normal(ks[1], (b, h, ch, w), dt)
    cp = jax.random.normal(ks[2], (b, h, ch, w), dt)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), dt) * 0.3
    s = jax.random.normal(ks[4], (b, h, 4 * ch, w), dt) * 0.2
    wt = pack_cell_weights(kern, cx, ch, dtype=dt)
    x_pad = pad_hcw(x) if cx else None

    h_ref, c_ref = reference_cell_rowmajor(x, hp, cp, kern, s)
    h_dy, c_dy = fused_cell_rowmajor(hp, x_pad, cp, s, wt, cx=cx, ch=ch,
                                     interpret=True, dyfold=True)
    h_std, c_std = fused_cell_rowmajor(hp, x_pad, cp, s, wt, cx=cx, ch=ch,
                                       interpret=True, dyfold=False)
    # vs the jnp oracle: bf16 inputs accumulate differently there, so the
    # budget widens; vs the standard kernel both paths share the fp32
    # epilogue and only the matmul association differs
    tol = 2e-5 if dt == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(h_dy, np.float32),
                               np.asarray(h_ref, np.float32),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(c_dy, np.float32),
                               np.asarray(c_ref, np.float32),
                               atol=tol, rtol=tol)
    tol = 2e-5 if dt == jnp.float32 else 8e-3
    np.testing.assert_allclose(np.asarray(h_dy, np.float32),
                               np.asarray(h_std, np.float32),
                               atol=tol, rtol=tol)


def test_dyfold_conv_parity():
    b, h, w, cin, cout = 2, 32, 128, 32, 24
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (b, h, cin, w),
                          jnp.float32)
    kern = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, cin, cout),
                             jnp.float32) * 0.3
    wt = kern.reshape(9 * cin, cout).T
    ref = lax.conv_general_dilated(
        jnp.moveaxis(x, 2, -1), kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.moveaxis(ref, -1, 2)
    out_dy = conv3x3_rowmajor(x, wt, cin=cin, cout=cout, interpret=True,
                              dyfold=True)
    np.testing.assert_allclose(np.asarray(out_dy), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dyfold_bwd_dgates_matches_standard():
    b, h, w, cx, ch = 2, 32, 128, 16, 8
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 7)
    dt = jnp.float32
    hp = jax.random.normal(ks[0], (b, h, ch, w), dt)
    x = jax.random.normal(ks[1], (b, h, cx, w), dt)
    cp = jax.random.normal(ks[2], (b, h, ch, w), dt)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), dt) * 0.3
    s = jax.random.normal(ks[4], (b, h, 4 * ch, w), dt) * 0.2
    dh = jax.random.normal(ks[5], (b, h, ch, w), dt)
    dc = jax.random.normal(ks[6], (b, h, ch, w), dt)
    wt = pack_cell_weights(kern, cx, ch, dtype=dt)
    x_pad = pad_hcw(x)
    dg0, dcp0 = _cell_backward_dgates(hp, x_pad, cp, s, wt, dh, dc,
                                      cx=cx, ch=ch, interpret=True,
                                      dyfold=False)
    dg1, dcp1 = _cell_backward_dgates(hp, x_pad, cp, s, wt, dh, dc,
                                      cx=cx, ch=ch, interpret=True,
                                      dyfold=True)
    np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg0),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dcp1), np.asarray(dcp0),
                               atol=2e-5, rtol=2e-5)


def test_dyfold_full_vjp_matches_jax_grad():
    """At a dy-fold-selecting geometry the custom_vjp auto-routes the
    forward, the dgates recompute AND the xh pullback conv through the
    folded kernels — the composed gradient must still match jax.grad of
    the plain cell."""
    b, h, w, cx, ch = 2, 32, 128, 16, 8
    assert dyfold_selected(cx, ch, h, w)[0]
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 7)
    dt = jnp.float32
    hp = jax.random.normal(ks[0], (b, h, ch, w), dt)
    x = jax.random.normal(ks[1], (b, h, cx, w), dt)
    cp = jax.random.normal(ks[2], (b, h, ch, w), dt)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), dt) * 0.3
    s = jax.random.normal(ks[4], (b, h, 4 * ch, w), dt) * 0.2
    dh_ct = jax.random.normal(ks[5], (b, h, ch, w), dt)
    dc_ct = jax.random.normal(ks[6], (b, h, ch, w), dt)

    def obj_ref(hp, x, cp, kern, s):
        hh, cc = reference_cell_rowmajor(x, hp, cp, kern, s)
        return jnp.sum(hh * dh_ct) + jnp.sum(cc * dc_ct)

    cell = make_fused_cell_vjp(cx, ch, interpret=True)

    def obj_pallas(hp, x, cp, kern, s):
        hh, cc = cell(hp, pad_hcw(x), cp, s,
                      pack_cell_weights(kern, cx, ch, dtype=dt))
        return jnp.sum(hh * dh_ct) + jnp.sum(cc * dc_ct)

    args = (hp, x, cp, kern, s)
    np.testing.assert_allclose(float(obj_pallas(*args)),
                               float(obj_ref(*args)), rtol=1e-4)
    g_ref = jax.grad(obj_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(obj_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, p in zip(("h_prev", "x", "c_prev", "kernel", "s"),
                          g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_env_flip_resolved_at_call_boundary(monkeypatch):
    """RSIS_DYFOLD flips must reach NEW traces mid-process.

    Round-4 bug: the env var was read inside module-level-jitted kernel
    bodies, whose traces JAX caches by static args — flipping the var
    between two make_train_step builds was silently ignored (the first
    dy-fold A/B measured standard-vs-standard). The public entry points
    are now plain-Python wrappers that resolve the choice at the call
    boundary; this test intercepts the jitted impl to observe the
    concrete static bool each call passes."""
    import rsis_tpu.ops.pallas_decode as pd

    seen = []
    monkeypatch.setattr(
        pd, "_fused_cell_rowmajor",
        lambda *a, **k: seen.append(k["dyfold"]))

    cx, ch, h, w = 16, 8, 128, 256  # train cell4: the fold fires here
    hp = jnp.zeros((1, h, ch, w), jnp.bfloat16)
    xp = jnp.zeros((1, h + 2, cx, w + 2), jnp.bfloat16)
    s = jnp.zeros((1, h, 4 * ch, w), jnp.bfloat16)
    wt = jnp.zeros((4 * ch, 9 * (cx + ch)), jnp.bfloat16)

    monkeypatch.setenv("RSIS_DYFOLD", "0")
    pd.fused_cell_rowmajor(hp, xp, hp, s, wt, cx=cx, ch=ch)
    monkeypatch.delenv("RSIS_DYFOLD")
    pd.fused_cell_rowmajor(hp, xp, hp, s, wt, cx=cx, ch=ch)
    assert seen == [False, True]


def test_dwt_auto_policy():
    """The dwt kernel auto-enables exactly where it measurably won on
    silicon (perf_probe_dwt_step 2026-08-19: cell4 carries the win;
    lane-packed cells fault in-step) and honors the overrides."""
    from rsis_tpu.ops.pallas_decode_vjp import _dwt_kernel_enabled

    def with_env(val, ch, w, monkey=None):
        import os
        old = os.environ.pop("RSIS_PALLAS_DWT", None)
        if val is not None:
            os.environ["RSIS_PALLAS_DWT"] = val
        try:
            return _dwt_kernel_enabled(ch, w)
        finally:
            os.environ.pop("RSIS_PALLAS_DWT", None)
            if old is not None:
                os.environ["RSIS_PALLAS_DWT"] = old

    assert with_env(None, 8, 256)          # train cell4: on
    assert not with_env(None, 16, 128)     # train cell3: wash -> off
    assert not with_env(None, 128, 16)     # coarse packed cell: off
    assert with_env(None, 8, 512)          # bench-geometry cell4: on
    assert not with_env("0", 8, 256)       # global kill-switch
    assert with_env("all", 128, 16)        # force everywhere
    assert with_env("8,16", 16, 128)       # per-cell list
    assert not with_env("8,16", 32, 64)
