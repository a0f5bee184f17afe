"""The two-pass Pallas warp must equal the direct clamped-gather warp
bit-for-bit (reference geometry: src/dataloader/transforms/utils.py:67-185;
direct formula: data/device_aug._nearest_index_map). Interpret mode on CPU;
the hardware path is exercised by the train bench."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsis_tpu.data.device_aug import sample_affine_matrices
from rsis_tpu.ops.pallas_warp import (
    _coef_from_matrices, affine_warp_planes, nearest_index_maps,
    warp_available, warp_coefficient_bounds)


def direct_warp(x, matrices, flip=None):
    """Oracle: the canonical gather path (nearest_index_maps) applied
    per-element in numpy — the exact semantics the kernel replaces."""
    x = np.asarray(x, np.float32)
    b, ch, h, w = x.shape
    fl = None if flip is None else jnp.asarray(flip)
    idx = np.asarray(nearest_index_maps(jnp.asarray(matrices), h, w, fl))
    out = np.zeros_like(x)
    for bi in range(b):
        out[bi] = x[bi].reshape(ch, -1)[:, idx[bi]].reshape(ch, h, w)
    return out


def _mats(b, h, w, seed, rotation=10.0, translation=0.1, shear=10.0,
          zoom=(0.77, 1.0)):
    return sample_affine_matrices(jax.random.PRNGKey(seed), b, h, w,
                                  rotation, translation, shear, zoom)


def assert_equal_except_f32_ties(got, want, matrices, h, w, flip=None,
                                 tol=1e-4, max_bad=16):
    """Exact equality, except at pixels whose f64 source coordinate lies
    within ``tol`` of a .5 rounding boundary: there the canonical f32
    formula is one ulp from a tie, and XLA's freedom to contract mul+add
    to fma makes separately compiled programs (kernel vs gather) round
    differently. Semantically both are valid nearest warps; structurally
    this asserts the kernel is exact everywhere else."""
    got, want = np.asarray(got), np.asarray(want)
    bad = np.argwhere(got != want)
    assert len(bad) <= max_bad, f"{len(bad)} mismatches (too many)"
    coef = np.asarray(_coef_from_matrices(matrices, h, w,
                                          None if flip is None
                                          else jnp.asarray(flip)))
    for bi, pi, r, c in bad:
        p, q, m, u, v, o = coef[bi, :6].astype(np.float64)
        fr = (p * r + (q * c + m)) % 1.0
        fc = (v * r + (u * c + o)) % 1.0
        near_tie = min(abs(fr - 0.5), abs(fc - 0.5)) < tol
        assert near_tie, (
            f"true mismatch at b{bi} ({r},{c}): fr={fr:.6f} fc={fc:.6f}")


class TestPallasWarp:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_exact_vs_direct(self, seed):
        b, ch, h, w = 2, 3, 128, 128
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(b, ch, h, w)).astype(np.float32))
        ms = _mats(b, h, w, seed)
        got = affine_warp_planes(x, ms, interpret=True)
        want = direct_warp(np.asarray(x), np.asarray(ms))
        assert_equal_except_f32_ties(got, want, ms, h, w)

    def test_exact_with_flip(self):
        b, ch, h, w = 4, 2, 128, 256
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(b, ch, h, w)).astype(np.float32))
        ms = _mats(b, h, w, 7)
        flip = jnp.asarray([True, False, True, False])
        got = affine_warp_planes(x, ms, flip=flip, interpret=True)
        want = direct_warp(np.asarray(x), np.asarray(ms),
                           np.asarray(flip))
        assert_equal_except_f32_ties(got, want, ms, h, w, flip=flip)

    def test_strong_translation_borders(self):
        # big translation forces row clamping -> edge-plane path
        b, ch, h, w = 2, 1, 128, 128
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(b, ch, h, w)).astype(np.float32))
        ms = _mats(b, h, w, 3, rotation=15.0, translation=0.2, shear=5.0,
                   zoom=(0.8, 1.2))
        got = affine_warp_planes(x, ms, interpret=True)
        want = direct_warp(np.asarray(x), np.asarray(ms))
        assert_equal_except_f32_ties(got, want, ms, h, w)

    def test_identity(self):
        b, ch, h, w = 1, 2, 128, 128
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, ch, h, w)).astype(np.float32))
        ms = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        got = affine_warp_planes(x, ms, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x))

    def test_bf16_ids_plane_exact(self):
        # integer id planes in bf16 must come through exactly
        b, ch, h, w = 2, 1, 128, 128
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 21, (b, ch, h, w)).astype(np.float32)
        x = jnp.asarray(ids, jnp.bfloat16)
        ms = _mats(b, h, w, 5)
        got = affine_warp_planes(x, ms, interpret=True)
        want = direct_warp(ids, np.asarray(ms)).astype(np.float32)
        assert_equal_except_f32_ties(
            np.asarray(got).astype(np.float32), want, ms, h, w)

    def test_availability_gate(self):
        assert warp_available(256, 512, 10.0, 10.0, (0.77, 1.0), 0.1)
        assert not warp_available(250, 512, 10.0, 10.0, (0.77, 1.0), 0.1)
        assert not warp_available(256, 512, 40.0, 30.0, (0.4, 2.5), 0.1)

    def test_coef_round_trip(self):
        # coefficients reproduce the direct index maps
        b, h, w = 3, 64, 96
        ms = _mats(b, h, w, 9)
        coef = np.asarray(_coef_from_matrices(ms, h, w))
        a = np.asarray(ms)[:, :2, :2]
        off = np.asarray(ms)[:, :2, 2]
        rows, cols = np.mgrid[0:h, 0:w].astype(np.float32)
        rc = rows - (h / 2.0 - 0.5)
        cc = cols - (w / 2.0 - 0.5)
        for bi in range(b):
            sr = (a[bi, 0, 0] * rc + a[bi, 0, 1] * cc + off[bi, 0]
                  + (h / 2.0 - 0.5))
            sc = (a[bi, 1, 0] * rc + a[bi, 1, 1] * cc + off[bi, 1]
                  + (w / 2.0 - 0.5))
            p, q, m, u, v, o = coef[bi, :6]
            np.testing.assert_allclose(p * rows + q * cols + m, sr,
                                       atol=1e-3)
            np.testing.assert_allclose(v * rows + u * cols + o, sc,
                                       atol=1e-3)
