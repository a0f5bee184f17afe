"""Banded Pallas mask head must match conv3x3(upsample2x(h)) exactly.

mask_head_fused is itself proven against flax conv + align-corners
upsample (test_fast_decoder.TestMaskHead), so equivalence to it transfers
the proof. Interpret mode on CPU; the hardware path is exercised by
bench.py (reference math: src/modules/model.py:163-167)."""

import numpy as np
import pytest
import jax.numpy as jnp

from rsis_tpu.ops.mask_head import mask_head_fused
from rsis_tpu.ops.pallas_mask_head import (
    _col_cat_matrix, _pick_tile, make_mask_head_vjp, mask_head_pallas,
    mask_head_pallas_t, pallas_head_available)
from rsis_tpu.ops.upsample import _interp_matrix


def _case(b, h, c, w, seed=0):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.normal(size=(b, h, c, w)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    return hs, k, bias


class TestPallasMaskHead:
    @pytest.mark.parametrize("shape", [
        (2, 8, 8, 16),    # single tile
        (1, 64, 8, 16),   # one 64-row tile
        (2, 48, 4, 8),    # three 16-row tiles (halo + edge masks)
        (1, 96, 8, 16),   # multi-tile at th=32
        (1, 6, 3, 8),     # odd channel count, tiny tile
    ])
    def test_matches_fused(self, shape):
        hs, k, bias = _case(*shape)
        want = mask_head_fused(jnp.moveaxis(hs, 2, -1), k, bias)
        got = mask_head_pallas(hs, k, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_planes_major_entry(self):
        hs, k, bias = _case(2, 48, 4, 8)
        want = mask_head_fused(jnp.moveaxis(hs, 2, -1), k, bias)
        got = mask_head_pallas_t(jnp.moveaxis(hs, 2, 1), k, bias,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_phase_weight_identity(self):
        # the closed forms in the kernel must reproduce _interp_matrix
        for h in (2, 3, 7, 16, 256):
            u = _interp_matrix(h, 2 * h)
            recon = np.zeros_like(u)
            denom = 2 * h - 1
            for m in range(h):
                a = m / denom
                recon[2 * m, m] += 1.0 - a
                if m > 0:
                    recon[2 * m, m - 1] += a
                d = (h - 1 - m) / denom
                recon[2 * m + 1, m] += 1.0 - d
                if m + 1 < h:
                    recon[2 * m + 1, m + 1] += d
            np.testing.assert_allclose(recon, u, atol=1e-6)

    def test_col_cat_matrix_shifts(self):
        w = 8
        u_t = _interp_matrix(w, 2 * w).T
        cat = _col_cat_matrix(w)
        assert cat.shape == (3 * w, 2 * w)
        v = np.random.default_rng(0).normal(size=w)
        full = v @ u_t
        for dx, delta in ((0, -1), (1, 0), (2, 1)):
            got = v @ cat[dx * w:(dx + 1) * w]
            want = np.zeros(2 * w)
            lo, hi = max(0, -delta), min(2 * w, 2 * w - delta)
            want[lo:hi] = full[lo + delta:hi + delta]
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_vjp_grads_match_dense(self):
        # training head: Pallas forward, dense-pullback backward — grads of
        # a nonlinear scalar loss must match jax.grad of mask_head_fused
        import jax

        hs, k, bias = _case(2, 16, 4, 8, seed=3)
        head = make_mask_head_vjp(interpret=True)

        def loss_pallas(hs, k, bias):
            return jnp.sum(jnp.tanh(head(hs, k, bias)))

        def loss_dense(hs, k, bias):
            return jnp.sum(jnp.tanh(
                mask_head_fused(jnp.moveaxis(hs, 2, -1), k, bias)))

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(hs, k, bias)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(hs, k, bias)
        for a, b in zip(g_p, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_availability_gate(self):
        assert pallas_head_available((32, 256, 8, 512))
        assert pallas_head_available((32, 128, 8, 256))
        assert not pallas_head_available((1, 10, 8, 512))   # th=10 odd tile
        assert not pallas_head_available((1, 256, 8, 100))  # partial lanes
        assert _pick_tile(256) == 64


class TestVpuTail:
    """The banded VPU tail (lane rolls + bf16-pair int32 interleave) must
    match both the matmul tail and the dense f32 reference. bf16-only by
    construction (it packs bf16 pairs into int32 lanes)."""

    @pytest.mark.parametrize("shape", [
        (2, 8, 8, 16),    # single tile
        (1, 64, 8, 16),   # one 64-row tile
        (2, 48, 4, 8),    # three 16-row tiles (halo + edge masks)
        (1, 96, 8, 16),   # multi-tile at th=32
        (1, 128, 8, 256), # train head geometry, lane-multi-tile rolls
    ])
    def test_matches_matmul_and_fused(self, shape):
        hs, k, bias = _case(*shape)
        hs = hs.astype(jnp.bfloat16)
        vpu = np.asarray(
            mask_head_pallas(hs, k, bias, interpret=True, variant="vpu"),
            np.float32)
        mat = np.asarray(
            mask_head_pallas(hs, k, bias, interpret=True,
                             variant="matmul"), np.float32)
        want = np.asarray(
            mask_head_fused(jnp.moveaxis(hs, 2, -1).astype(jnp.float32),
                            k, bias), np.float32)
        # both tails quantize the same f32 values to bf16; they may
        # differ by accumulation order -> ~2 bf16 ulp relative, and near
        # cancellation the abs error is an ulp of the large SUMMANDS,
        # so the atol scales with the output magnitude
        tol = 2 * 2**-8
        np.testing.assert_allclose(vpu, mat, rtol=tol,
                                   atol=tol * np.max(np.abs(mat)))
        scale = np.max(np.abs(want))
        assert np.max(np.abs(vpu - want)) < 0.02 * scale + 0.05

    def test_vpu_output_dtype_and_interleave(self):
        # the int32 pack + bitcast must land even columns from the even
        # phase: a column-index ramp input survives exactly
        b, h, c, w = 1, 8, 1, 8
        hs = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32), (b, h, c, w)
        ).astype(jnp.bfloat16)
        k = jnp.zeros((3, 3, c, 1), jnp.float32).at[1, 1, 0, 0].set(1.0)
        bias = jnp.zeros((1,), jnp.float32)
        vpu = mask_head_pallas(hs, k, bias, interpret=True, variant="vpu")
        mat = mask_head_pallas(hs, k, bias, interpret=True,
                               variant="matmul")
        assert vpu.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(vpu, np.float32),
                                   np.asarray(mat, np.float32),
                                   rtol=2 * 2**-8, atol=0.02)

    def test_variant_policy(self, monkeypatch):
        from rsis_tpu.ops.pallas_mask_head import _head_variant

        bench = (32, 256, 8, 512)   # decode-bench head geometry
        train = (32, 128, 8, 256)   # train-step head geometry
        monkeypatch.delenv("RSIS_HEAD_VPU", raising=False)
        assert _head_variant(bench, jnp.float32) == "matmul"  # bf16-only
        assert _head_variant((1, 10, 8, 512), jnp.bfloat16) == "matmul"
        # auto follows the measured per-geometry winners (docs/PERF.md r4)
        assert _head_variant(bench, jnp.bfloat16) == "vpu"
        assert _head_variant(train, jnp.bfloat16) == "matmul"
        monkeypatch.setenv("RSIS_HEAD_VPU", "1")
        assert _head_variant(bench, jnp.bfloat16) == "vpu"
        assert _head_variant(train, jnp.bfloat16) == "vpu"    # forced
        assert _head_variant(bench, jnp.float32) == "matmul"  # ineligible
        monkeypatch.setenv("RSIS_HEAD_VPU", "0")
        assert _head_variant(bench, jnp.bfloat16) == "matmul"
