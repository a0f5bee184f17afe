"""The Pallas row-major decode loop must match the flax decoder
step-for-step (interpret mode on CPU; hardware path exercised by bench)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsis_tpu.models.decoder import init_carry
from rsis_tpu.models.rowmajor_decoder import (
    _hoist_cells_rowmajor, _to_rowmajor, _upsample_rowmajor,
    decode_sequence_rowmajor, rowmajor_decoder_step)
from rsis_tpu.models.rsis import decode_sequence
from rsis_tpu.ops.upsample import upsample_bilinear_align_corners
from tests.test_fast_decoder import make_setup as _make_setup


def make_setup(skip_mode="concat"):
    # half-spatial pyramid: interpret mode executes the unrolled kernels
    # per grid point, so the finest 32x64 cell dominated suite time
    return _make_setup(skip_mode=skip_mode, b=1, scale=2)


class TestRowmajorUpsample:
    def test_matches_nhwc_upsample(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 16, 4)).astype(np.float32))
        want = upsample_bilinear_align_corners(x, 16, 32)
        got = _upsample_rowmajor(_to_rowmajor(x), 16, 32)
        np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, 2, -1)),
                                   np.asarray(want), atol=1e-6)


class TestRowmajorDecoder:
    @pytest.mark.parametrize("skip_mode", ["concat", "sum", "none"])
    def test_single_step_matches(self, skip_mode):
        dec, params, skips = make_setup(skip_mode=skip_mode)
        (m_w, c_w, s_w), carry_w = dec.apply({"params": params}, skips,
                                             None, train=False)
        cells = _hoist_cells_rowmajor(params, skips, dec.hidden_size,
                                      skip_mode)
        carry_nhwc = init_carry(skips, dec.hidden_size, jnp.float32)
        carry0 = tuple((_to_rowmajor(h), _to_rowmajor(c))
                       for h, c in carry_nhwc)
        (h_g, c_g, s_g), carry_g = rowmajor_decoder_step(
            params, cells, carry0, interpret=True)
        # the step defers the mask head; apply it to the returned state
        from rsis_tpu.ops.mask_head import mask_head_rowmajor
        m_g = mask_head_rowmajor(h_g, params["conv_out"]["kernel"],
                                 params["conv_out"]["bias"])
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=3e-5)
        for (hg, cg), (hw_, cw_) in zip(carry_g, carry_w):
            np.testing.assert_allclose(
                np.asarray(jnp.moveaxis(hg, 2, -1)), np.asarray(hw_),
                atol=3e-5)
            np.testing.assert_allclose(
                np.asarray(jnp.moveaxis(cg, 2, -1)), np.asarray(cw_),
                atol=3e-5)

    def test_scan_matches_over_T(self):
        dec, params, skips = make_setup()
        T = 3
        m_w, c_w, s_w, _ = decode_sequence(dec, params, skips, T,
                                           train=False)
        m_g, c_g, s_g = decode_sequence_rowmajor(
            params, skips, T, dec.hidden_size, "concat",
            dtype=jnp.float32, interpret=True)
        # rowmajor emits squeezed (B, T, H, W) masks (scan-stacking layout)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w[..., 0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=1e-4)


class TestHoistRmconv:
    @pytest.mark.parametrize("skip_mode", ["concat", "sum", "none"])
    def test_rowmajor_out_conv_matches_moveaxis(self, skip_mode,
                                                monkeypatch):
        """RSIS_HOIST_RMCONV=1 (S terms via the row-major-out conv) must
        produce the exact cells the default NHWC-conv + moveaxis path
        does — the switch only relocates a transpose (docs/PERF.md
        round-5 copy anatomy; step-level wash on silicon)."""
        dec, params, skips = make_setup(skip_mode=skip_mode)
        monkeypatch.delenv("RSIS_HOIST_RMCONV", raising=False)
        base = _hoist_cells_rowmajor(params, skips, dec.hidden_size,
                                     skip_mode)
        monkeypatch.setenv("RSIS_HOIST_RMCONV", "1")
        rm = _hoist_cells_rowmajor(params, skips, dec.hidden_size,
                                   skip_mode)
        assert len(base) == len(rm)
        for cb, cr in zip(base, rm):
            assert cb["cx"] == cr["cx"] and cb["ch"] == cr["ch"]
            np.testing.assert_allclose(np.asarray(cr["s"]),
                                       np.asarray(cb["s"]), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(cr["wt"]),
                                          np.asarray(cb["wt"]))
