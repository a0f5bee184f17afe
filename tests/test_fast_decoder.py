"""Fast decode loop (hoisted skip convs + fused mask head) must match the
flax decoder step-for-step; fused mask head must match conv(upsample(h))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from rsis_tpu.models.decoder import RSISDecoder, init_carry
from rsis_tpu.models.fast_decoder import (
    _hoist_cells, decode_sequence_fused, fast_decoder_step)
from rsis_tpu.models.rsis import decode_sequence
from rsis_tpu.ops.mask_head import mask_head_fused
from rsis_tpu.ops.upsample import upsample_bilinear_align_corners


def make_setup(skip_mode="concat", hidden=16, b=2, seed=0, scale=1):
    rng = np.random.default_rng(seed)
    geoms = [(hidden, 2, 4), (hidden, 4, 8), (hidden // 2, 8, 16),
             (hidden // 4, 16, 32), (hidden // 8, 32, 64)]
    if scale > 1:  # shrink the fine cells for interpret-mode tests
        geoms = [(c, max(hh // scale, 2), max(ww // scale, 4))
                 for (c, hh, ww) in geoms]
    skips = [jnp.asarray(rng.normal(size=(b, hh, ww, c)).astype(np.float32))
             for (c, hh, ww) in geoms]
    dec = RSISDecoder(hidden_size=hidden, num_classes=4,
                      skip_mode=skip_mode)
    variables = dec.init(jax.random.PRNGKey(seed), skips, None, train=False)
    return dec, variables["params"], skips


class TestMaskHead:
    @pytest.mark.parametrize("shape", [(2, 8, 16, 8), (1, 16, 32, 4)])
    def test_matches_conv_after_upsample(self, shape):
        b, h, w, c = shape
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        conv = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))
        up = upsample_bilinear_align_corners(x, 2 * h, 2 * w)
        variables = conv.init(jax.random.PRNGKey(0), up)
        want = conv.apply(variables, up)
        got = mask_head_fused(x, variables["params"]["kernel"],
                              variables["params"]["bias"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


class TestFastDecoder:
    @pytest.mark.parametrize("skip_mode", ["concat", "sum", "none"])
    def test_single_step_matches(self, skip_mode):
        dec, params, skips = make_setup(skip_mode=skip_mode)
        (m_w, c_w, s_w), carry_w = dec.apply({"params": params}, skips,
                                             None, train=False)
        cells = _hoist_cells(params, skips, dec.hidden_size, skip_mode)
        carry0 = init_carry(skips, dec.hidden_size, jnp.float32)
        (m_g, c_g, s_g), carry_g = fast_decoder_step(params, cells, skips,
                                                     carry0)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=3e-5)
        for (hg, cg), (hw_, cw_) in zip(carry_g, carry_w):
            np.testing.assert_allclose(np.asarray(hg), np.asarray(hw_),
                                       atol=3e-5)

    def test_scan_matches_over_T(self):
        dec, params, skips = make_setup()
        T = 3
        m_w, c_w, s_w, _ = decode_sequence(dec, params, skips, T,
                                           train=False)
        m_g, c_g, s_g = decode_sequence_fused(
            params, skips, T, dec.hidden_size, "concat", dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=1e-4)
