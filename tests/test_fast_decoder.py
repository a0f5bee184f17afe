"""Fused decode loop must match the flax decoder step-for-step."""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.models.decoder import RSISDecoder, init_carry
from rsis_tpu.models.fast_decoder import (
    decode_sequence_fused, fused_decoder_step)
from rsis_tpu.models.rsis import decode_sequence


def make_setup(skip_mode="concat", hidden=16, b=2):
    rng = np.random.default_rng(0)
    geoms = [(hidden, 2, 4), (hidden, 4, 8), (hidden // 2, 8, 16),
             (hidden // 4, 16, 32), (hidden // 8, 32, 64)]
    skips = [jnp.asarray(rng.normal(size=(b, hh, ww, c)).astype(np.float32))
             for (c, hh, ww) in geoms]
    dec = RSISDecoder(hidden_size=hidden, num_classes=4,
                      skip_mode=skip_mode)
    variables = dec.init(jax.random.PRNGKey(0), skips, None, train=False)
    return dec, variables["params"], skips


class TestFusedDecoder:
    def test_single_step_matches(self):
        dec, params, skips = make_setup()
        (m_w, c_w, s_w), carry_w = dec.apply({"params": params}, skips,
                                             None, train=False)
        carry0 = init_carry(skips, dec.hidden_size, jnp.float32)
        (m_g, c_g, s_g), carry_g = fused_decoder_step(
            params, skips, carry0, "concat", interpret=True)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=3e-5)

    def test_scan_matches_over_T(self):
        dec, params, skips = make_setup()
        T = 3
        m_w, c_w, s_w, _ = decode_sequence(dec, params, skips, T,
                                           train=False)
        m_g, c_g, s_g = decode_sequence_fused(
            params, skips, T, dec.hidden_size, "concat",
            dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w),
                                   atol=1e-4)

    def test_sum_skip_mode(self):
        dec, params, skips = make_setup(skip_mode="sum")
        (m_w, c_w, s_w), _ = dec.apply({"params": params}, skips, None,
                                       train=False)
        carry0 = init_carry(skips, dec.hidden_size, jnp.float32)
        (m_g, c_g, s_g), _ = fused_decoder_step(params, skips, carry0,
                                                "sum", interpret=True)
        np.testing.assert_allclose(np.asarray(m_g), np.asarray(m_w),
                                   atol=3e-5)
