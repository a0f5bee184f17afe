"""Fused Pallas ConvLSTM step must match the flax/XLA cell exactly.

Runs in interpreter mode on CPU (the compiled path is exercised on real TPU
by the benchmark); the math is identical either way.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsis_tpu.models.clstm import ConvLSTMCell
from rsis_tpu.ops.pallas_clstm import fused_convlstm_step


@pytest.mark.parametrize("shape", [
    (2, 8, 16, 12, 8),    # B, H, W, Cx, C
    (1, 16, 32, 24, 16),
    (2, 4, 8, 4, 4),
])
def test_matches_flax_cell(shape):
    b, h, w, cx, ch = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cx)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(b, h, w, ch)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(b, h, w, ch)).astype(np.float32))

    cell = ConvLSTMCell(hidden=ch, kernel_size=3)
    variables = cell.init(jax.random.PRNGKey(0), x, (h0, c0))
    kernel = variables["params"]["gates"]["kernel"]
    bias = variables["params"]["gates"]["bias"]

    h_want, (_, c_want) = cell.apply(variables, x, (h0, c0))
    h_got, c_got = fused_convlstm_step(x, h0, c0, kernel, bias,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_want),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_want),
                               atol=2e-5)


def test_multi_step_recurrence():
    b, h, w, cx, ch = 1, 8, 8, 6, 4
    rng = np.random.default_rng(1)
    cell = ConvLSTMCell(hidden=ch, kernel_size=3)
    x = jnp.asarray(rng.normal(size=(b, h, w, cx)).astype(np.float32))
    variables = cell.init(jax.random.PRNGKey(1), x, None)
    kernel = variables["params"]["gates"]["kernel"]
    bias = variables["params"]["gates"]["bias"]

    state_f = None
    hp = jnp.zeros((b, h, w, ch))
    cp = jnp.zeros((b, h, w, ch))
    for _ in range(3):
        h_want, state_f = cell.apply(variables, x, state_f)
        hp, cp = fused_convlstm_step(x, hp, cp, kernel, bias,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h_want),
                                   atol=3e-5)
