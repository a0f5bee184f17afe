"""Convolutional LSTM cell (flax, NHWC).

Re-design of the reference cell (reference: src/modules/clstm.py:7-62): one
convolution over concat(input, h_prev) producing 4*hidden channels, split
into input/forget/output/cell gates. The gate conv + nonlinearities + state
update are elementwise after the conv, so XLA fuses the whole update into the
conv epilogue on TPU; an optional hand-fused Pallas kernel for the gate
pointwise math lives in rsis_tpu/ops/pallas_clstm.py.

State is carried explicitly as a (h, c) tuple so the T-step decode loop can
be a ``lax.scan`` with donated carry instead of Python-side state threading.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def lstm_state_update(gates: jnp.ndarray, c_prev: jnp.ndarray):
    """Pointwise ConvLSTM update given stacked gate pre-activations.

    gates: (..., 4*C) laid out [input, forget, output, cell] like the
    reference chunk order (reference: src/modules/clstm.py:47-59).
    """
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = nn.sigmoid(i)
    f = nn.sigmoid(f)
    o = nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return h, c


class ConvLSTMCell(nn.Module):
    hidden: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state):
        """One step. x: (B, H, W, Cin); state: (h, c) each (B, H, W, hidden).

        Pass ``state=None`` to start from zeros (first timestep).
        """
        if state is None:
            shape = x.shape[:-1] + (self.hidden,)
            state = (jnp.zeros(shape, self.dtype),
                     jnp.zeros(shape, self.dtype))
        h_prev, c_prev = state
        pad = (self.kernel_size - 1) // 2
        z = jnp.concatenate([x, h_prev.astype(x.dtype)], axis=-1)
        gates = nn.Conv(4 * self.hidden,
                        (self.kernel_size, self.kernel_size),
                        padding=((pad, pad), (pad, pad)),
                        dtype=self.dtype, name="gates")(z)
        h, c = lstm_state_update(gates, c_prev.astype(gates.dtype))
        return h, (h, c)

    @staticmethod
    def zero_state(batch: int, height: int, width: int, hidden: int,
                   dtype=jnp.float32):
        z = jnp.zeros((batch, height, width, hidden), dtype)
        return (z, z)
