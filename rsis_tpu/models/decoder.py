"""RSIS recurrent decoder: one instance per timestep.

Re-design of the reference decoder (reference: src/modules/model.py:72-184).
One timestep is a cascade of 5 ConvLSTM cells at doubling resolution: each
cell's hidden state is bilinearly upsampled (align_corners) to the next skip
scale and fused (concat/sum/mul/none) with the matching skip feature; the
final hidden map is upsampled x2 and projected to 1-channel mask logits.
Globally max-pooled hiddens from all 5 cells concatenate into the feature
vector for the class softmax and stop heads.

The module is a *single step*; the T-step unroll lives in
:func:`rsis_tpu.models.rsis.decode_sequence` as a ``lax.scan`` with the
(h, c) pyramid as donated carry — state never leaves the chip between steps,
unlike the reference's Python loop (reference: src/train.py:85-94).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.upsample import upsample_bilinear_align_corners
from .clstm import ConvLSTMCell

Dtype = Any

# carry: tuple of 5 (h, c) pairs, coarsest cell first
Carry = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


def decoder_widths(hidden_size: int) -> Tuple[int, ...]:
    """ConvLSTM hidden widths per scale, halving as resolution doubles."""
    h = hidden_size
    return (h, h // 2, h // 4, h // 8, h // 16)


def init_carry(skips: Sequence[jnp.ndarray], hidden_size: int,
               dtype=jnp.float32) -> Carry:
    """Zero ConvLSTM state pyramid matching the skip feature geometry."""
    widths = decoder_widths(hidden_size)
    carry = []
    b = skips[0].shape[0]
    for i, w in enumerate(widths):
        hh, ww = skips[i].shape[1], skips[i].shape[2]
        z = jnp.zeros((b, hh, ww, w), dtype)
        carry.append((z, z))
    return tuple(carry)


class RSISDecoder(nn.Module):
    hidden_size: int = 128
    num_classes: int = 21
    kernel_size: int = 3
    skip_mode: str = "concat"
    dropout: float = 0.0
    dropout_stop: float = 0.0
    dropout_cls: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray], carry: Optional[Carry],
                 train: bool = False):
        """One decode step.

        Args:
          skips: 5 skip features (x5..x1 order, coarsest first).
          carry: state pyramid from the previous step, or None for zeros.
        Returns:
          ((mask_logits, class_probs, stop_logits), new_carry)
          mask_logits: (B, H1*2, W1*2, 1) at input resolution.
        """
        widths = decoder_widths(self.hidden_size)
        if carry is None:
            carry = init_carry(skips, self.hidden_size, self.dtype)

        pad = (self.kernel_size - 1) // 2
        clstm_in = skips[0]
        new_carry = []
        side_feats = []
        for i, width in enumerate(widths):
            cell = ConvLSTMCell(hidden=width, kernel_size=self.kernel_size,
                                dtype=self.dtype, name=f"clstm{i}")
            hidden, state = cell(clstm_in, carry[i])
            new_carry.append(state)
            if self.dropout > 0:
                # channelwise (2D) dropout like the reference's Dropout2d
                keep = nn.Dropout(rate=self.dropout,
                                  broadcast_dims=(1, 2),
                                  deterministic=not train,
                                  name=f"drop{i}")
                hidden = keep(hidden)
            side_feats.append(jnp.max(hidden, axis=(1, 2)))
            if i + 1 < len(widths):
                nxt = skips[i + 1]
                up = upsample_bilinear_align_corners(
                    hidden, nxt.shape[1], nxt.shape[2])
                if self.skip_mode == "concat":
                    clstm_in = jnp.concatenate([up, nxt], axis=-1)
                elif self.skip_mode == "sum":
                    clstm_in = up + nxt
                elif self.skip_mode == "mul":
                    clstm_in = up * nxt
                elif self.skip_mode == "none":
                    clstm_in = up
                else:
                    raise ValueError(
                        f"unsupported skip_mode {self.skip_mode!r}")
            else:
                clstm_in = upsample_bilinear_align_corners(
                    hidden, hidden.shape[1] * 2, hidden.shape[2] * 2)

        mask_logits = nn.Conv(1, (self.kernel_size, self.kernel_size),
                              padding=((pad, pad), (pad, pad)),
                              dtype=self.dtype, name="conv_out")(clstm_in)

        feats = jnp.concatenate(side_feats, axis=-1)
        cls_in = feats
        if self.dropout_cls > 0:
            cls_in = nn.Dropout(rate=self.dropout_cls,
                                deterministic=not train,
                                name="drop_cls")(cls_in)
        class_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                                name="fc_class")(cls_in)
        class_probs = nn.softmax(class_logits, axis=-1)

        stop_in = feats
        if self.dropout_stop > 0:
            stop_in = nn.Dropout(rate=self.dropout_stop,
                                 deterministic=not train,
                                 name="drop_stop")(stop_in)
        stop_logits = nn.Dense(1, dtype=self.dtype, name="fc_stop")(stop_in)

        return (mask_logits, class_probs, stop_logits), tuple(new_carry)
