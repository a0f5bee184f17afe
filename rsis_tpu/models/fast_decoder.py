"""Fast fused inference decode loop (Pallas ConvLSTM cells).

A functional twin of :class:`rsis_tpu.models.decoder.RSISDecoder` operating
directly on the params pytree, with every cell step going through the fused
Pallas kernel (ops/pallas_clstm.py) instead of the XLA conv — used by the
inference forward on TPU. Training and CPU keep the flax path; equivalence
is unit-tested (tests/test_fast_decoder.py).

Math per step mirrors the reference decoder exactly (reference:
src/modules/model.py:122-184): 5-cell cascade with align-corners
upsampling + skip fusion, 3x3 conv mask head, global-max-pooled side
features into the class/stop heads.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pallas_clstm import fused_convlstm_step
from ..ops.upsample import upsample_bilinear_align_corners
from .decoder import decoder_widths, init_carry


def _conv2d_same(x, kernel, bias):
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(out.dtype)


def fused_decoder_step(dec_params: dict, skips: Sequence[jnp.ndarray],
                       carry, skip_mode: str = "concat",
                       interpret: bool = False):
    """One decode step with fused cells; same returns as RSISDecoder."""
    n_cells = len(skips)
    clstm_in = skips[0]
    side_feats = []
    new_carry = []
    for i in range(n_cells):
        gates = dec_params[f"clstm{i}"]["gates"]
        h_prev, c_prev = carry[i]
        h, c = fused_convlstm_step(clstm_in, h_prev.astype(clstm_in.dtype),
                                   c_prev.astype(clstm_in.dtype),
                                   gates["kernel"], gates["bias"],
                                   interpret=interpret)
        new_carry.append((h, c))
        side_feats.append(jnp.max(h, axis=(1, 2)))
        if i + 1 < n_cells:
            nxt = skips[i + 1]
            up = upsample_bilinear_align_corners(h, nxt.shape[1],
                                                 nxt.shape[2])
            if skip_mode == "concat":
                clstm_in = jnp.concatenate([up, nxt], axis=-1)
            elif skip_mode == "sum":
                clstm_in = up + nxt
            elif skip_mode == "mul":
                clstm_in = up * nxt
            elif skip_mode == "none":
                clstm_in = up
            else:
                raise ValueError(f"unsupported skip_mode {skip_mode!r}")
        else:
            clstm_in = upsample_bilinear_align_corners(
                h, h.shape[1] * 2, h.shape[2] * 2)

    mask_logits = _conv2d_same(clstm_in, dec_params["conv_out"]["kernel"],
                               dec_params["conv_out"]["bias"])

    feats = jnp.concatenate(side_feats, axis=-1)
    fc_c = dec_params["fc_class"]
    class_logits = feats @ fc_c["kernel"].astype(feats.dtype) \
        + fc_c["bias"].astype(feats.dtype)
    class_probs = jax.nn.softmax(class_logits, axis=-1)
    fc_s = dec_params["fc_stop"]
    stop_logits = feats @ fc_s["kernel"].astype(feats.dtype) \
        + fc_s["bias"].astype(feats.dtype)
    return (mask_logits, class_probs, stop_logits), tuple(new_carry)


def decode_sequence_fused(dec_params: dict, skips, T: int,
                          hidden_size: int, skip_mode: str = "concat",
                          dtype=jnp.bfloat16, interpret: bool = False):
    """T-step scan over the fused step; same returns as decode_sequence."""
    carry0 = init_carry(skips, hidden_size, dtype)

    def step(carry, _):
        (mask, cls, stop), new_carry = fused_decoder_step(
            dec_params, skips, carry, skip_mode, interpret)
        return new_carry, (mask, cls, stop)

    _, (masks, clss, stops) = lax.scan(step, carry0, None, length=T)
    masks = jnp.moveaxis(masks, 0, 1)
    clss = jnp.moveaxis(clss, 0, 1)
    stops = jnp.moveaxis(stops, 0, 1)
    return masks, clss, stops


def fused_path_available(cfg, platform: str | None = None) -> bool:
    """The fused decode requires TPU, 3x3 gates, and no dropout at eval.

    Currently opt-in only (cfg.pallas == "on"): the Mosaic DMA path for
    non-128-aligned channel slabs does not compile on this TPU runtime yet,
    so "auto" resolves to the XLA decoder until the kernel lands.
    """
    del cfg, platform
    return False
