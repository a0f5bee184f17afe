"""Optimized inference decode loop (pure XLA, exact math).

A functional twin of :class:`rsis_tpu.models.decoder.RSISDecoder` operating
directly on the params pytree, restructured around the linearity of the
gate convolution (math per step mirrors the reference decoder exactly,
reference: src/modules/model.py:122-184):

1. **Hoisted skip convs.** The skip features are constant across the T-step
   scan, so the gate conv is split channel-wise into
   ``conv(concat(up, skip, h_prev)) = conv_x(up) + conv_s(skip) +
   conv_h(h_prev)`` and the ``conv_s(skip) + bias`` term is computed ONCE
   before the scan (for cell 0 the whole input is the skip, leaving only
   ``conv_h`` per step). Works for concat/sum/none skip fusion; ``mul`` is
   not channel-separable and falls back to the flax step.
2. **Fused mask head.** The final 2x-upsample + 3x3 conv-to-1-channel runs
   as dense MXU matmuls (ops/mask_head.py) instead of a 1-output-channel
   conv at full resolution.
3. Optionally, the per-step cell update can go through the fused Pallas
   kernel (ops/pallas_clstm.py) where it compiles.

Equivalence vs the flax decoder is unit-tested (tests/test_fast_decoder.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..models.clstm import lstm_state_update
from ..ops.mask_head import mask_head_fused
from ..ops.upsample import upsample_bilinear_align_corners
from .decoder import decoder_widths, init_carry


def _conv2d(x, kernel, bias=None):
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _hoist_cells(dec_params: dict, skips: Sequence[jnp.ndarray],
                 hidden_size: int, skip_mode: str):
    """Split every gate kernel into (kx, kh) and precompute the per-cell
    scan-constant term S = conv_s(skip) + bias."""
    widths = decoder_widths(hidden_size)
    cells = []
    for i in range(len(widths)):
        gates = dec_params[f"clstm{i}"]["gates"]
        kernel, bias = gates["kernel"], gates["bias"]
        if i == 0:
            cs = skips[0].shape[-1]
            ks, kh = kernel[:, :, :cs], kernel[:, :, cs:]
            s_term = _conv2d(skips[0], ks, bias)
            kx = None
        else:
            cp = widths[i - 1]
            if skip_mode == "concat":
                cs = skips[i].shape[-1]
                kx = kernel[:, :, :cp]
                ks = kernel[:, :, cp:cp + cs]
                kh = kernel[:, :, cp + cs:]
                s_term = _conv2d(skips[i], ks, bias)
            elif skip_mode == "sum":
                kx = kernel[:, :, :cp]
                kh = kernel[:, :, cp:]
                s_term = _conv2d(skips[i], kx, bias)
            elif skip_mode == "none":
                kx = kernel[:, :, :cp]
                kh = kernel[:, :, cp:]
                s_term = bias.astype(skips[i].dtype)
            else:
                raise ValueError(
                    f"skip_mode {skip_mode!r} is not channel-separable")
        cells.append({"kx": kx, "kh": kh, "s": s_term})
    return cells


def fast_decoder_step(dec_params: dict, cells, skips, carry):
    """One decode step with hoisted skip convs; same returns as RSISDecoder."""
    n = len(cells)
    side_feats = []
    new_carry = []
    up_h = None
    h = None
    for i in range(n):
        h_prev, c_prev = carry[i]
        gates = cells[i]["s"] + _conv2d(h_prev, cells[i]["kh"])
        if i > 0:
            gates = gates + _conv2d(up_h, cells[i]["kx"])
        h, c = lstm_state_update(gates, c_prev)
        new_carry.append((h, c))
        side_feats.append(jnp.max(h, axis=(1, 2)))
        if i + 1 < n:
            nxt = skips[i + 1]
            up_h = upsample_bilinear_align_corners(h, nxt.shape[1],
                                                   nxt.shape[2])

    mask_logits = mask_head_fused(h, dec_params["conv_out"]["kernel"],
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
    """T-step scan over the fast step; same returns as decode_sequence."""
    del interpret
    cells = _hoist_cells(dec_params, skips, hidden_size, skip_mode)
    carry0 = init_carry(skips, hidden_size, dtype)

    def step(carry, _):
        (mask, cls, stop), new_carry = fast_decoder_step(
            dec_params, cells, skips, carry)
        return new_carry, (mask, cls, stop)

    _, (masks, clss, stops) = lax.scan(step, carry0, None, length=T)
    masks = jnp.moveaxis(masks, 0, 1)
    clss = jnp.moveaxis(clss, 0, 1)
    stops = jnp.moveaxis(stops, 0, 1)
    return masks, clss, stops


def fused_path_available(cfg, platform: str | None = None) -> bool:
    """The fast decode needs channel-separable skip fusion; it is exact
    (same math, fp32 accumulation) on any platform, and pays off on TPU."""
    platform = platform or jax.default_backend()
    return platform == "tpu" and cfg.skip_mode in ("concat", "sum", "none")
