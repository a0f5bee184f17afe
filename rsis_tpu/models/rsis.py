"""Model assembly and the scanned decode loop.

Functional glue over the encoder and decoder modules: parameters are
explicit pytrees (``{"encoder": ..., "decoder": ...}``, mirroring the
reference's two checkpoint artifacts, reference: src/utils/utils.py:89-111),
and the T-step recurrent decode is a single ``lax.scan`` whose carry (the
ConvLSTM state pyramid) lives on-chip for the whole sequence — the TPU
analogue of the reference's Python timestep loop
(reference: src/train.py:85-94, src/test.py:37-44).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops.upsample import upsample_bilinear_align_corners
from .decoder import RSISDecoder, init_carry
from .encoder import FeatureExtractor


def compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def build_models(cfg: Config) -> Tuple[FeatureExtractor, RSISDecoder]:
    dtype = compute_dtype(cfg)
    encoder = FeatureExtractor(base_model=cfg.base_model,
                               hidden_size=cfg.hidden_size,
                               kernel_size=cfg.kernel_size, dtype=dtype)
    decoder = RSISDecoder(hidden_size=cfg.hidden_size,
                          num_classes=cfg.num_classes,
                          kernel_size=cfg.kernel_size,
                          skip_mode=cfg.skip_mode,
                          dropout=cfg.dropout,
                          dropout_stop=cfg.dropout_stop,
                          dropout_cls=cfg.dropout_cls, dtype=dtype)
    return encoder, decoder


def init_variables(cfg: Config, rng: jax.Array,
                   input_hw: Tuple[int, int] | None = None
                   ) -> Dict[str, Any]:
    """Initialize all model variables for a given input geometry.

    Returns {"params": {"encoder", "decoder"}, "batch_stats": {"encoder"}}.
    """
    encoder, decoder = build_models(cfg)
    h, w = input_hw if input_hw is not None else (cfg.imsize, cfg.imsize)
    x = jnp.zeros((1, h, w, 3), compute_dtype(cfg))
    enc_rng, dec_rng = jax.random.split(rng)
    enc_vars = encoder.init(enc_rng, x, train=False)
    skips = encoder.apply(enc_vars, x, train=False)
    dec_vars = decoder.init(dec_rng, skips, None, train=False)
    return {
        "params": {"encoder": enc_vars["params"],
                   "decoder": dec_vars["params"]},
        "batch_stats": {"encoder": enc_vars.get("batch_stats", {})},
    }


def decode_sequence(decoder: RSISDecoder, dec_params, skips, T: int,
                    train: bool = False, dropout_rng=None,
                    carry=None):
    """Unroll the decoder T steps with lax.scan.

    Returns (masks, class_probs, stop_logits, final_carry) where
    masks: (B, T, H, W, 1); class_probs: (B, T, C); stop_logits: (B, T, 1).
    """
    if carry is None:
        carry = init_carry(skips, decoder.hidden_size, decoder.dtype)

    needs_rng = train and (decoder.dropout > 0 or decoder.dropout_stop > 0
                           or decoder.dropout_cls > 0)

    def step(carry_t, t):
        rngs = None
        if needs_rng:
            rngs = {"dropout": jax.random.fold_in(dropout_rng, t)}
        (mask, cls, stop), new_carry = decoder.apply(
            {"params": dec_params}, skips, carry_t, train=train, rngs=rngs)
        return new_carry, (mask, cls, stop)

    final_carry, (masks, clss, stops) = lax.scan(
        step, carry, jnp.arange(T), length=T)
    # scan stacks on axis 0 (time): (T, B, ...) -> (B, T, ...)
    masks = jnp.moveaxis(masks, 0, 1)
    clss = jnp.moveaxis(clss, 0, 1)
    stops = jnp.moveaxis(stops, 0, 1)
    return masks, clss, stops, final_carry


def forward(cfg: Config, variables, x: jnp.ndarray, T: int | None = None):
    """Shared inference forward (reference: src/test.py:16-50).

    Runs the encoder once, scans the decoder exactly T steps (no early
    stop), upsamples each mask to the input size, and returns
    (sigmoid masks (B,T,H,W), class_probs (B,T,C), sigmoid stops (B,T,1)).
    """
    encoder, decoder = build_models(cfg)
    T = T if T is not None else cfg.maxseqlen
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables.get("batch_stats", {}).get(
                    "encoder", {})}
    skips = encoder.apply(enc_vars, x, train=False)

    from .fast_decoder import decode_sequence_fused, fused_path_available
    from .rowmajor_decoder import (decode_sequence_rowmajor,
                                   rowmajor_path_available)
    want_fast = cfg.pallas in ("on", "auto")
    if want_fast and rowmajor_path_available(cfg, skips):
        # fused Pallas cell kernels in the compact (B, H, C, W) layout —
        # the fastest TPU decode (~10x the XLA cell composition per step)
        masks, clss, stops = decode_sequence_rowmajor(
            variables["params"]["decoder"], skips, T, cfg.hidden_size,
            cfg.skip_mode, dtype=compute_dtype(cfg))
    elif want_fast and (fused_path_available(cfg)
                        or (cfg.pallas == "on"
                            and cfg.skip_mode in ("concat", "sum",
                                                  "none"))):
        # pallas="on" forces the hoisted fast path even off-TPU (exact
        # math on any platform; the Pallas kernels themselves need TPU)
        masks, clss, stops = decode_sequence_fused(
            variables["params"]["decoder"], skips, T, cfg.hidden_size,
            cfg.skip_mode, dtype=compute_dtype(cfg))
    else:
        masks, clss, stops, _ = decode_sequence(
            decoder, variables["params"]["decoder"], skips, T, train=False)
    h, w = x.shape[1], x.shape[2]
    if masks.ndim == 5:
        masks = masks[..., 0]  # legacy (B, T, H', W', 1) paths
    if masks.shape[-2:] != (h, w):
        masks = upsample_bilinear_align_corners(masks[..., None],
                                                h, w)[..., 0]
    return jax.nn.sigmoid(masks), clss, jax.nn.sigmoid(stops)
