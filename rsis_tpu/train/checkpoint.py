"""Checkpoint save/load.

Mirrors the reference's five logical artifacts per model directory
(encoder/decoder weights, two optimizer states, pickled run config;
reference: src/utils/utils.py:89-111) as:

  <models_root>/<model_name>/
    state.msgpack   — params + batch_stats + both optimizer states + step
    args.json       — the run Config (takes precedence on resume, like the
                      reference args.pkl; reference: src/train.py:206-215)

Weights exported from the torch reference (encoder.pt/decoder.pt) can be
imported with :mod:`rsis_tpu.models.torch_import` and saved in this format
via :func:`save_imported`.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
from flax import serialization

from ..config import Config

STATE_FILE = "state.msgpack"
ARGS_FILE = "args.json"


def model_dir(cfg: Config, name: Optional[str] = None) -> str:
    return os.path.join(cfg.models_root, name or cfg.model_name)


def save_checkpoint(cfg: Config, state: Any,
                    name: Optional[str] = None) -> str:
    d = model_dir(cfg, name)
    os.makedirs(d, exist_ok=True)
    host_state = jax.device_get(state)
    payload = serialization.to_bytes(host_state)
    tmp = os.path.join(d, STATE_FILE + ".tmp")
    with open(tmp, "wb") as fp:
        fp.write(payload)
    os.replace(tmp, os.path.join(d, STATE_FILE))
    cfg.save(os.path.join(d, ARGS_FILE))
    return d


def load_checkpoint(cfg: Config, state_template: Any,
                    name: Optional[str] = None) -> Tuple[Any, Config]:
    """Restore (state, saved_config); the template provides the pytree
    structure (and works across single-device/mesh runs, the analogue of
    the reference's DataParallel-prefix tolerance)."""
    d = model_dir(cfg, name)
    with open(os.path.join(d, STATE_FILE), "rb") as fp:
        payload = fp.read()
    state = serialization.from_bytes(state_template, payload)
    saved_cfg = Config.load(os.path.join(d, ARGS_FILE))
    return state, saved_cfg


def checkpoint_exists(cfg: Config, name: Optional[str] = None) -> bool:
    return os.path.exists(os.path.join(model_dir(cfg, name), STATE_FILE))


def load_torch_reference(encoder_pt: str, decoder_pt: str, base_model: str):
    """Import reference .pt checkpoints into rsis_tpu variables."""
    import torch

    from ..models.torch_import import import_reference_checkpoint
    enc_sd = torch.load(encoder_pt, map_location="cpu")
    dec_sd = torch.load(decoder_pt, map_location="cpu")
    return import_reference_checkpoint(enc_sd, dec_sd, base_model)
