"""Checkpoint save/load.

Mirrors the reference's five logical artifacts per model directory
(encoder/decoder weights, two optimizer states, pickled run config;
reference: src/utils/utils.py:89-111) as:

  <models_root>/<model_name>/
    state.msgpack   — params + batch_stats + both optimizer states + step
    args.json       — the run Config (takes precedence on resume, like the
                      reference args.pkl; reference: src/train.py:206-215)

With ``Config.checkpoint_format == "orbax"`` the state is stored as an
Orbax checkpoint directory instead (``orbax_state/``): sharded arrays are
written/restored with their shardings preserved, which is the multi-host /
multi-chip-ready format (flax msgpack gathers everything to one host).
Both formats are resume-compatible through the same save/load API and the
args.json precedence is identical.

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
ORBAX_DIR = "orbax_state"
ARGS_FILE = "args.json"


def model_dir(cfg: Config, name: Optional[str] = None) -> str:
    return os.path.join(cfg.models_root, name or cfg.model_name)


def _fmt(cfg: Config) -> str:
    return getattr(cfg, "checkpoint_format", "msgpack")


def save_checkpoint(cfg: Config, state: Any,
                    name: Optional[str] = None) -> str:
    d = model_dir(cfg, name)
    os.makedirs(d, exist_ok=True)
    if _fmt(cfg) == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(d, ORBAX_DIR)), state,
                   force=True)
        ckptr.wait_until_finished()
    else:
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
    the reference's DataParallel-prefix tolerance). Orbax checkpoints
    restore arrays onto the template's shardings (multi-chip safe); either
    on-disk format is accepted regardless of cfg so runs can switch
    formats across resumes."""
    d = model_dir(cfg, name)
    orbax_path = os.path.join(d, ORBAX_DIR)
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        # the template's (possibly sharded) arrays define the restore
        # shardings; shape/dtype structs work too
        state = ckptr.restore(os.path.abspath(orbax_path),
                              target=state_template)
    else:
        with open(os.path.join(d, STATE_FILE), "rb") as fp:
            payload = fp.read()
        state = serialization.from_bytes(state_template, payload)
    saved_cfg = Config.load(os.path.join(d, ARGS_FILE))
    return state, saved_cfg


def checkpoint_exists(cfg: Config, name: Optional[str] = None) -> bool:
    d = model_dir(cfg, name)
    return (os.path.exists(os.path.join(d, STATE_FILE))
            or os.path.isdir(os.path.join(d, ORBAX_DIR)))


def load_torch_reference(encoder_pt: str, decoder_pt: str, base_model: str):
    """Import reference .pt checkpoints into rsis_tpu variables."""
    import torch

    from ..models.torch_import import import_reference_checkpoint
    enc_sd = torch.load(encoder_pt, map_location="cpu")
    dec_sd = torch.load(decoder_pt, map_location="cpu")
    return import_reference_checkpoint(enc_sd, dec_sd, base_model)
