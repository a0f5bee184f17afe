"""Per-subnet optimizers.

The reference trains two optimizers: ``dec_opt`` over the decoder plus the
encoder's skip projections/batchnorms, and ``enc_opt`` over the backbone,
each with its own lr / weight decay / algorithm (reference:
src/train.py:236-240, src/utils/utils.py:34-87). torch's ``weight_decay``
adds L2 to the gradient *before* the adaptive moments, so the optax chain is
add_decayed_weights -> scale_by_<algo> -> scale(-lr).
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == "adam":
        parts.append(optax.scale_by_adam())
    elif name == "sgd":
        if momentum:
            parts.append(optax.trace(decay=momentum))
    elif name == "rmsprop":
        parts.append(optax.scale_by_rms())
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def split_params(params: dict):
    """Split the variables into the two reference optimizer groups.

    encoder group: params['encoder']['base'] (the backbone);
    decoder group: params['decoder'] + encoder skip convs/bns.
    """
    enc = {"encoder": {"base": params["encoder"]["base"]}}
    dec = {"encoder": {k: v for k, v in params["encoder"].items()
                       if k != "base"},
           "decoder": params["decoder"]}
    return enc, dec


def merge_params(enc: dict, dec: dict) -> dict:
    encoder = dict(dec["encoder"])
    encoder["base"] = enc["encoder"]["base"]
    return {"encoder": encoder, "decoder": dec["decoder"]}
