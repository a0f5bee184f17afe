"""Training objectives as pure jnp functions.

Semantics match the reference losses (reference: src/utils/hungarian.py:10-89
and src/utils/objectives.py:6-33) but are expressed as weighted means instead
of ``masked_select`` so every loss keeps a static shape and stays inside one
jitted XLA program. ``mean(masked_select(x, sw))`` equals
``sum(x * sw) / sum(sw)`` exactly, so the loss values are identical.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

_EPS = 1e-6


def soft_iou_cost(target: jnp.ndarray, logits: jnp.ndarray,
                  eps: float = _EPS) -> jnp.ndarray:
    """1 - soft IoU between a binary target mask and predicted mask logits.

    Args:
      target: (..., N) binary ground-truth masks.
      logits: (..., N) predicted mask logits (sigmoid applied here).
    Returns:
      (...,) cost in [0, 1].
    """
    # upcast before the long-axis sums: callers may pass bf16 logits (the
    # train scan stacks masks in compute dtype — f32 stacking doubled the
    # scan-output HBM traffic for data that only ever had bf16 precision);
    # XLA fuses the convert into the reduce, nothing materializes
    out = jnn.sigmoid(logits.astype(jnp.float32))
    num = jnp.sum(out * target, axis=-1)
    den = jnp.sum(out + target - out * target, axis=-1) + eps
    return 1.0 - num / den


def masked_nll(target_idx: jnp.ndarray, probs: jnp.ndarray,
               balance_weights: jnp.ndarray | None = None,
               eps: float = 1e-12) -> jnp.ndarray:
    """Negative log-likelihood of the target class given softmax probs.

    Args:
      target_idx: (...,) integer class indices.
      probs: (..., C) softmax probabilities.
    Returns:
      (...,) per-element NLL.
    """
    logp = jnp.log(probs + eps)
    if balance_weights is not None:
        logp = logp * balance_weights
    return -jnp.take_along_axis(logp, target_idx[..., None], axis=-1)[..., 0]


def balanced_bce(target: jnp.ndarray, logits: jnp.ndarray,
                 balance_weight: jnp.ndarray | float | None = None
                 ) -> jnp.ndarray:
    """Numerically stable class-balanced binary cross-entropy on logits.

    Positive-pixel terms are weighted (1 - bw), negative terms bw; when bw is
    None it is the positive fraction of the whole target tensor.
    """
    if balance_weight is None:
        num_pos = jnp.sum(target)
        total = jnp.asarray(target.size, target.dtype)
        balance_weight = num_pos / total
    max_val = jnp.clip(-logits, min=0.0)
    raw = (logits - logits * target + max_val
           + jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val)))
    pos = raw * target
    neg = raw * (1.0 - target)
    return (1.0 - balance_weight) * pos + balance_weight * neg


def _weighted_mean(values: jnp.ndarray, sw: jnp.ndarray,
                   eps: float = 1e-12) -> jnp.ndarray:
    sw = sw.astype(values.dtype)
    return jnp.sum(values * sw) / (jnp.sum(sw) + eps)


def soft_iou_loss(y_true: jnp.ndarray, y_logits: jnp.ndarray,
                  sw: jnp.ndarray) -> jnp.ndarray:
    """Mean soft-IoU cost over positions where sw == 1."""
    costs = soft_iou_cost(y_true, y_logits)
    return _weighted_mean(costs, sw.reshape(costs.shape))


def masked_nll_loss(y_true_idx: jnp.ndarray, y_probs: jnp.ndarray,
                    sw: jnp.ndarray,
                    balance_weights: jnp.ndarray | None = None
                    ) -> jnp.ndarray:
    """Mean class NLL over positions where sw == 1."""
    costs = masked_nll(y_true_idx, y_probs, balance_weights)
    return _weighted_mean(costs, sw.reshape(costs.shape))


def masked_bce_loss(y_true: jnp.ndarray, y_logits: jnp.ndarray,
                    sw: jnp.ndarray,
                    balance_weight: jnp.ndarray | float | None = None
                    ) -> jnp.ndarray:
    """Mean balanced BCE over positions where sw == 1."""
    costs = balanced_bce(y_true, y_logits, balance_weight)
    return _weighted_mean(costs, sw.reshape(costs.shape))
