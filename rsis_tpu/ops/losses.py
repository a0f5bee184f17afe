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


def soft_iou_cost_matmul(y_sum: jnp.ndarray, y_cost: jnp.ndarray,
                         logits: jnp.ndarray,
                         eps: float = _EPS) -> jnp.ndarray:
    """soft_iou_cost against ALL GT masks as one batched MXU matvec.

    Algebra: with I = Σ out·y and S = Σ y (constant per GT instance),
    the union Σ(out + y - out·y) = Σout + S - I, so the whole (B, N)
    cost column needs one contraction over HW plus one small reduce —
    instead of the elementwise broadcast-multiply-reduce over the full
    (B, N, HW) tensor that soft_iou_cost runs per decode step (measured
    29 ms of the T=20 b32 train step, the convert_reduce fusions in
    docs/PERF.md's round-4 trace anatomy). The contraction rides the
    MXU and reads each operand once.

    Args:
      y_sum: (B, N) f32 per-instance pixel counts, precomputed ONCE
        outside the decode scan (they don't change across steps).
      y_cost: (B, N, HW) GT masks pre-cast to the contraction dtype
        (binary values — exact in bf16).
      logits: (B, HW) predicted mask logits for one decode step.
    Returns:
      (B, N) cost in [0, 1]; matches soft_iou_cost up to the sigmoid's
      rounding into the contraction dtype (matching-only tolerance —
      the cost tensor sits behind stop_gradient).
    """
    out = jnn.sigmoid(logits.astype(jnp.float32))
    inter = jnp.einsum("bh,bnh->bn", out.astype(y_cost.dtype), y_cost,
                       preferred_element_type=jnp.float32)
    den = jnp.sum(out, axis=-1)[:, None] + y_sum - inter + eps
    return 1.0 - inter / den


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
