"""Jitted batch inference forward for evaluation.

The shared ``test()`` forward of the reference (reference: src/test.py:16-50)
as one compiled XLA program: encoder once, decoder scanned exactly T steps
(no early stop), masks upsampled to input size, sigmoid/softmax applied.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..config import Config
from ..models.rsis import forward


def make_forward(cfg: Config, T: int | None = None):
    """Returns fn(variables, x_nhwc) -> (masks, class_probs, stop_scores)."""
    T = T or cfg.maxseqlen

    @jax.jit
    def fwd(variables, x):
        return forward(cfg, variables, x, T=T)

    return fwd


def run_forward(cfg: Config, variables, images: np.ndarray,
                T: int | None = None):
    """Convenience single-shot forward on a numpy batch."""
    fwd = make_forward(cfg, T)
    masks, clss, stops = fwd(variables, images)
    return (np.asarray(masks), np.asarray(clss), np.asarray(stops))
