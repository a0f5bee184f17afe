"""Feature extractor: backbone taps projected into the skip pyramid.

Re-design of the reference FeatureExtractor (reference:
src/modules/model.py:15-70): the backbone's five scales go through per-scale
convs + BatchNorm into channel widths [h, h, h/2, h/4, h/8]. NHWC layout; the
five projected maps feed the recurrent decoder every timestep.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .backbones import BACKBONES, SKIP_DIMS

Dtype = Any


class FeatureExtractor(nn.Module):
    base_model: str = "resnet101"
    hidden_size: int = 128
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "skip"):
        """x: (B, H, W, 3) normalized image.

        mode: "skip" -> 5 projected skip features (x5..x1 order);
              "raw"  -> raw backbone taps; "semseg" -> coarsest raw tap.
        """
        base = BACKBONES[self.base_model](dtype=self.dtype, name="base")
        taps = base(x, train=train)
        if mode == "semseg":
            return taps[0]
        if mode == "raw":
            return taps

        h = self.hidden_size
        widths = (h, h, h // 2, h // 4, h // 8)
        pad = (self.kernel_size - 1) // 2
        outs = []
        for i, (tap, width) in enumerate(zip(taps, widths)):
            y = nn.Conv(width, (self.kernel_size, self.kernel_size),
                        padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                        name=f"sk{5 - i}")(tap)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{5 - i}")(y)
            outs.append(y)
        return tuple(outs)

    @property
    def skip_dims_in(self):
        return SKIP_DIMS[self.base_model]
