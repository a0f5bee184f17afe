"""Pure-JAX ops: losses, soft-IoU cost matrices, Hungarian matching."""

from .losses import (  # noqa: F401
    soft_iou_cost,
    masked_nll,
    balanced_bce,
    soft_iou_loss,
    masked_nll_loss,
    masked_bce_loss,
)
from .matching import hungarian, match_gt_to_predictions  # noqa: F401
from .upsample import upsample_bilinear_align_corners  # noqa: F401
