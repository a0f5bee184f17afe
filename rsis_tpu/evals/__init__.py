"""Evaluation layer: inference forward, COCO eval, exporters, CVPPP metrics."""

from .cityscapes_ap import evaluate_exported, evaluate_images  # noqa: F401
from .coco import COCO  # noqa: F401
from .cocoeval import COCOeval  # noqa: F401
from .cvppp import (  # noqa: F401
    abs_diff_fg_labels,
    best_dice,
    dice_score,
    evaluate_batch,
    symmetric_best_dice,
)
from .cvppp_harness import lsc_evaluation  # noqa: F401
from .evaluator import Evaluator, create_coco_object, resize_mask  # noqa: F401
from .exporters import CityscapesExporter, LeavesExporter  # noqa: F401
from .forward import make_forward, run_forward  # noqa: F401
from .streaming import make_streaming_forward, spatial_mesh  # noqa: F401
