"""Training monitor: structured metrics + mask snapshots.

The reference streams batch losses and predicted/GT mask heatmaps to a live
visdom server (reference: src/train.py:294-297,366-395,
src/utils/utils.py:139-215). Here the same signals are persisted without a
server dependency:

- ``metrics.jsonl`` — one JSON object per logged step (split, epoch, batch,
  the four losses, wall time), machine-readable for dashboards;
- optional mask snapshot grids (predicted vs matched GT per timestep)
  rendered to PNG with matplotlib, the visdom-heatmap analogue.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class Monitor:
    def __init__(self, model_dir: str, enable_snapshots: bool = False):
        self.model_dir = model_dir
        self.enable_snapshots = enable_snapshots
        os.makedirs(model_dir, exist_ok=True)
        self._fp = open(os.path.join(model_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log(self, split: str, epoch: int, batch: int, total: float,
            iou: float, stop: float, cls: float, **extra) -> None:
        rec = {"t": round(time.time() - self._t0, 3), "split": split,
               "epoch": epoch, "batch": batch,
               "total": float(total), "iou": float(iou),
               "stop": float(stop), "class": float(cls)}
        rec.update(extra)
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()

    def snapshot(self, epoch: int, pred_masks: np.ndarray,
                 true_masks: np.ndarray,
                 pred_classes: Optional[np.ndarray] = None,
                 true_classes: Optional[np.ndarray] = None,
                 class_names=None) -> Optional[str]:
        """Save a grid of predicted vs GT masks for sample 0.

        pred_masks/true_masks: (T, H, W) arrays for one sample.
        """
        if not self.enable_snapshots:
            return None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t_steps = pred_masks.shape[0]
        fig, axes = plt.subplots(2, max(t_steps, 1),
                                 figsize=(2.2 * t_steps, 4.6))
        axes = np.atleast_2d(axes)
        for t in range(t_steps):
            for row, masks in enumerate([pred_masks, true_masks]):
                ax = axes[row, t]
                ax.imshow(masks[t], cmap="viridis")
                ax.axis("off")
                label = "pred" if row == 0 else "true"
                title = f"{label} t={t}"
                classes = pred_classes if row == 0 else true_classes
                if classes is not None and class_names is not None:
                    title += f" {class_names[int(classes[t])]}"
                ax.set_title(title, fontsize=8)
        out = os.path.join(self.model_dir, f"masks_epoch{epoch:04d}.png")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        return out

    def close(self) -> None:
        self._fp.close()
