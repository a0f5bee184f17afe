"""Training entry point: ``python -m rsis_tpu.cli.train -model_name ...``

CLI-compatible with the reference ``python train.py`` (reference:
src/train.py:505-513).
"""

from __future__ import annotations

import numpy as np

from ..config import config_from_args
from ..train.loop import train


def main(argv=None):
    cfg = config_from_args(argv)
    from ..parallel.distributed import initialize
    if initialize(cfg.coordinator, cfg.num_processes, cfg.process_id,
                  auto=cfg.multihost):
        import jax
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")
    np.random.seed(cfg.seed)
    train(cfg)


if __name__ == "__main__":
    main()
