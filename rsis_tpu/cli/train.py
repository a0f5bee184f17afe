"""Training entry point: ``python -m rsis_tpu.cli.train -model_name ...``

CLI-compatible with the reference ``python train.py`` (reference:
src/train.py:505-513).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import config_from_args
from ..train.loop import train


def main(argv=None):
    cfg = config_from_args(argv)
    # persistent compilation cache: every curriculum T-growth compiles a
    # fresh multi-minute XLA program over the TPU tunnel — with the cache
    # on disk, re-runs/resumes replay the whole T ladder warm (seconds).
    # RSIS_COMPILE_CACHE=" " disables (empty path).
    import jax
    cache_dir = os.environ.get("RSIS_COMPILE_CACHE", "/tmp/jax_cache")
    if cache_dir.strip():
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0)
        except Exception as e:  # cache is an optimization, never fatal
            print(f"compilation cache disabled: {e}")
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
