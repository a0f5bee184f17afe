"""Multi-host launch support.

The reference is strictly single-host (``nn.DataParallel``,
reference src/train.py:269-274). For multi-host TPU pods the same
data-parallel program runs SPMD across processes: every host runs the
identical training script, `jax.distributed.initialize` wires up the
global device view, and the existing mesh/sharding code
(parallel/mesh.py) spans all hosts automatically — `create_mesh()`
already builds over `jax.devices()` (global), and `shard_batch` places
each host's shard via the same NamedSharding.

Launch contract (one command per host):

    python -m rsis_tpu.cli.train ... \
        -coordinator <host0>:<port> -num_processes N -process_id i

or, on Cloud TPU pod slices where the runtime can auto-discover the
topology from the TPU metadata, just ``--multihost``. Omitting all
multi-host flags is an explicit single-host run (no auto-detection:
silently training N un-synchronized replicas when discovery misfires
would be far worse than requiring one flag). Each host feeds
``shard_batch`` the identically-seeded GLOBAL batch; in multi-process
mode it slices this host's shard and assembles the global array with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               auto: bool = False) -> bool:
    """Initialize the multi-host runtime. Returns True if distributed mode
    is active (more than one process), False for the single-host no-op.

    auto=True (the --multihost flag) calls jax.distributed.initialize()
    with no arguments for Cloud-TPU topology auto-discovery. With neither
    flags nor auto this is an explicit single-host no-op.
    """
    if auto:
        jax.distributed.initialize()
        return jax.process_count() > 1
    if coordinator is None and num_processes is None:
        # plain single-process run (the common case in this repo's tests
        # and on the single tunneled chip)
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def global_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per_process_batch, offset) for this host's loader shard."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n} processes")
    per = global_batch // n
    return per, per * jax.process_index()
