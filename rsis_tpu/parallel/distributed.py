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

On Cloud TPU VMs the three flags can be omitted entirely —
`jax.distributed.initialize()` auto-discovers them from the TPU
metadata. The per-host batch slice is ``batch_size // num_processes``
handled by the caller's data loader (each host loads its own shard;
`jax.make_array_from_process_local_data` assembles the global array).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host runtime. Returns True if distributed mode
    is active (more than one process), False for the single-host no-op.

    Safe to call unconditionally: with no flags on a single host it does
    nothing; on Cloud TPU pod slices it auto-discovers the topology.
    """
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
