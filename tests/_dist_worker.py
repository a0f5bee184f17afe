"""Subprocess worker for the real 2-process multi-host handshake test
(tests/test_distributed.py). Not a test module.

Each process: jax.distributed.initialize against a localhost coordinator,
slice the global batch, assemble a global array from process-local shards,
and reduce it inside jit (the psum path XLA inserts for the sum of a
"data"-sharded array). Mirrors what parallel/distributed.py promises for
a real multi-host pod, on 2 CPU processes x 2 virtual devices.

Usage: python _dist_worker.py <coordinator> <num_processes> <process_id>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rsis_tpu.parallel.distributed import global_batch_slice, initialize


def main() -> None:
    coord, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    active = initialize(coord, n, i)
    assert active, "distributed mode should be active"
    assert jax.process_count() == n, jax.process_count()
    assert jax.process_index() == i, jax.process_index()
    assert len(jax.devices()) == 2 * n, jax.devices()

    # host-side loader slicing: this process's contiguous batch shard
    per, off = global_batch_slice(8)
    assert (per, off) == (4, 4 * i), (per, off)

    # global-array assembly from process-local data + a jitted global sum
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = np.arange(off, off + per, dtype=np.float32).reshape(per, 1)
    garr = jax.make_array_from_process_local_data(sharding, local, (8, 1))
    assert garr.shape == (8, 1)

    got = float(jax.jit(jax.numpy.sum)(garr))
    assert got == float(np.arange(8).sum()), got
    print(f"proc {i}: OK global_sum={got}", flush=True)


if __name__ == "__main__":
    main()
