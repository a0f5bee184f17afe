"""Device mesh and sharding helpers."""

from .distributed import global_batch_slice, initialize  # noqa: F401
from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    create_multislice_mesh,
    replicated,
    shard_batch,
)
