"""High-resolution streaming inference with spatial sharding over the mesh.

For native 1024x2048 Cityscapes frames the conv pyramid's activations
dominate memory; instead of sharding the batch, the *height* dimension is
sharded over the mesh and XLA's SPMD partitioner inserts the halo exchanges
for every convolution over ICI. The recurrent decode stays batched and
on-chip: only spatial collectives move between neighbours, never the
ConvLSTM state. This is the TPU-native answer to the north-star "high-res
1024x2048 streaming inference, batched recurrent decode across TPU mesh"
(BASELINE.json) — the reference has no analogue (single-GPU only).

The global-max-pooled side features and the interpolation matmuls reduce /
contract over the sharded axis; XLA lowers those to psums/all-gathers
automatically from the sharding annotations. Numerical equality with the
unsharded forward is tested on a virtual CPU mesh
(tests/test_streaming.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.rsis import forward


def spatial_mesh(num_devices: int = 0) -> Mesh:
    """1-D mesh whose axis shards image height ("space")."""
    devs = jax.devices()
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=("space",))


def make_streaming_forward(cfg: Config, mesh: Mesh, T: int | None = None):
    """Jitted forward with x sharded (batch replicated, H sharded).

    Input sharding P(None, "space"): the H axis of (B, H, W, 3) splits
    across the mesh; params replicate. Outputs keep masks H-sharded
    (P(None, None, "space")) so a full-resolution mask never materialises
    on one chip.
    """
    x_sh = NamedSharding(mesh, P(None, "space"))
    rep = NamedSharding(mesh, P())
    masks_sh = NamedSharding(mesh, P(None, None, "space"))

    fwd = jax.jit(
        lambda variables, x: forward(cfg, variables, x, T=T),
        in_shardings=(rep, x_sh),
        out_shardings=(masks_sh, rep, rep))

    def run(variables, x):
        x = jax.device_put(x, x_sh)
        return fwd(variables, x)

    return run
