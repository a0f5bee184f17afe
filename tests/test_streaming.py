"""Spatially-sharded streaming inference must equal the unsharded forward."""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.config import Config
from rsis_tpu.evals.streaming import make_streaming_forward, spatial_mesh
from rsis_tpu.models.rsis import forward, init_variables


def test_spatial_sharding_matches_single_device():
    cfg = Config(base_model="tiny", hidden_size=16, num_classes=3,
                 maxseqlen=2, imsize=64)
    rng = jax.random.PRNGKey(0)
    variables = init_variables(cfg, rng, (64, 128))
    x = jax.random.normal(rng, (2, 64, 128, 3), jnp.float32)

    want = jax.jit(lambda v, xx: forward(cfg, v, xx))(variables, x)

    mesh = spatial_mesh(8)
    run = make_streaming_forward(cfg, mesh)
    got = run(variables, np.asarray(x))

    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4)


def test_sharded_output_layout():
    cfg = Config(base_model="tiny", hidden_size=16, num_classes=3,
                 maxseqlen=2, imsize=64)
    variables = init_variables(cfg, jax.random.PRNGKey(0), (64, 128))
    mesh = spatial_mesh(4)
    run = make_streaming_forward(cfg, mesh)
    x = np.zeros((1, 64, 128, 3), np.float32)
    masks, clss, stops = run(variables, x)
    assert masks.shape == (1, 2, 64, 128)
    # mask output stays H-sharded across the mesh
    assert len(masks.sharding.device_set) == 4
