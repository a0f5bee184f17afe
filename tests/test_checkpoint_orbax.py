"""Orbax checkpoint format: sharded-state round trip + trainer resume
interop with the msgpack format."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rsis_tpu.config import Config
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.parallel.mesh import create_mesh
from rsis_tpu.train import (checkpoint_exists, create_train_state,
                            load_checkpoint, save_checkpoint)


def _cfg(tmp_path, fmt):
    return Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                  num_classes=3, imsize=32, maxseqlen=3, gt_maxseqlen=5,
                  batch_size=4, resize=True, models_root=str(tmp_path),
                  model_name="ckpt", checkpoint_format=fmt)


def test_orbax_roundtrip_preserves_values_and_shardings(tmp_path):
    cfg = _cfg(tmp_path, "orbax")
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    # place the state sharded/replicated on the 8-device mesh so orbax has
    # real shardings to preserve
    mesh = create_mesh(8)
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(a, rep), state)

    save_checkpoint(cfg, state)
    assert checkpoint_exists(cfg)

    template = jax.tree.map(lambda a: jax.device_put(a, rep),
                            create_train_state(cfg, init_variables(
                                cfg, jax.random.PRNGKey(1))))
    restored, saved_cfg = load_checkpoint(cfg, template)
    assert saved_cfg.checkpoint_format == "orbax"
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == rep


def test_format_interop_on_resume(tmp_path):
    # save msgpack, then a cfg configured for orbax must still load it
    cfg_m = _cfg(tmp_path, "msgpack")
    variables = init_variables(cfg_m, jax.random.PRNGKey(2))
    state = create_train_state(cfg_m, variables)
    save_checkpoint(cfg_m, state)

    cfg_o = cfg_m.replace(checkpoint_format="orbax")
    template = create_train_state(cfg_o, init_variables(
        cfg_o, jax.random.PRNGKey(3)))
    restored, _ = load_checkpoint(cfg_o, template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
