"""The hoisted fast decode inside the train step must reproduce the flax
path: identical losses and near-identical parameter updates (fp32)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsis_tpu.config import Config
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.train.step import StepFlags, create_train_state, make_train_step
from test_train_step import make_batch


def test_fast_train_step_matches_flax_path():
    base = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                  num_classes=3, imsize=32, maxseqlen=3, gt_maxseqlen=5,
                  batch_size=4, resize=True, lr=1e-3, lr_cnn=1e-4)
    variables = init_variables(base, jax.random.PRNGKey(0))
    state = create_train_state(base, variables)
    batch = make_batch(base)
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
    rng = jax.random.PRNGKey(3)

    step_flax, _ = make_train_step(base.replace(pallas="off"), donate=False)
    step_fast, _ = make_train_step(base.replace(pallas="auto"), donate=False)

    s1, m1 = step_flax(state, batch, flags, rng)
    s2, m2 = step_fast(state, batch, flags, rng)

    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-4,
                               atol=1e-5)
    # adam normalizes by sqrt(v): where a gradient is ~0, fp32
    # accumulation-order differences can flip its sign and move that
    # parameter by up to ~lr; bound the update delta by the lr scale.
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          s1.params, s2.params)
    assert max(jax.tree.leaves(deltas)) < 1.5e-3


def test_fast_path_respects_dropout_fallback():
    # dropout forces the flax path (needs per-step rng); must still run
    cfg = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                 num_classes=3, imsize=32, maxseqlen=2, gt_maxseqlen=4,
                 batch_size=2, resize=True, dropout=0.2)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    batch = make_batch(cfg, n=2)
    flags = StepFlags(jnp.float32(1), jnp.float32(0), jnp.float32(0))
    train_step, _ = make_train_step(cfg, donate=False)
    _, metrics = train_step(state, batch, flags, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics)).all()
