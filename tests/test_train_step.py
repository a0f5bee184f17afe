"""Tests for the jitted train step: loss drops, flags gate subnets,
multi-device data parallelism matches single-device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsis_tpu.config import Config
from rsis_tpu.data import SyntheticBlobs, DataLoader, unpack_target
from rsis_tpu.models.rsis import init_variables
from rsis_tpu.parallel.mesh import create_mesh, shard_batch
from rsis_tpu.train import (
    StepFlags, create_train_state, make_train_step, split_params,
    merge_params)


CFG = Config(dataset="synthetic", base_model="tiny", hidden_size=32,
             num_classes=3, imsize=32, maxseqlen=4, gt_maxseqlen=6,
             batch_size=4, resize=True, lr=1e-3, lr_cnn=1e-4)


def make_batch(cfg, n=4, seed=0):
    ds = SyntheticBlobs(cfg, split="train", imsize=cfg.imsize, length=n,
                        num_classes=cfg.num_classes)
    loader = DataLoader(ds, batch_size=n, shuffle=False, num_workers=1,
                        seed=seed)
    imgs, tgts = next(iter(loader))
    y_mask, y_class, sw_mask, sw_class = unpack_target(tgts)
    return (imgs.astype(np.float32), y_mask.astype(np.float32),
            y_class.astype(np.int32), sw_mask.astype(np.float32),
            sw_class.astype(np.float32))


@pytest.fixture(scope="module")
def setup():
    variables = init_variables(CFG, jax.random.PRNGKey(0))
    state = create_train_state(CFG, variables)
    batch = make_batch(CFG)
    return state, batch


class TestTrainStep:
    def test_loss_decreases(self, setup):
        state, batch = setup
        train_step, _ = make_train_step(CFG, donate=False)
        flags = StepFlags(use_class_loss=jnp.float32(1),
                          use_stop_loss=jnp.float32(1),
                          update_encoder=jnp.float32(0))
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, metrics = train_step(state, batch, flags, rng)
            losses.append(float(metrics[0]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_encoder_frozen_until_flag(self, setup):
        state, batch = setup
        train_step, _ = make_train_step(CFG, donate=False)
        rng = jax.random.PRNGKey(2)
        frozen = StepFlags(use_class_loss=jnp.float32(0),
                           use_stop_loss=jnp.float32(0),
                           update_encoder=jnp.float32(0))
        new_state, _ = train_step(state, batch, frozen, rng)
        base0 = state.params["encoder"]["base"]
        base1 = new_state.params["encoder"]["base"]
        deltas = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), base0, base1)
        assert max(jax.tree.leaves(deltas)) == 0.0
        # decoder and skip convs do move
        dec_delta = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["decoder"], new_state.params["decoder"])
        assert max(jax.tree.leaves(dec_delta)) > 0.0
        sk_delta = float(jnp.abs(
            state.params["encoder"]["sk5"]["kernel"]
            - new_state.params["encoder"]["sk5"]["kernel"]).max())
        assert sk_delta > 0.0

        unfrozen = StepFlags(use_class_loss=jnp.float32(0),
                             use_stop_loss=jnp.float32(0),
                             update_encoder=jnp.float32(1))
        new_state2, _ = train_step(state, batch, unfrozen, rng)
        deltas2 = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), base0,
            new_state2.params["encoder"]["base"])
        assert max(jax.tree.leaves(deltas2)) > 0.0

    def test_loss_flags_gate_terms(self, setup):
        state, batch = setup
        _, eval_step = make_train_step(CFG, donate=False)
        rng = jax.random.PRNGKey(3)
        off = StepFlags(jnp.float32(0), jnp.float32(0), jnp.float32(0))
        on = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(0))
        m_off = np.asarray(eval_step(state, batch, off, rng))
        m_on = np.asarray(eval_step(state, batch, on, rng))
        # component losses identical; totals differ by the gated terms
        np.testing.assert_allclose(m_off[1:], m_on[1:], rtol=1e-5)
        want_on = (CFG.iou_weight * m_on[1]
                   + CFG.class_weight * m_on[3]
                   + CFG.stop_weight * m_on[2])
        assert m_on[0] == pytest.approx(want_on, rel=1e-4)
        assert m_off[0] == pytest.approx(CFG.iou_weight * m_off[1], rel=1e-4)

    def test_split_merge_roundtrip(self, setup):
        state, _ = setup
        enc, dec = split_params(state.params)
        merged = merge_params(enc, dec)
        flat_a = jax.tree.leaves(state.params)
        flat_b = jax.tree.leaves(merged)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDataParallel:
    def test_mesh_step_matches_single_device(self, setup):
        state, batch = setup
        rng = jax.random.PRNGKey(4)
        flags = StepFlags(jnp.float32(1), jnp.float32(0), jnp.float32(0))

        train_single, _ = make_train_step(CFG, donate=False)
        s1, m1 = train_single(state, batch, flags, rng)

        mesh = create_mesh(4)
        train_mesh, _ = make_train_step(CFG, mesh=mesh, donate=False)
        sharded = shard_batch(mesh, batch)
        s2, m2 = train_mesh(state, sharded, flags, rng)

        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=2e-3, atol=2e-5)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.params["decoder"], s2.params["decoder"])
        assert max(jax.tree.leaves(d)) < 2e-4

    def test_8dev_gradient_psum_matches_single_device(self):
        """Gradient psum correctness at full mesh width: the raw gradient
        of the full loss (batch 8 sharded over 8 devices, encoder included,
        realistic T) must equal the single-device gradient on the identical
        global batch up to f32 reduction-order noise. Gradients are the
        object the collective computes — params-after-Adam would amplify
        reduction noise through m/sqrt(v) for near-zero gradients."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rsis_tpu.models.rsis import build_models
        from rsis_tpu.train.step import (_forward_with_costs, _losses,
                                         decode_batch)

        cfg = CFG.replace(batch_size=8, maxseqlen=5, gt_maxseqlen=7)
        variables = init_variables(cfg, jax.random.PRNGKey(2))
        state = create_train_state(cfg, variables)
        batch = make_batch(cfg, n=8, seed=3)
        flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
        rng = jax.random.PRNGKey(10)
        encoder, decoder = build_models(cfg)

        def loss_fn(params, batch_stats, batch, flags, rng):
            x, y_mask, y_class, sw_mask, sw_class = decode_batch(cfg, batch)
            masks, clss, stops, costs, _ = _forward_with_costs(
                cfg, encoder, decoder, params, batch_stats, x, y_mask,
                cfg.maxseqlen, train=True, rng=rng, remat=False)
            total, _ = _losses(cfg, masks, clss, stops, costs, y_mask,
                               y_class, sw_mask, sw_class, flags)
            return total

        grad_fn = jax.grad(loss_fn)
        g_single = jax.jit(grad_fn)(state.params, state.batch_stats,
                                    batch, flags, rng)

        mesh = create_mesh(8)
        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        g_mesh = jax.jit(
            grad_fn,
            in_shardings=(rep, rep, (bsh,) * 5, rep, rep),
            out_shardings=rep)(
                state.params, state.batch_stats, shard_batch(mesh, batch),
                flags, rng)

        for (path, a), b in zip(jax.tree.leaves_with_path(g_single),
                                jax.tree.leaves(g_mesh)):
            a, b = np.asarray(a), np.asarray(b)
            # 1e-7 absolute floor: gradients that cancel to ~1e-9 are pure
            # f32 reduction-order noise in both orderings
            scale = np.abs(a).max() + 1e-10
            assert np.abs(a - b).max() < 1e-4 * scale + 1e-7, (
                jax.tree_util.keystr(path), np.abs(a - b).max(), scale)

    def test_multislice_mesh_matches_single_device(self):
        """(2, 4) dcn x data mesh: the hierarchical all-reduce (ICI within
        a slice, DCN across) must reproduce single-device gradients/params
        like the flat mesh does."""
        from rsis_tpu.parallel.mesh import create_multislice_mesh
        cfg = CFG.replace(batch_size=8)
        variables = init_variables(cfg, jax.random.PRNGKey(6))
        state = create_train_state(cfg, variables)
        batch = make_batch(cfg, n=8, seed=9)
        flags = StepFlags(jnp.float32(1), jnp.float32(0), jnp.float32(0))
        rng = jax.random.PRNGKey(13)

        train_single, _ = make_train_step(cfg, donate=False)
        s1, m1 = train_single(state, batch, flags, rng)

        mesh = create_multislice_mesh(num_slices=2, per_slice=4)
        assert dict(mesh.shape) == {"dcn": 2, "data": 4}
        train_ms, _ = make_train_step(cfg, mesh=mesh, donate=False)
        s2, m2 = train_ms(state, shard_batch(mesh, batch), flags, rng)

        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=2e-3, atol=2e-5)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.params["decoder"], s2.params["decoder"])
        assert max(jax.tree.leaves(d)) < 2e-4

    def test_uneven_batch_rejected(self):
        mesh = create_mesh(4)
        bad = (np.zeros((6, 8, 8, 3), np.float32),)
        with pytest.raises(ValueError, match="not divisible"):
            shard_batch(mesh, bad)

