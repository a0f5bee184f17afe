"""The Pallas-cell training path (custom_vjp kernels) must produce the
same loss and parameter gradients as the flax path on identical inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.config import Config
from rsis_tpu.data import SyntheticBlobs, DataLoader, unpack_target
from rsis_tpu.models.rsis import build_models, init_variables
from rsis_tpu.train.step import (StepFlags, _forward_with_costs, _losses,
                                 decode_batch, create_train_state,
                                 make_train_step)


def _make_batch(cfg, n=2, seed=0):
    ds = SyntheticBlobs(cfg, split="train", imsize=cfg.imsize, length=n,
                        num_classes=cfg.num_classes)
    loader = DataLoader(ds, batch_size=n, shuffle=False, num_workers=1,
                        seed=seed)
    imgs, tgts = next(iter(loader))
    y_mask, y_class, sw_mask, sw_class = unpack_target(tgts)
    return (imgs.astype(np.float32), y_mask.astype(np.float32),
            y_class.astype(np.int32), sw_mask.astype(np.float32),
            sw_class.astype(np.float32))


def _grad_fn(cfg):
    encoder, decoder = build_models(cfg)

    def loss_fn(params, batch_stats, batch, flags, rng):
        x, y_mask, y_class, sw_mask, sw_class = decode_batch(cfg, batch)
        masks, clss, stops, costs, _ = _forward_with_costs(
            cfg, encoder, decoder, params, batch_stats, x, y_mask,
            cfg.maxseqlen, train=True, rng=rng, remat=False)
        total, _ = _losses(cfg, masks, clss, stops, costs, y_mask,
                           y_class, sw_mask, sw_class, flags)
        return total

    return jax.value_and_grad(loss_fn)


def _assert_rowmajor_selected(cfg):
    """Guard against the vacuous-test failure mode: at imsize=32 the
    pyramid's coarsest level has H=1, the even-H guard rejects it, and the
    'pallas' test silently compares the XLA fast path to flax. Assert the
    predicate the training step actually uses."""
    import jax.numpy as jnp
    from rsis_tpu.models.rowmajor_decoder import training_rowmajor_selected
    encoder, _ = build_models(cfg)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    skips = encoder.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        jnp.zeros((1, cfg.imsize, cfg.imsize, 3)), train=False)
    assert training_rowmajor_selected(cfg, skips), (
        "test geometry does not select the Pallas training path: "
        + str([s.shape for s in skips]))


def test_rowmajor_train_grads_match_flax():
    # imsize=64 -> pyramid H = 2,4,8,16,32: every level even, so
    # pallas="on" genuinely routes through the custom_vjp kernels
    cfg_rm = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                    num_classes=3, imsize=64, maxseqlen=2, gt_maxseqlen=4,
                    batch_size=2, resize=True, pallas="on",
                    compute_dtype="float32")
    _assert_rowmajor_selected(cfg_rm)
    cfg_fx = cfg_rm.replace(pallas="off")
    variables = init_variables(cfg_rm, jax.random.PRNGKey(0))
    state = create_train_state(cfg_rm, variables)
    batch = _make_batch(cfg_rm)
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
    rng = jax.random.PRNGKey(7)

    l_rm, g_rm = _grad_fn(cfg_rm)(state.params, state.batch_stats, batch,
                                  flags, rng)
    l_fx, g_fx = _grad_fn(cfg_fx)(state.params, state.batch_stats, batch,
                                  flags, rng)

    np.testing.assert_allclose(float(l_rm), float(l_fx), rtol=1e-5)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_rm),
                            jax.tree.leaves(g_fx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() <= 5e-4 * scale + 1e-7, (
            jax.tree_util.keystr(path), np.abs(a - b).max(), scale)


def test_rowmajor_train_step_runs_and_descends():
    cfg = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                 num_classes=3, imsize=64, maxseqlen=2, gt_maxseqlen=4,
                 batch_size=2, resize=True, pallas="on", lr=1e-3,
                 compute_dtype="float32")
    _assert_rowmajor_selected(cfg)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    batch = _make_batch(cfg)
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(0))
    train_step, _ = make_train_step(cfg, donate=False)
    losses = []
    for i in range(4):
        state, metrics = train_step(state, batch, flags,
                                    jax.random.PRNGKey(1))
        losses.append(float(metrics[0]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_rowmajor_multidevice_grads_match_single():
    """Pallas cells under a 2-device mesh (shard_map-wrapped, see
    ops/pallas_decode.shard_cell_fn) must reproduce single-device
    gradients of the full loss — forward equality plus gradient-psum
    correctness through the custom_vjp kernels. Gradients are compared
    rather than params-after-Adam (which amplifies f32 reduction noise
    through m/sqrt(v) for near-zero grads, see test_train_step)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from rsis_tpu.parallel.mesh import shard_batch

    cfg = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                 num_classes=3, imsize=64, maxseqlen=2, gt_maxseqlen=4,
                 batch_size=4, resize=True, pallas="on",
                 compute_dtype="float32")
    _assert_rowmajor_selected(cfg)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    batch = _make_batch(cfg, n=4)
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
    rng = jax.random.PRNGKey(3)
    encoder, decoder = build_models(cfg)
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("data",))

    def make_loss(fwd_mesh):
        def loss_fn(params, batch_stats, batch, flags, rng):
            x, y_mask, y_class, sw_mask, sw_class = decode_batch(cfg, batch)
            masks, clss, stops, costs, _ = _forward_with_costs(
                cfg, encoder, decoder, params, batch_stats, x, y_mask,
                cfg.maxseqlen, train=True, rng=rng, remat=False,
                mesh=fwd_mesh)
            total, _ = _losses(cfg, masks, clss, stops, costs, y_mask,
                               y_class, sw_mask, sw_class, flags)
            return total
        return loss_fn

    g_single = jax.jit(jax.grad(make_loss(None)))(
        state.params, state.batch_stats, batch, flags, rng)

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    g_mesh = jax.jit(
        jax.grad(make_loss(mesh)),
        in_shardings=(rep, rep, (bsh,) * 5, rep, rep),
        out_shardings=rep)(
            state.params, state.batch_stats, shard_batch(mesh, batch),
            flags, rng)

    for (path, a), b in zip(jax.tree.leaves_with_path(g_single),
                            jax.tree.leaves(g_mesh)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-10
        assert np.abs(a - b).max() <= 5e-4 * scale + 1e-7, (
            jax.tree_util.keystr(path), np.abs(a - b).max(), scale)


def test_save_small_grads_match_standard(monkeypatch):
    """RSIS_SAVE_SMALL=1 (upsample-fused cell vjp + sparse gmax; the
    opt-in memory lever, default off) must produce the same loss/grads
    as the standard residual path — and actually shrink the
    scan-stacked residual bytes."""
    from jax._src.ad_checkpoint import saved_residuals

    cfg = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                 num_classes=3, imsize=64, maxseqlen=3, gt_maxseqlen=4,
                 batch_size=2, resize=True, pallas="on",
                 compute_dtype="float32")
    _assert_rowmajor_selected(cfg)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    batch = _make_batch(cfg)
    flags = StepFlags(jnp.float32(1), jnp.float32(1), jnp.float32(1))
    rng = jax.random.PRNGKey(7)

    results = {}
    for setting in ["1", "0"]:
        monkeypatch.setenv("RSIS_SAVE_SMALL", setting)
        loss, grads = _grad_fn(cfg)(state.params, state.batch_stats,
                                    batch, flags, rng)
        encoder, decoder = build_models(cfg)

        def fwd_only(params):
            x, y_mask, *_ = decode_batch(cfg, batch)
            masks, clss, stops, costs, _ = _forward_with_costs(
                cfg, encoder, decoder, params, state.batch_stats, x,
                y_mask, cfg.maxseqlen, train=True, rng=rng, remat=False)
            return (jnp.sum(masks.astype(jnp.float32)) + jnp.sum(clss)
                    + jnp.sum(stops) + jnp.sum(costs.astype(jnp.float32)))

        scan_bytes = 0
        for aval, _ in saved_residuals(fwd_only, state.params):
            if aval.shape and aval.shape[0] == cfg.maxseqlen:
                scan_bytes += (int(np.prod(aval.shape))
                               * aval.dtype.itemsize)
        results[setting] = (float(loss), grads, scan_bytes)

    l1, g1, b1 = results["1"]
    l0, g0, b0 = results["0"]
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree.leaves(g0)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() <= 1e-5 * scale + 1e-8, (
            jax.tree_util.keystr(path), np.abs(a - b).max(), scale)
    # at this tiny geometry the x_pad/gmax saves are a smaller fraction
    # of the set (~23% shrink); the bench geometry shrinks 46%
    # (3609 -> 1952 MB scan-stacked, scripts/analyze_residuals.py,
    # docs/PERF.md round 5)
    assert b1 < 0.9 * b0, (b1, b0)


def test_gmax_sparse_matches_max_vjp():
    from rsis_tpu.models.rowmajor_decoder import gmax_sparse

    h = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 5, 16))
    ct = jax.random.normal(jax.random.PRNGKey(1), (2, 5))

    def via_sparse(h):
        return jnp.sum(gmax_sparse(h) * ct)

    def via_max(h):
        return jnp.sum(jnp.max(h, axis=(1, 3)) * ct)

    np.testing.assert_allclose(via_sparse(h), via_max(h), rtol=1e-6)
    np.testing.assert_allclose(jax.grad(via_sparse)(h),
                               jax.grad(via_max)(h), atol=1e-6)
