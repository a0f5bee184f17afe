"""Proof the trainer LEARNS — not just that the mechanics run.

test_end_to_end.py checks epochs/checkpoints/resume; test_train_oracle.py
proves loss parity at fixed weights. Neither would catch a sign error
confined to an optimizer-update path (VERDICT r2 item 3). This test
overfits one fixed synthetic batch and asserts (a) the total loss drops by
a real margin and (b) SBD of the thresholded predictions against the
training masks rises above a threshold — a red test if any gradient or
optimizer path breaks. Reference behavior: the best-val machinery of
src/train.py:440-448 presumes training improves.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.config import Config
from rsis_tpu.data import SyntheticBlobs, DataLoader, unpack_target
from rsis_tpu.evals.cvppp import evaluate_batch
from rsis_tpu.models.rsis import forward, init_variables
from rsis_tpu.train.step import (StepFlags, create_train_state,
                                 make_train_step)


def _fixed_batch(cfg, n):
    ds = SyntheticBlobs(cfg, split="train", imsize=cfg.imsize, length=n,
                        num_classes=cfg.num_classes)
    loader = DataLoader(ds, batch_size=n, shuffle=False, num_workers=1,
                        seed=0)
    imgs, tgts = next(iter(loader))
    y_mask, y_class, sw_mask, sw_class = unpack_target(tgts)
    return (imgs.astype(np.float32), y_mask.astype(np.float32),
            y_class.astype(np.int32), sw_mask.astype(np.float32),
            sw_class.astype(np.float32))


def _instance_labels(masks, stops, thr=0.5):
    """(T,H,W) sigmoid masks + (T,) objectness -> single label map.
    Later instances paint over earlier ones only where confident."""
    lab = np.zeros(masks.shape[1:], np.int32)
    for t in range(masks.shape[0]):
        if stops[t] < 0.5:
            break
        lab[masks[t] > thr] = t + 1
    return lab


def test_overfit_one_batch_loss_drops_and_sbd_rises():
    cfg = Config(dataset="synthetic", base_model="tiny", hidden_size=16,
                 num_classes=3, imsize=32, maxseqlen=4, gt_maxseqlen=6,
                 batch_size=4, resize=True, lr=1e-2, lr_cnn=3e-3,
                 update_encoder=True, compute_dtype="float32")
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables)
    batch = _fixed_batch(cfg, cfg.batch_size)
    # all loss terms + both optimizers active: a break anywhere is visible
    flags = StepFlags(use_class_loss=jnp.float32(1),
                      use_stop_loss=jnp.float32(1),
                      update_encoder=jnp.float32(1))
    train_step, _ = make_train_step(cfg, donate=False)

    losses = []
    for i in range(200):
        state, metrics = train_step(state, batch, flags,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(metrics[0]))

    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert np.isfinite(losses).all(), losses
    # demand a real margin, not epsilon noise
    assert last < 0.4 * first, (first, last, losses[::10])

    # SBD of thresholded predictions vs the training masks must clear a
    # threshold no untrained/broken model reaches on blob instances
    var_now = {"params": state.params, "batch_stats": state.batch_stats}
    x, y_mask, _, sw_mask, _ = batch  # x already ImageNet-normalized float
    masks, clss, stops = jax.jit(
        lambda v, xx: forward(cfg, v, xx))(var_now, jnp.asarray(x))
    masks, stops = np.asarray(masks), np.asarray(stops)

    h = w = int(np.sqrt(y_mask.shape[-1]))  # synthetic images are square
    preds, gts = [], []
    for b in range(cfg.batch_size):
        preds.append(_instance_labels(masks[b], stops[b, :, 0]))
        gt = np.zeros((h, w), np.int32)
        for t in range(y_mask.shape[1]):
            if sw_mask[b, t] > 0:
                gt[y_mask[b, t].reshape(h, w) > 0.5] = t + 1
        gts.append(gt)
    res = evaluate_batch(preds, gts)
    assert res["SBD"] > 0.5, (res, [len(np.unique(p)) for p in preds])
