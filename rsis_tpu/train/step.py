"""The jitted train/val step: one XLA program per step.

Re-design of the reference ``runIter`` (reference: src/train.py:54-197).
Differences that make it TPU-native:

- the T-step decode is a ``lax.scan`` (fixed T, loss masking) instead of a
  Python loop with a data-dependent break (reference: src/train.py:85-93);
  masked weighted-mean losses make the fixed-T loss value identical because
  the extra columns carry zero sample weight.
- the soft-IoU cost column for Hungarian matching is computed *inside* the
  scan body against all GT masks, so the (B, N, T) cost tensor is built
  without materialising a (B, N, T, HW) broadcast.
- Hungarian matching runs on device (ops/matching.py) — no per-step
  GPU->CPU->GPU round-trip (reference: src/train.py:110-145).
- encoder/decoder gradients are computed in the same backward pass (like
  the reference's single ``loss.backward()``) and applied by two optax
  optimizers; the encoder update is gated by the ``update_encoder`` flag as
  a traced 0/1 select so the compiled step never changes shape.
- loss-schedule flags (use_class_loss / use_stop_loss) enter as traced 0/1
  weights — flipping them mid-training does not recompile.

Under a data mesh the batch arrives sharded over ``"data"`` and parameters
replicated; XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..models.decoder import init_carry
from ..models.rsis import build_models, compute_dtype
from ..ops.losses import (
    masked_bce_loss, masked_nll_loss, soft_iou_cost, soft_iou_cost_matmul,
    soft_iou_loss)
from ..ops.matching import hungarian, hungarian_pallas
from ..ops.upsample import upsample_bilinear_align_corners
from ..parallel.mesh import batch_sharding, replicated
from .optim import make_optimizer, merge_params, split_params


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    enc_opt: Any
    dec_opt: Any
    step: jnp.ndarray


@flax.struct.dataclass
class StepFlags:
    """Runtime (traced) training-schedule flags; floats 0.0/1.0."""
    use_class_loss: jnp.ndarray
    use_stop_loss: jnp.ndarray
    update_encoder: jnp.ndarray

    @classmethod
    def from_config(cls, cfg: Config) -> "StepFlags":
        return cls(
            use_class_loss=jnp.float32(1.0 if cfg.use_class_loss else 0.0),
            use_stop_loss=jnp.float32(1.0 if cfg.use_stop_loss else 0.0),
            update_encoder=jnp.float32(1.0 if cfg.update_encoder else 0.0))


def create_train_state(cfg: Config, variables) -> TrainState:
    enc_tx = make_optimizer(cfg.optim_cnn, cfg.lr_cnn, cfg.weight_decay_cnn,
                            cfg.momentum)
    dec_tx = make_optimizer(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum)
    enc_p, dec_p = split_params(variables["params"])
    return TrainState(params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      enc_opt=enc_tx.init(enc_p),
                      dec_opt=dec_tx.init(dec_p),
                      step=jnp.zeros((), jnp.int32))


def _forward_with_costs(cfg: Config, encoder, decoder, params, batch_stats,
                        x, y_mask, T: int, train: bool, rng,
                        remat: bool = True, mesh=None):
    """Encoder once + scanned decode emitting per-step cost columns.

    Returns (masks (B,T,HW) logits, class_probs (B,T,C), stop_logits (B,T),
    costs (B,N,T), new_batch_stats).
    """
    enc_vars = {"params": params["encoder"],
                "batch_stats": batch_stats["encoder"]}
    if train:
        skips, mut = encoder.apply(enc_vars, x, train=True,
                                   mutable=["batch_stats"])
        new_stats = {"encoder": mut["batch_stats"]}
    else:
        skips = encoder.apply(enc_vars, x, train=False)
        new_stats = batch_stats
    h, w = x.shape[1], x.shape[2]
    dtype = compute_dtype(cfg)
    carry0 = init_carry(skips, cfg.hidden_size, dtype)
    needs_rng = train and (decoder.dropout > 0 or decoder.dropout_stop > 0
                           or decoder.dropout_cls > 0)

    # per-step Hungarian cost columns: the matmul form contracts against
    # the GT masks on the MXU with the per-instance pixel counts hoisted
    # out of the scan (ops/losses.soft_iou_cost_matmul). RSIS_COST_MATMUL
    # is read here, at step-build/trace time — bench.py's kill-switch
    # retries rebuild the step, so flips take effect (same contract as
    # RSIS_DYFOLD; never read env inside a cached jit).
    if os.environ.get("RSIS_COST_MATMUL", "1") != "0":
        y_cost = y_mask.astype(dtype)
        y_sum = jnp.sum(y_mask, axis=-1, dtype=jnp.float32)

        def cost_fn(mask_flat):
            return soft_iou_cost_matmul(y_sum, y_cost, mask_flat)
    else:
        def cost_fn(mask_flat):
            # cost of this prediction against every GT instance: (B, N)
            return soft_iou_cost(y_mask, mask_flat[:, None, :])

    # the hoisted fast decode (skip-conv terms computed once before the
    # scan, fused mask head) is exact math and fully differentiable, so it
    # also serves the training step whenever no dropout rng is needed and
    # the skip fusion is channel-separable; see models/fast_decoder.py
    use_fast = (cfg.pallas != "off" and not needs_rng
                and cfg.skip_mode in ("concat", "sum", "none"))
    from ..models.rowmajor_decoder import (
        _hoist_cells_rowmajor, _to_rowmajor, rowmajor_decoder_step,
        rowmajor_path_available, training_rowmajor_selected)
    interpret = jax.default_backend() != "tpu"
    use_rowmajor = (not needs_rng) and training_rowmajor_selected(
        cfg, skips)
    if use_rowmajor:
        # Pallas cells with custom_vjp backward kernels — the training
        # twin of the inference row-major decode (ops/pallas_decode_vjp)
        from ..ops.mask_head import mask_head_fused
        from ..ops.pallas_mask_head import (
            make_mask_head_vjp, pallas_head_available, shard_head_fn)
        cells_rm = _hoist_cells_rowmajor(params["decoder"], skips,
                                         cfg.hidden_size, cfg.skip_mode)
        carry0 = tuple((_to_rowmajor(hh), _to_rowmajor(cc))
                       for hh, cc in carry0)
        conv_out = params["decoder"]["conv_out"]
        fine_shape = carry0[-1][0].shape
        if pallas_head_available(fine_shape) or interpret:
            head_fn = make_mask_head_vjp(interpret=interpret)
            if mesh is not None and mesh.devices.size > 1:
                head_fn = shard_head_fn(head_fn, mesh)
        else:
            def head_fn(h_fine, kernel, bias):
                return mask_head_fused(jnp.moveaxis(h_fine, 2, -1),
                                       kernel, bias)

        def step(carry, t):
            (h_fine, cls, stop), new_carry = rowmajor_decoder_step(
                params["decoder"], cells_rm, carry, interpret=interpret,
                differentiable=True, mesh=mesh)
            mask = head_fn(h_fine, conv_out["kernel"], conv_out["bias"])
            mask = upsample_bilinear_align_corners(mask, h, w)
            mask_flat = mask.reshape(mask.shape[0], -1)
            # stacked in compute dtype: f32-upcasting here doubled the
            # scan-output DUS traffic (11 ms/step at T=20 b32) for
            # bf16-precision data; the losses upcast inside the reduce.
            # stop_gradient HERE, inside the scan body — the matcher costs
            # are gradient-dead (stop_gradient in _losses), but applied
            # only outside the scan the AD still stacked the cost path's
            # residuals per step (a 336 MB f32 sigmoid at T=20 b32,
            # scripts/analyze_residuals.py)
            cost_col = lax.stop_gradient(cost_fn(mask_flat))
            return new_carry, (mask_flat, cls.astype(jnp.float32),
                               stop[:, 0].astype(jnp.float32), cost_col)
    elif use_fast:
        from ..models.fast_decoder import _hoist_cells, fast_decoder_step
        cells = _hoist_cells(params["decoder"], skips, cfg.hidden_size,
                             cfg.skip_mode)

        def step(carry, t):
            (mask, cls, stop), new_carry = fast_decoder_step(
                params["decoder"], cells, skips, carry)
            mask = upsample_bilinear_align_corners(mask, h, w)
            mask_flat = mask.reshape(mask.shape[0], -1)
            # stacked in compute dtype: f32-upcasting here doubled the
            # scan-output DUS traffic (11 ms/step at T=20 b32) for
            # bf16-precision data; the losses upcast inside the reduce.
            # stop_gradient HERE, inside the scan body — the matcher costs
            # are gradient-dead (stop_gradient in _losses), but applied
            # only outside the scan the AD still stacked the cost path's
            # residuals per step (a 336 MB f32 sigmoid at T=20 b32,
            # scripts/analyze_residuals.py)
            cost_col = lax.stop_gradient(cost_fn(mask_flat))
            return new_carry, (mask_flat, cls.astype(jnp.float32),
                               stop[:, 0].astype(jnp.float32), cost_col)
    else:
        def step(carry, t):
            rngs = ({"dropout": jax.random.fold_in(rng, t)}
                    if needs_rng else None)
            (mask, cls, stop), new_carry = decoder.apply(
                {"params": params["decoder"]}, skips, carry, train=train,
                rngs=rngs)
            mask = upsample_bilinear_align_corners(mask, h, w)
            mask_flat = mask.reshape(mask.shape[0], -1)
            # stacked in compute dtype: f32-upcasting here doubled the
            # scan-output DUS traffic (11 ms/step at T=20 b32) for
            # bf16-precision data; the losses upcast inside the reduce.
            # cost of this prediction against every GT instance: (B, N);
            # stop_gradient inside the body (see the rowmajor branch)
            cost_col = lax.stop_gradient(cost_fn(mask_flat))
            return new_carry, (mask_flat, cls.astype(jnp.float32),
                               stop[:, 0].astype(jnp.float32), cost_col)

    if remat:
        step = jax.checkpoint(step)
    _, (masks, clss, stops, costs) = lax.scan(step, carry0, jnp.arange(T))
    # outputs stay TIME-MAJOR as the scan stacked them — transposing the
    # (T, B, HW) mask tensor to batch-major cost a full HBM round-trip
    # per step and the order-invariant weighted-mean losses never needed
    # it (the GT gather in _losses emits (T, B) order directly); only the
    # small cost tensor reshapes for the matcher: (T, B, N) -> (B, N, T)
    costs = jnp.moveaxis(costs, 0, -1)
    return masks, clss, stops, costs, new_stats


def _match_solver(cfg: Config, mesh=None):
    """Pick the assignment solver for the train/val loss: the single-kernel
    Pallas LAP on real TPU (measured 38 ms -> sub-ms at T=20 b32 vs the
    unrolled XLA JV's per-op dispatch; docs/PERF.md round 3), the unrolled
    XLA path elsewhere (CPU tests keep the scipy-oracle-proven path).
    Under a multi-device mesh the Pallas call runs through shard_map on
    the batch axis (pallas_call has no GSPMD rule; same contract as
    pallas_decode.shard_cell_fn)."""
    if cfg.pallas == "off" or jax.default_backend() != "tpu":
        return hungarian
    if mesh is not None and mesh.devices.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bsp = P(tuple(mesh.axis_names))
        return shard_map(hungarian_pallas, mesh=mesh, in_specs=(bsp,),
                         out_specs=bsp, check_vma=False)
    return hungarian_pallas


def _losses(cfg: Config, masks, clss, stops, costs, y_mask, y_class,
            sw_mask, sw_class, flags: StepFlags, mesh=None):
    """Matched losses over TIME-MAJOR predictions.

    masks (T, B, HW), clss (T, B, C), stops (T, B) arrive exactly as the
    decode scan stacked them; costs (B, N, T). The GT permutation gather
    emits (T, B) order directly, so the big mask tensor is never
    transposed; the weighted means are order-invariant, so the loss
    values equal the reference's batch-major formulation."""
    T, b = masks.shape[0], masks.shape[1]
    hw = masks.shape[-1]
    num_classes = clss.shape[-1]
    # mask invalid (row, col) pairs with cost 10 like the reference
    # (reference: src/train.py:127-131); note the column mask reuses sw_mask
    valid = (sw_mask[:, :, None] * sw_mask[:, None, :T]).astype(costs.dtype)
    costs = cfg.iou_weight * costs * valid + (1.0 - valid) * 10.0
    costs = lax.stop_gradient(costs)

    perm = _match_solver(cfg, mesh)(costs)               # (B, N)
    idx = perm[:, :T].T                                  # (T, B)
    brange = jnp.arange(b)[None, :]
    y_mask_tb = y_mask[brange, idx]                      # (T, B, HW)
    y_class_tb = y_class[brange, idx]                    # (T, B)

    swm_tb = sw_mask[:, :T].T
    loss_iou = soft_iou_loss(y_mask_tb.reshape(-1, hw),
                             masks.reshape(-1, hw), swm_tb.reshape(-1))
    loss_class = masked_nll_loss(y_class_tb.reshape(-1),
                                 clss.reshape(-1, num_classes),
                                 swm_tb.reshape(-1))
    # stop head learns "keep going": target is the mask sample-weight,
    # weighted by the class sample-weight (reference: src/train.py:170-172)
    loss_stop = masked_bce_loss(swm_tb, stops, sw_class[:, :T].T,
                                cfg.stop_balance_weight)
    total = (cfg.iou_weight * loss_iou
             + flags.use_class_loss * cfg.class_weight * loss_class
             + flags.use_stop_loss * cfg.stop_weight * loss_stop)
    return total, (loss_iou, loss_stop, loss_class)


def decode_batch(cfg: Config, batch):
    """Device-side batch decode: uint8 wire format -> training tensors.

    Batches cross the host->device boundary as (image_u8 (B,H,W,3),
    packed_target_u8 (B,N,HW+3)) — 4x less transfer than fp32 — and are
    normalized/unpacked on device (the fused on-device preprocessing the
    north star asks for; the reference normalizes per-sample on the host,
    reference: src/train.py:34-37, src/utils/utils.py:113-127). Float
    inputs pass through unchanged for backward compatibility.
    """
    if isinstance(batch, tuple) and len(batch) == 5:
        x, y_mask, y_class, sw_mask, sw_class = batch
        x = x.astype(compute_dtype(cfg))
        return x, y_mask, y_class, sw_mask, sw_class
    img_u8, target = batch
    dtype = compute_dtype(cfg)
    if img_u8.dtype == jnp.uint8:
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype)
        x = (img_u8.astype(dtype) / 255.0 - mean) / std
    else:
        x = img_u8.astype(dtype)
    # y_mask stays uint8: the masks are binary, every consumer promotes
    # lazily inside a fused read (cost columns, matched-loss gather,
    # augmentation id-collapse), and the packed (B, N, HW) tensor is 4x
    # smaller in HBM than the f32 materialisation the old
    # target.astype(f32) produced (a traced 3.3 ms convert per step)
    y_mask = target[:, :, :-3]
    y_class = target[:, :, -3].astype(jnp.int32)
    sw_mask = target[:, :, -2].astype(jnp.float32)
    sw_class = target[:, :, -1].astype(jnp.float32)
    return x, y_mask, y_class, sw_mask, sw_class


def _resolve_remat(cfg: Config, T: int) -> bool:
    """cfg.remat 'auto' policy: rematerialising the decode scan costs a
    full forward replay in the backward — measured 37.5 ms (~11%) at the
    canonical cityscapes T=20 b32 step (docs/PERF.md round 3) — so keep
    remat OFF whenever the saved decode activations comfortably fit HBM.
    Estimate: 3 arrays (h_prev, c_prev, x_pad) per cell per step over the
    5-level pyramid (sum C_l*H_l*W_l ~ 2x the finest level), worst-case
    W = 2H, bf16."""
    if cfg.remat in ("on", "off"):
        return cfg.remat == "on"
    h, w = cfg.imsize // 2, cfg.imsize  # finest decode level, W = 2H
    fine_c = max(cfg.hidden_size // 16, 1)
    est = 3 * 2.0 * cfg.batch_size * h * w * fine_c * 2 * T
    return est > 4e9


def make_train_step(cfg: Config, T: Optional[int] = None, mesh=None,
                    donate: bool = True, remat: Optional[bool] = None):
    """Build the jitted train step for a fixed decode length T.

    Returns ``train_step(state, batch, flags, rng) -> (state, metrics)``
    where batch = (x, y_mask, y_class, sw_mask, sw_class) and metrics is
    [total, iou, stop, class] matching the reference log order.
    ``remat=None`` resolves from ``cfg.remat`` (see _resolve_remat).
    """
    encoder, decoder = build_models(cfg)
    enc_tx = make_optimizer(cfg.optim_cnn, cfg.lr_cnn, cfg.weight_decay_cnn,
                            cfg.momentum)
    dec_tx = make_optimizer(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum)
    T = T or cfg.maxseqlen
    if remat is None:
        remat = _resolve_remat(cfg, T)

    def loss_fn(params, batch_stats, batch, flags, rng):
        x, y_mask, y_class, sw_mask, sw_class = decode_batch(cfg, batch)
        if cfg.augment and cfg.augment_on_device:
            # flip + fused affine on device, fused into the train program
            # (reference does this per-sample on the host,
            # src/dataloader/transforms/transforms.py:91-102)
            from ..data.device_aug import augment_wire_batch, zoom_range_for
            rng, k_aug = jax.random.split(rng)
            x, y_mask = augment_wire_batch(
                k_aug, x, y_mask, cfg.rotation, cfg.translation, cfg.shear,
                zoom_range_for(cfg), mesh=mesh)
        masks, clss, stops, costs, new_stats = _forward_with_costs(
            cfg, encoder, decoder, params, batch_stats, x, y_mask, T,
            train=True, rng=rng, remat=remat, mesh=mesh)
        total, parts = _losses(cfg, masks, clss, stops, costs, y_mask,
                               y_class, sw_mask, sw_class, flags, mesh=mesh)
        return total, (new_stats, parts)

    def train_step(state: TrainState, batch, flags: StepFlags, rng):
        (total, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   flags, rng)
        enc_g, dec_g = split_params(grads)
        enc_p, dec_p = split_params(state.params)

        dec_updates, dec_opt = dec_tx.update(dec_g, state.dec_opt, dec_p)
        dec_p = jax.tree.map(lambda p, u: p + u, dec_p, dec_updates)

        enc_updates, enc_opt_new = enc_tx.update(enc_g, state.enc_opt, enc_p)
        enc_p_new = jax.tree.map(lambda p, u: p + u, enc_p, enc_updates)
        gate = flags.update_encoder
        enc_p = jax.tree.map(lambda a, b: gate * a + (1.0 - gate) * b,
                             enc_p_new, enc_p)
        enc_opt = jax.tree.map(
            lambda a, b: jnp.where(gate > 0, a, b), enc_opt_new,
            state.enc_opt)

        new_state = state.replace(params=merge_params(enc_p, dec_p),
                                  batch_stats=new_stats,
                                  enc_opt=enc_opt, dec_opt=dec_opt,
                                  step=state.step + 1)
        loss_iou, loss_stop, loss_class = parts
        metrics = jnp.stack([total, loss_iou, loss_stop, loss_class])
        return new_state, metrics

    def eval_step(state: TrainState, batch, flags: StepFlags, rng):
        x, y_mask, y_class, sw_mask, sw_class = decode_batch(cfg, batch)
        masks, clss, stops, costs, _ = _forward_with_costs(
            cfg, encoder, decoder, state.params, state.batch_stats, x,
            y_mask, T, train=False, rng=rng, remat=False, mesh=mesh)
        total, parts = _losses(cfg, masks, clss, stops, costs, y_mask,
                               y_class, sw_mask, sw_class, flags, mesh=mesh)
        loss_iou, loss_stop, loss_class = parts
        return jnp.stack([total, loss_iou, loss_stop, loss_class])

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        batch_sh = jax.tree.map(lambda _: bsh, (0, 0))

        def _jit_with_batch(fn, out_sh, don):
            return jax.jit(
                fn,
                in_shardings=(rep, batch_sh, rep, rep),
                out_shardings=out_sh,
                donate_argnums=(0,) if don else ())

        train5 = jax.jit(train_step,
                         in_shardings=(rep, (bsh,) * 5, rep, rep),
                         out_shardings=(rep, rep),
                         donate_argnums=(0,) if donate else ())
        eval5 = jax.jit(eval_step,
                        in_shardings=(rep, (bsh,) * 5, rep, rep),
                        out_shardings=rep)
        train2 = _jit_with_batch(train_step, (rep, rep), donate)
        eval2 = _jit_with_batch(eval_step, rep, False)

        def train_dispatch(state, batch, flags, rng):
            return (train2 if len(batch) == 2 else train5)(
                state, batch, flags, rng)

        def eval_dispatch(state, batch, flags, rng):
            return (eval2 if len(batch) == 2 else eval5)(
                state, batch, flags, rng)

        train_step = train_dispatch
        eval_step = eval_dispatch
    else:
        train_step = jax.jit(train_step,
                             donate_argnums=(0,) if donate else ())
        eval_step = jax.jit(eval_step)
    return train_step, eval_step
