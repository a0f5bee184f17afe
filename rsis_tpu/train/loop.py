"""Training driver: epochs, curriculum state machine, patience, rollback.

Re-design of the reference ``trainIters`` (reference: src/train.py:199-503):

- per-epoch schedule flips (start class loss / stop loss / encoder updates
  at configured epochs; reference: src/train.py:313-338)
- patience-driven escalation that *reloads the best checkpoint* whenever a
  loss term is added or the encoder is unfrozen (soft rollback; reference:
  src/train.py:450-499)
- curriculum learning that grows ``limit_seqlen_to`` (recompiling the scan
  for the new T; reference: src/train.py:299-300,461-467)
- best-val checkpointing with ``min_delta`` and optional smoothed val curve,
  early stop after ``patience_stop`` epochs without improvement
- the fixed-format loss log lines that plot_curves parses (the log format
  is an API; reference: src/train.py:397-401,437)
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data import DataLoader, get_dataset
from ..models.rsis import init_variables
from ..parallel.mesh import create_mesh, shard_batch
from ..utils.monitor import Monitor
from .checkpoint import (
    checkpoint_exists, load_checkpoint, model_dir, save_checkpoint)
from .step import StepFlags, TrainState, create_train_state, make_train_step


def init_dataloaders(cfg: Config):
    loaders = {}
    class_names = None
    for split in ["train", "val"]:
        # with on-device augmentation the host pipeline only resizes and
        # packs — flip/affine happen inside the jitted train step
        host_augment = (cfg.augment and split == "train"
                        and not cfg.augment_on_device)
        ds = get_dataset(cfg, split=split, augment=host_augment,
                         wire_dtype="uint8")
        loaders[split] = DataLoader(ds, batch_size=cfg.batch_size,
                                    shuffle=True, drop_last=True,
                                    num_workers=cfg.num_workers,
                                    seed=cfg.seed)
        class_names = ds.get_classes()
    return loaders, class_names


class Trainer:
    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.num_devices)
        self._steps: Dict[int, tuple] = {}  # T -> (train_step, eval_step)
        self.rng = jax.random.PRNGKey(cfg.seed)

    def _get_steps(self, T: int):
        if T not in self._steps:
            self._steps[T] = make_train_step(self.cfg, T=T, mesh=self.mesh)
        return self._steps[T]

    def current_T(self) -> int:
        cfg = self.cfg
        if cfg.curriculum_learning and cfg.limit_seqlen_to > 0:
            return min(cfg.maxseqlen, cfg.limit_seqlen_to)
        return cfg.maxseqlen

    def run(self):
        cfg = self.cfg
        epoch_resume = 0

        if cfg.resume and checkpoint_exists(cfg):
            variables = init_variables(cfg, self.rng)
            template = create_train_state(cfg, variables)
            state, saved_cfg = load_checkpoint(cfg, template)
            # saved config takes precedence, like the reference args.pkl
            cfg = self.cfg = saved_cfg.replace(resume=True)
            epoch_resume = cfg.epoch_resume
        elif cfg.transfer and checkpoint_exists(cfg, cfg.transfer_from):
            src_cfg = Config.load(os.path.join(
                model_dir(cfg, cfg.transfer_from), "args.json"))
            variables = init_variables(src_cfg, self.rng)
            template = create_train_state(src_cfg, variables)
            src_state, _ = load_checkpoint(cfg, template, cfg.transfer_from)
            variables = {"params": src_state.params,
                         "batch_stats": src_state.batch_stats}
            if src_cfg.dataset != cfg.dataset:
                # swap fc_class for the new class count
                fresh = init_variables(cfg, self.rng)
                params = jax.tree.map(lambda x: x, variables["params"])
                params["decoder"]["fc_class"] = (
                    fresh["params"]["decoder"]["fc_class"])
                variables = {"params": params,
                             "batch_stats": variables["batch_stats"]}
            state = create_train_state(cfg, variables)
        else:
            variables = init_variables(cfg, self.rng)
            if cfg.torch_encoder:
                # ImageNet-pretrained backbone init — the reference always
                # starts from torchvision pretrained weights
                # (reference: src/modules/model.py:25-34)
                from ..models.torch_import import init_encoder_from_torch
                variables = init_encoder_from_torch(
                    cfg.torch_encoder, cfg.base_model, variables)
                print("Encoder initialized from", cfg.torch_encoder)
            state = create_train_state(cfg, variables)

        os.makedirs(model_dir(cfg), exist_ok=True)
        cfg.save(os.path.join(model_dir(cfg), "args.json"))

        log_fp = err_fp = None
        if not cfg.log_term:
            log_path = os.path.join(model_dir(cfg), cfg.log_file)
            print("Training logs will be saved to:", log_path)
            # line-buffered so the log is tail-able during the run;
            # append on resume — each stage of a multi-resume run used to
            # overwrite the previous stage's history (the round-5 soak
            # lost its stage-1/2 logs to exactly this)
            mode = "a" if cfg.resume else "w"
            log_fp = open(log_path, mode, buffering=1)
            sys.stdout = log_fp
            # stderr goes to train.err like the reference
            # (reference: src/train.py:253-256)
            err_fp = open(os.path.join(model_dir(cfg), "train.err"), mode,
                          buffering=1)
            sys.stderr = err_fp

        print(cfg.to_dict())

        if cfg.curriculum_learning and epoch_resume == 0:
            cfg = self.cfg = cfg.replace(limit_seqlen_to=2)

        loaders, class_names = init_dataloaders(cfg)
        # metrics.jsonl + optional mask snapshots: the visdom-dashboard
        # analogue (reference: src/train.py:294-297,366-395)
        monitor = Monitor(model_dir(cfg), enable_snapshots=cfg.visdom)
        if cfg.visdom:
            # the reference's visdom live server, self-contained
            # (reference: src/train.py:294-297); serves loss curves +
            # mask snapshots from the monitor's files on cfg.port. A busy
            # port must not kill the training run — monitoring is optional.
            from ..utils.dashboard import Dashboard
            try:
                Dashboard(model_dir(cfg), port=cfg.port).start()
            except OSError as e:
                print(f"Dashboard disabled (port {cfg.port}: {e})")

        best_val_loss = cfg.best_val_loss
        acc_patience = 0
        mt_val = -1.0
        start = time.time()

        try:
            for e in range(cfg.max_epoch):
                print("Epoch", e + epoch_resume)
                epoch_losses = {
                    s: {"total": [], "iou": [], "stop": [], "class": []}
                    for s in ["train", "val"]}

                # scheduled flag flips (reference: src/train.py:313-338)
                ep = e + epoch_resume
                if (ep >= cfg.finetune_after and not cfg.update_encoder
                        and cfg.finetune_after != -1):
                    print("Starting to update encoder")
                    cfg = self.cfg = cfg.replace(update_encoder=True)
                    acc_patience = 0
                    mt_val = -1.0
                if (ep >= cfg.class_loss_after and not cfg.use_class_loss
                        and cfg.class_loss_after != -1):
                    print("Starting to learn class loss")
                    cfg = self.cfg = cfg.replace(use_class_loss=True)
                    best_val_loss = 1000.0
                    acc_patience = 0
                    mt_val = -1.0
                if (ep >= cfg.stop_loss_after and not cfg.use_stop_loss
                        and cfg.stop_loss_after != -1):
                    if (not cfg.curriculum_learning
                            or cfg.limit_seqlen_to > cfg.min_steps):
                        print("Starting to learn stop loss")
                        cfg = self.cfg = cfg.replace(use_stop_loss=True)
                        best_val_loss = 1000.0
                        acc_patience = 0
                        mt_val = -1.0

                flags = StepFlags.from_config(cfg)
                T = self.current_T()
                train_step, eval_step = self._get_steps(T)

                mt = mi = mc = mx = 0.0
                for split in ["train", "val"]:
                    for batch_idx, batch in enumerate(
                            self._device_prefetch(loaders[split])):
                        self.rng, step_rng = jax.random.split(self.rng)
                        if split == "train":
                            state, metrics = train_step(state, batch, flags,
                                                        step_rng)
                        else:
                            metrics = eval_step(state, batch, flags,
                                                step_rng)
                        m = np.asarray(metrics)
                        epoch_losses[split]["total"].append(float(m[0]))
                        epoch_losses[split]["iou"].append(float(m[1]))
                        epoch_losses[split]["stop"].append(float(m[2]))
                        epoch_losses[split]["class"].append(float(m[3]))
                        monitor.log(split, ep, batch_idx, m[0], m[1],
                                    m[2], m[3], T=T)

                        if (batch_idx + 1) % cfg.print_every == 0:
                            mt = np.mean(epoch_losses[split]["total"])
                            mi = np.mean(epoch_losses[split]["iou"])
                            mc = np.mean(epoch_losses[split]["class"])
                            mx = np.mean(epoch_losses[split]["stop"])
                            te = time.time() - start
                            print("iter %d:\ttotal:%.4f\tclass:%.4f\t"
                                  "iou:%.4f\tstop:%.4f\ttime:%.4f"
                                  % (batch_idx, mt, mc, mi, mx, te))
                            start = time.time()

                    if not epoch_losses[split]["total"]:
                        raise RuntimeError(
                            f"no batches produced for split {split!r}")
                    if split == "val" and cfg.smooth_curves:
                        cur = float(np.mean(epoch_losses[split]["total"]))
                        mt = cur if mt_val == -1 else 0.9 * mt_val + 0.1 * cur
                        mt_val = mt
                    else:
                        mt = float(np.mean(epoch_losses[split]["total"]))
                    mi = float(np.mean(epoch_losses[split]["iou"]))
                    mc = float(np.mean(epoch_losses[split]["class"]))
                    mx = float(np.mean(epoch_losses[split]["stop"]))
                    cfg = self.cfg = cfg.replace(epoch_resume=ep)
                    # ep (absolute epoch incl. resume offset), not the loop-local
                    # index: after a resume the plot_curves grammar must not
                    # restart at 0 and overlap the old curve
                    print("Epoch %d:\ttotal:%.4f\tclass:%.4f\tiou:%.4f\t"
                          "stop:%.4f\t(%s)" % (ep, mt, mc, mi, mx, split))

                if cfg.visdom:
                    self._epoch_snapshot(monitor, cfg, state, loaders, ep,
                                         class_names, T)

                # best-val checkpointing
                if mt < (best_val_loss - cfg.min_delta):
                    print("Saving checkpoint.")
                    best_val_loss = mt
                    cfg = self.cfg = cfg.replace(best_val_loss=best_val_loss)
                    save_checkpoint(cfg, state)
                    acc_patience = 0
                else:
                    acc_patience += 1

                # patience-driven escalation with best-checkpoint rollback
                rollback = False
                if (acc_patience > cfg.patience and not cfg.use_class_loss
                        and cfg.class_loss_after != -1):
                    print("Starting to learn class loss")
                    acc_patience = 0
                    cfg = self.cfg = cfg.replace(use_class_loss=True)
                    best_val_loss = 1000.0
                    mt_val = -1.0
                    rollback = True
                if (acc_patience > cfg.patience and cfg.curriculum_learning
                        and cfg.limit_seqlen_to < cfg.maxseqlen):
                    print("Adding one step more:")
                    acc_patience = 0
                    cfg = self.cfg = cfg.replace(
                        limit_seqlen_to=cfg.limit_seqlen_to + cfg.steps_cl)
                    print(cfg.limit_seqlen_to)
                    best_val_loss = 1000.0
                    mt_val = -1.0
                if (acc_patience > cfg.patience and not cfg.update_encoder
                        and cfg.finetune_after != -1):
                    print("Starting to update encoder")
                    acc_patience = 0
                    cfg = self.cfg = cfg.replace(update_encoder=True)
                    best_val_loss = 1000.0
                    mt_val = -1.0
                    rollback = True
                if (acc_patience > cfg.patience and not cfg.use_stop_loss
                        and cfg.stop_loss_after != -1):
                    print("Starting to learn stop loss")
                    if (not cfg.curriculum_learning
                            or cfg.limit_seqlen_to > cfg.min_steps):
                        acc_patience = 0
                        cfg = self.cfg = cfg.replace(use_stop_loss=True)
                        best_val_loss = 1000.0
                        mt_val = -1.0
                    rollback = True
                if rollback and checkpoint_exists(cfg):
                    state, _ = load_checkpoint(cfg, state)

                if acc_patience > cfg.patience_stop:
                    break
        finally:
            monitor.close()
            if log_fp is not None:
                sys.stdout = sys.__stdout__
                log_fp.close()
            if err_fp is not None:
                sys.stderr = sys.__stderr__
                err_fp.close()
        return state

    def _epoch_snapshot(self, monitor, cfg, state, loaders, epoch,
                        class_names, T):
        """Render predicted-vs-GT mask grids for one val sample (the
        visdom heatmap analogue, reference: src/train.py:366-395)."""
        try:
            from ..data.base import unpack_target
            from ..evals.forward import run_forward
            imgs, tgts = next(iter(loaders["val"]))
            if imgs.dtype == np.uint8:
                from ..data.base import normalize_image
                x = np.stack([normalize_image(im) for im in imgs])
            else:
                x = imgs.astype(np.float32)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            masks, clss, stops = run_forward(cfg, variables, x[:1], T=T)
            y_mask, y_class, _, _ = unpack_target(
                tgts[:1].astype(np.float32))
            h, w = x.shape[1], x.shape[2]
            monitor.snapshot(
                epoch, masks[0],
                y_mask[0, :T].reshape(-1, h, w),
                pred_classes=np.argmax(clss[0], -1),
                true_classes=y_class[0, :T],
                class_names=class_names)
        except Exception as e:  # snapshots must never kill training
            print(f"snapshot failed: {e}")

    def _device_prefetch(self, loader, depth: int = 2):
        """Overlap host->device transfer with compute: keep ``depth``
        batches in flight (device_put is async). Batches travel in the
        uint8 wire format and are decoded on device
        (train/step.decode_batch)."""
        import collections
        pending = collections.deque()
        for imgs, tgts in loader:
            pending.append(shard_batch(self.mesh, (imgs, tgts)))
            if len(pending) > depth:
                yield pending.popleft()
        while pending:
            yield pending.popleft()


def train(cfg: Config) -> TrainState:
    return Trainer(cfg).run()
