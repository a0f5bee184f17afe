"""Configuration surface for rsis_tpu.

Mirrors the reference's single-argparse config surface (reference:
src/args.py:3-157) so launch scripts and checkpoints are drop-in
compatible, plus TPU-specific knobs (mesh shape, compute dtype). The parsed
namespace round-trips through ``Config`` (a plain dataclass) which is what
the library layers consume; like the reference, the config is persisted
beside checkpoints and takes precedence on resume
(reference: src/train.py:206-215).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass


@dataclass
class Config:
    # training
    resume: bool = False
    epoch_resume: int = 0
    seed: int = 123
    batch_size: int = 28
    lr: float = 1e-3
    lr_cnn: float = 1e-6
    optim_cnn: str = "adam"
    momentum: float = 0.9
    weight_decay: float = 1e-6
    weight_decay_cnn: float = 1e-6
    optim: str = "adam"
    maxseqlen: int = 10
    gt_maxseqlen: int = 20
    best_val_loss: float = 1000.0
    crop: bool = False
    smooth_curves: bool = False

    # encoder fine-tuning
    finetune_after: int = 0
    update_encoder: bool = False
    transfer: bool = False
    transfer_from: str = "model"
    # path to pretrained encoder weights for fresh starts: a torchvision
    # ImageNet state_dict (backbone only — the reference's always-on init,
    # src/modules/model.py:25-34), a reference encoder.pt (full
    # FeatureExtractor), or an .npz export of either (torch-free envs)
    torch_encoder: str = ""
    curriculum_learning: bool = False
    steps_cl: int = 1
    min_steps: int = 1
    min_delta: float = 0.0
    limit_seqlen_to: int = 0

    # loss schedule
    class_loss_after: int = 20
    use_class_loss: bool = False
    stop_loss_after: int = 3000
    use_stop_loss: bool = False

    # stopping criterion
    patience: int = 15
    patience_stop: int = 60
    max_epoch: int = 4000

    # visualization and logging
    print_every: int = 10
    log_term: bool = False
    visdom: bool = False
    port: int = 8097
    server: str = "http://localhost"

    # loss weights
    class_weight: float = 0.1
    iou_weight: float = 1.0
    stop_weight: float = 0.5
    stop_balance_weight: float = 0.5

    # augmentation
    augment: bool = False
    # checkpoint on-disk format: "msgpack" (single-host flax bytes, the
    # round-1 format) or "orbax" (sharded arrays with shardings preserved
    # — the multi-host/multi-chip format); loads accept either
    checkpoint_format: str = "msgpack"
    # flip + fused affine run inside the jitted train step on device
    # (zero host-side warp work); set False to fall back to the host
    # per-sample path (data/base.py), e.g. for parity debugging
    augment_on_device: bool = True
    rotation: int = 10
    translation: float = 0.1
    shear: float = 0.1
    zoom: float = 0.7

    # hardware
    use_gpu: bool = True          # kept for CLI compatibility; ignored on TPU
    ngpus: int = 1                # kept for CLI compatibility
    num_devices: int = 0          # 0 = all visible devices (data-parallel mesh)
    # multi-host launch (parallel/distributed.py); all None = single host
    coordinator: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    multihost: bool = False       # Cloud-TPU topology auto-discovery
    compute_dtype: str = "float32"  # or "bfloat16"
    pallas: str = "auto"          # fused inference kernels: auto|on|off
    remat: str = "auto"           # decode-scan rematerialisation:
                                  # auto (off while activations fit
                                  # HBM), on, off — see
                                  # train/step._resolve_remat

    # model
    base_model: str = "resnet101"
    skip_mode: str = "concat"
    model_name: str = "model"
    log_file: str = "train.log"
    hidden_size: int = 128
    kernel_size: int = 3
    dropout: float = 0.0
    dropout_stop: float = 0.0
    dropout_cls: float = 0.0

    # dataset
    imsize: int = 256
    resize: bool = False
    num_classes: int = 21
    dataset: str = "pascal"
    pascal_dir: str = "/data/VOCAug/"
    cityscapes_dir: str = "/data/CityScapes/"
    leaves_dir: str = "/data/LeavesDataset/A1/"
    leaves_test_dir: str = "/data/CVPPP2014_LSC_testing_data/A1/"
    num_workers: int = 4
    # synthetic-dataset size (benchmark/integration runs need more
    # than the 16-sample test default); max_instances bounds the blob
    # count per image — raise it so curriculum T-growth past the default
    # 4 instances changes the attainable loss (the silicon soak runs)
    synthetic_length: int = 16
    synthetic_max_instances: int = 4
    models_root: str = "../models"

    # testing / evaluation
    eval_split: str = "test"
    mask_th: float = 0.5
    stop_th: float = 0.5
    class_th: float = 0.5
    max_dets: int = 100
    min_size: float = 0.001
    cat_id: int = -1
    use_cats: bool = True
    display: bool = False
    no_display_text: bool = False
    all_classes: bool = False
    no_run_coco_eval: bool = False
    display_route: bool = False
    # note: the reference's args.py:154-156 also defines use_gt_cats/
    # use_gt_masks/use_gt_stop defaults, but nothing in the reference (or
    # here) ever reads them — dropped rather than carried as silent no-ops.

    # generic prediction CLI (cli/predict.py — beyond the reference's
    # dataset-bound eval scripts): arbitrary images in, instance masks out
    predict_input: str = ""      # image file, directory, or glob
    predict_output: str = ""     # output dir (default <model>/predictions)
    predict_format: str = "both"  # png | coco | both

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, path: str) -> None:
        with open(path, "w") as fp:
            json.dump(self.to_dict(), fp, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as fp:
            return cls.from_dict(json.load(fp))

    @property
    def model_dir(self) -> str:
        return os.path.join(self.models_root, self.model_name)


def get_parser() -> argparse.ArgumentParser:
    """argparse surface compatible with the reference CLI."""
    p = argparse.ArgumentParser(description="rsis_tpu")
    d = Config()

    def flag(name, **kw):
        p.add_argument(name, **kw)

    # training
    flag("--resume", dest="resume", action="store_true", default=d.resume)
    flag("-epoch_resume", dest="epoch_resume", type=int, default=d.epoch_resume)
    flag("-seed", dest="seed", type=int, default=d.seed)
    flag("-batch_size", dest="batch_size", type=int, default=d.batch_size)
    flag("-lr", dest="lr", type=float, default=d.lr)
    flag("-lr_cnn", dest="lr_cnn", type=float, default=d.lr_cnn)
    flag("-optim_cnn", dest="optim_cnn", default=d.optim_cnn,
         choices=["adam", "sgd", "rmsprop"])
    flag("-momentum", dest="momentum", type=float, default=d.momentum)
    flag("-weight_decay", dest="weight_decay", type=float,
         default=d.weight_decay)
    flag("-weight_decay_cnn", dest="weight_decay_cnn", type=float,
         default=d.weight_decay_cnn)
    flag("-optim", dest="optim", default=d.optim,
         choices=["adam", "sgd", "rmsprop"])
    flag("-maxseqlen", dest="maxseqlen", type=int, default=d.maxseqlen)
    flag("-gt_maxseqlen", dest="gt_maxseqlen", type=int, default=d.gt_maxseqlen)
    flag("-best_val_loss", dest="best_val_loss", type=float,
         default=d.best_val_loss)
    flag("--crop", dest="crop", action="store_true", default=d.crop)
    flag("--smooth_curves", dest="smooth_curves", action="store_true",
         default=d.smooth_curves)

    # encoder fine-tuning / curriculum
    flag("-finetune_after", dest="finetune_after", type=int,
         default=d.finetune_after)
    flag("--update_encoder", dest="update_encoder", action="store_true",
         default=d.update_encoder)
    flag("--transfer", dest="transfer", action="store_true", default=d.transfer)
    flag("-transfer_from", dest="transfer_from", default=d.transfer_from)
    flag("-torch_encoder", dest="torch_encoder", default=d.torch_encoder)
    flag("--curriculum_learning", dest="curriculum_learning",
         action="store_true", default=d.curriculum_learning)
    flag("-steps_cl", dest="steps_cl", type=int, default=d.steps_cl)
    flag("-min_steps", dest="min_steps", type=int, default=d.min_steps)
    flag("-min_delta", dest="min_delta", type=float, default=d.min_delta)

    # loss schedule
    flag("-class_loss_after", dest="class_loss_after", type=int,
         default=d.class_loss_after)
    flag("--use_class_loss", dest="use_class_loss", action="store_true",
         default=d.use_class_loss)
    flag("-stop_loss_after", dest="stop_loss_after", type=int,
         default=d.stop_loss_after)
    flag("--use_stop_loss", dest="use_stop_loss", action="store_true",
         default=d.use_stop_loss)

    # stopping criterion
    flag("-patience", dest="patience", type=int, default=d.patience)
    flag("-patience_stop", dest="patience_stop", type=int,
         default=d.patience_stop)
    flag("-max_epoch", dest="max_epoch", type=int, default=d.max_epoch)

    # visualization and logging
    flag("-print_every", dest="print_every", type=int, default=d.print_every)
    flag("--log_term", dest="log_term", action="store_true", default=d.log_term)
    flag("--visdom", dest="visdom", action="store_true", default=d.visdom)
    flag("-port", dest="port", type=int, default=d.port)
    flag("-server", dest="server", default=d.server)

    # loss weights
    flag("-class_weight", dest="class_weight", type=float,
         default=d.class_weight)
    flag("-iou_weight", dest="iou_weight", type=float, default=d.iou_weight)
    flag("-stop_weight", dest="stop_weight", type=float, default=d.stop_weight)
    flag("-stop_balance_weight", dest="stop_balance_weight", type=float,
         default=d.stop_balance_weight)

    # augmentation
    flag("--augment", dest="augment", action="store_true", default=d.augment)
    flag("--host_augment", dest="augment_on_device", action="store_false",
         default=d.augment_on_device)
    flag("-checkpoint_format", dest="checkpoint_format",
         choices=["msgpack", "orbax"], default=d.checkpoint_format)
    flag("-rotation", dest="rotation", type=int, default=d.rotation)
    flag("-translation", dest="translation", type=float, default=d.translation)
    flag("-shear", dest="shear", type=float, default=d.shear)
    flag("-zoom", dest="zoom", type=float, default=d.zoom)

    # hardware (legacy GPU flags accepted and ignored; TPU knobs added)
    flag("--cpu", dest="use_gpu", action="store_false", default=d.use_gpu)
    flag("-ngpus", dest="ngpus", type=int, default=d.ngpus)
    flag("-num_devices", dest="num_devices", type=int, default=d.num_devices)
    flag("-coordinator", dest="coordinator", type=str, default=d.coordinator)
    flag("-num_processes", dest="num_processes", type=int,
         default=d.num_processes)
    flag("-process_id", dest="process_id", type=int, default=d.process_id)
    flag("--multihost", dest="multihost", action="store_true",
         default=d.multihost)
    flag("-compute_dtype", dest="compute_dtype", default=d.compute_dtype,
         choices=["float32", "bfloat16"])
    flag("-pallas", dest="pallas", default=d.pallas,
         choices=["auto", "on", "off"])
    flag("-remat", dest="remat", default=d.remat,
         choices=["auto", "on", "off"])

    # model
    flag("-base_model", dest="base_model", default=d.base_model,
         choices=["resnet101", "resnet50", "resnet34", "vgg16", "tiny"])
    flag("-skip_mode", dest="skip_mode", default=d.skip_mode,
         choices=["sum", "concat", "mul", "none"])
    flag("-model_name", dest="model_name", default=d.model_name)
    flag("-log_file", dest="log_file", default=d.log_file)
    flag("-hidden_size", dest="hidden_size", type=int, default=d.hidden_size)
    flag("-kernel_size", dest="kernel_size", type=int, default=d.kernel_size)
    flag("-dropout", dest="dropout", type=float, default=d.dropout)
    flag("-dropout_stop", dest="dropout_stop", type=float,
         default=d.dropout_stop)
    flag("-dropout_cls", dest="dropout_cls", type=float, default=d.dropout_cls)

    # dataset
    flag("-imsize", dest="imsize", type=int, default=d.imsize)
    flag("--resize", dest="resize", action="store_true", default=d.resize)
    flag("-num_classes", dest="num_classes", type=int, default=d.num_classes)
    flag("-dataset", dest="dataset", default=d.dataset,
         choices=["pascal", "cityscapes", "leaves", "synthetic"])
    flag("-pascal_dir", dest="pascal_dir", default=d.pascal_dir)
    flag("-cityscapes_dir", dest="cityscapes_dir", default=d.cityscapes_dir)
    flag("-leaves_dir", dest="leaves_dir", default=d.leaves_dir)
    flag("-leaves_test_dir", dest="leaves_test_dir", default=d.leaves_test_dir)
    flag("-num_workers", dest="num_workers", type=int, default=d.num_workers)
    flag("-synthetic_length", dest="synthetic_length", type=int,
         default=d.synthetic_length)
    flag("-synthetic_max_instances", dest="synthetic_max_instances",
         type=int, default=d.synthetic_max_instances)
    flag("-models_root", dest="models_root", default=d.models_root)

    # testing
    flag("-eval_split", dest="eval_split", default=d.eval_split)
    flag("-mask_th", dest="mask_th", type=float, default=d.mask_th)
    flag("-stop_th", dest="stop_th", type=float, default=d.stop_th)
    flag("-class_th", dest="class_th", type=float, default=d.class_th)
    flag("-max_dets", dest="max_dets", type=int, default=d.max_dets)
    flag("-min_size", dest="min_size", type=float, default=d.min_size)
    flag("-cat_id", dest="cat_id", type=int, default=d.cat_id)
    flag("--ignore_cats", dest="use_cats", action="store_false",
         default=d.use_cats)
    flag("--display", dest="display", action="store_true", default=d.display)
    flag("--no_display_text", dest="no_display_text", action="store_true",
         default=d.no_display_text)
    flag("--all_classes", dest="all_classes", action="store_true",
         default=d.all_classes)
    flag("--no_run_coco_eval", dest="no_run_coco_eval", action="store_true",
         default=d.no_run_coco_eval)
    flag("--display_route", dest="display_route", action="store_true",
         default=d.display_route)
    flag("-predict_input", dest="predict_input", default=d.predict_input)
    flag("-predict_output", dest="predict_output", default=d.predict_output)
    flag("-predict_format", dest="predict_format",
         choices=["png", "coco", "both"], default=d.predict_format)
    return p


def config_from_args(argv=None) -> Config:
    ns = get_parser().parse_args(argv)
    return Config.from_dict(vars(ns))
