"""Bit-parity check against the PyTorch reference forward.

``python -m rsis_tpu.cli.verify_parity encoder.pt decoder.pt`` loads the
reference checkpoints (torch state_dicts or .npz exports), runs the
reference inference forward (encoder -> T fixed decode steps -> bilinear
upsample -> sigmoid; reference: src/test.py:16-50) through BOTH the torch
replica (models/torch_ref.py) and the rsis_tpu forward (evals/forward),
and reports the mean mask-IoU delta — the ≤1e-3 budget of BASELINE.md's
north star. Exits non-zero if the budget is exceeded.

Runs on CPU in f32 by default so the comparison is deterministic; pass
``--device`` to keep the session's default backend (on TPU the platform
matmul default is overridden to 'highest' for the same reason).

Images: deterministic synthetic RGB by default; pass ``-images DIR`` with
.png/.jpg files to check on real data.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="verify_parity",
        description="mean mask-IoU delta of rsis_tpu vs the torch forward")
    p.add_argument("encoder", help="encoder.pt / .pth / .npz state_dict")
    p.add_argument("decoder", help="decoder.pt / .pth / .npz state_dict")
    p.add_argument("-base_model", default="resnet101",
                   choices=["resnet34", "resnet50", "resnet101", "vgg16"])
    p.add_argument("-hidden_size", type=int, default=128)
    p.add_argument("-num_classes", type=int, default=21)
    p.add_argument("-kernel_size", type=int, default=3)
    p.add_argument("-skip_mode", default="concat")
    p.add_argument("-maxseqlen", type=int, default=10)
    p.add_argument("-imsize", type=int, default=256)
    p.add_argument("-imsize_w", type=int, default=0,
                   help="width (default 2*imsize like cityscapes eval)")
    p.add_argument("-n_images", type=int, default=2)
    p.add_argument("-budget", type=float, default=1e-3,
                   help="max allowed mean mask-IoU delta (BASELINE.md)")
    p.add_argument("-images", default="",
                   help="directory of images instead of synthetic inputs")
    p.add_argument("--device", action="store_true",
                   help="keep the default backend instead of forcing CPU")
    return p


def _load_images(args) -> np.ndarray:
    h = args.imsize
    w = args.imsize_w or 2 * args.imsize
    if args.images:
        from PIL import Image
        files = sorted(
            f for f in os.listdir(args.images)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))[:args.n_images]
        if not files:
            raise SystemExit(f"no images found in {args.images}")
        imgs = [np.asarray(
            Image.open(os.path.join(args.images, f)).convert("RGB")
            .resize((w, h), Image.BILINEAR), dtype=np.uint8)
            for f in files]
        raw = np.stack(imgs)
    else:
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 255, (args.n_images, h, w, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return ((raw.astype(np.float32) / 255.0) - mean) / std


def _torch_forward(args, enc_sd, dec_sd, x_nhwc: np.ndarray):
    """Reference test-time forward through the torch replica."""
    import torch
    from ..models import torch_ref as tr
    from ..models.torch_import import strip_parallel_prefix

    stage = {"resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3),
             "resnet101": (3, 4, 23, 3)}
    if args.base_model == "vgg16":
        base = tr.VGG16Taps()
        skip_dims = (512, 512, 256, 128, 64)
    else:
        block = (tr.BasicBlock if args.base_model == "resnet34"
                 else tr.Bottleneck)
        base = tr.ResNetTaps(block, stage[args.base_model])
        mult = 1 if args.base_model == "resnet34" else 4
        skip_dims = (512 * mult, 256 * mult, 128 * mult, 64 * mult, 64)
    enc = tr.FeatureExtractor(base, skip_dims, args.hidden_size,
                              args.kernel_size).eval()
    dec = tr.RSISDecoder(args.hidden_size, args.num_classes,
                         args.kernel_size, args.skip_mode).eval()
    enc.load_state_dict(
        {k: torch.as_tensor(np.asarray(v))
         for k, v in strip_parallel_prefix(enc_sd).items()})
    dec.load_state_dict(
        {k: torch.as_tensor(np.asarray(v))
         for k, v in strip_parallel_prefix(dec_sd).items()})

    x = torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2)))
    masks, clss, stops = [], [], []
    with torch.no_grad():
        feats = enc(x)
        hidden = None
        for _ in range(args.maxseqlen):
            m, c, s, hidden = dec(feats, hidden)
            m = torch.nn.functional.interpolate(
                m, size=x.shape[-2:], mode="bilinear", align_corners=True)
            masks.append(torch.sigmoid(m[:, 0]))
            clss.append(c)
            stops.append(torch.sigmoid(s))
    return (torch.stack(masks, 1).numpy(), torch.stack(clss, 1).numpy(),
            torch.stack(stops, 1).numpy())


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    if not args.device:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from ..config import Config
    from ..evals.forward import run_forward
    from ..models.torch_import import (import_reference_checkpoint,
                                       load_state_dict_file)

    enc_sd = load_state_dict_file(args.encoder)
    dec_sd = load_state_dict_file(args.decoder)
    variables = import_reference_checkpoint(enc_sd, dec_sd, args.base_model)
    cfg = Config(base_model=args.base_model, hidden_size=args.hidden_size,
                 num_classes=args.num_classes, kernel_size=args.kernel_size,
                 skip_mode=args.skip_mode, maxseqlen=args.maxseqlen,
                 imsize=args.imsize, compute_dtype="float32")

    x = _load_images(args)
    print(f"images: {x.shape}  backend: {jax.default_backend()}",
          flush=True)

    m_j, c_j, s_j = run_forward(cfg, variables, x, T=args.maxseqlen)
    m_t, c_t, s_t = _torch_forward(args, enc_sd, dec_sd, x)

    # mean mask-IoU delta: 1 - softIoU(jax_mask, torch_mask), averaged
    # over every (image, step) pair — the BASELINE.md budget metric
    mj = m_j.reshape(m_j.shape[0], m_j.shape[1], -1).astype(np.float64)
    mt = m_t.reshape(m_t.shape[0], m_t.shape[1], -1).astype(np.float64)
    inter = np.minimum(mj, mt).sum(-1)
    union = np.maximum(mj, mt).sum(-1) + 1e-9
    iou_delta = float(np.mean(1.0 - inter / union))

    print(f"mean mask-IoU delta : {iou_delta:.3e}  (budget {args.budget:g})")
    print(f"max |mask delta|    : {np.abs(m_j - m_t).max():.3e}")
    print(f"max |class delta|   : {np.abs(c_j - c_t).max():.3e}")
    print(f"max |stop delta|    : {np.abs(s_j - s_t).max():.3e}")
    ok = iou_delta <= args.budget
    print("PARITY " + ("OK" if ok else "EXCEEDED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
