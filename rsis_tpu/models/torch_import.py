"""PyTorch weight import: reference / torchvision state_dicts -> flax params.

The reference ships pretrained checkpoints as torch state_dicts
(``encoder.pt`` / ``decoder.pt``, reference: src/utils/utils.py:89-111) and
initialises backbones from torchvision ImageNet weights (reference:
src/modules/model.py:25-34). This module maps those key layouts onto the
rsis_tpu flax modules so the bit-parity checks demanded by BASELINE.md can
load the original weights.

Layout conventions:
  torch Conv2d weight  (O, I, kH, kW)  ->  flax kernel (kH, kW, I, O)
  torch Linear weight  (O, I)          ->  flax kernel (I, O)
  torch BatchNorm weight/bias          ->  flax scale/bias (params)
        running_mean/running_var       ->  flax mean/var  (batch_stats)

``module.``-prefixed keys (DataParallel checkpoints) are stripped, matching
``check_parallel`` (reference: src/utils/utils.py:12-32).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_parallel_prefix(sd: Mapping[str, object]) -> Dict[str, object]:
    """Remove DataParallel ``module.`` prefixes if present."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return dict(sd)


def _conv(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)


def _linear(sd, key):
    return _np(sd[key]).transpose(1, 0)


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def import_resnet(sd: Mapping[str, object], stage_sizes, bottleneck=True,
                  prefix: str = "") -> Tuple[dict, dict]:
    """torchvision ResNet state_dict -> (params, batch_stats) for ResNetTaps."""
    p: dict = {}
    s: dict = {}
    p["conv1"] = {"kernel": _conv(sd, prefix + "conv1.weight")}
    p["bn1"], s["bn1"] = _bn(sd, prefix + "bn1")
    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            tk = f"{prefix}layer{stage + 1}.{b}."
            name = f"layer{stage + 1}_{b}"
            bp: dict = {}
            bs: dict = {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = {"kernel": _conv(sd, tk + f"conv{c}.weight")}
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, tk + f"bn{c}")
            if tk + "downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd, tk + "downsample.0.weight")}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, tk + "downsample.1")
            p[name] = bp
            s[name] = bs
    return p, s


def import_vgg16(sd: Mapping[str, object],
                 prefix: str = "") -> Tuple[dict, dict]:
    """torchvision VGG16 features state_dict -> (params, {}) for VGG16Taps."""
    # conv layer indices in torchvision's features Sequential
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    p: dict = {}
    for n, pos in enumerate(conv_positions):
        p[f"conv{n}"] = {
            "kernel": _conv(sd, f"{prefix}features.{pos}.weight"),
            "bias": _np(sd[f"{prefix}features.{pos}.bias"]),
        }
    return p, {}


def import_encoder(sd: Mapping[str, object], base_model: str,
                   stage_sizes=None) -> Tuple[dict, dict]:
    """Reference encoder.pt state_dict -> FeatureExtractor (params, stats)."""
    sd = strip_parallel_prefix(sd)
    if base_model == "vgg16":
        base_p, base_s = import_vgg16(sd, prefix="base.")
    else:
        sizes = stage_sizes or {
            "resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3),
            "resnet101": (3, 4, 23, 3)}[base_model]
        base_p, base_s = import_resnet(sd, sizes,
                                       bottleneck=base_model != "resnet34",
                                       prefix="base.")
    p = {"base": base_p}
    s = {"base": base_s}
    for i in range(1, 6):
        p[f"sk{i}"] = {"kernel": _conv(sd, f"sk{i}.weight"),
                       "bias": _np(sd[f"sk{i}.bias"])}
        p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"bn{i}")
    return p, s


def import_decoder(sd: Mapping[str, object]) -> dict:
    """Reference decoder.pt state_dict -> RSISDecoder params."""
    sd = strip_parallel_prefix(sd)
    p: dict = {}
    i = 0
    while f"clstm_list.{i}.Gates.weight" in sd:
        p[f"clstm{i}"] = {"gates": {
            "kernel": _conv(sd, f"clstm_list.{i}.Gates.weight"),
            "bias": _np(sd[f"clstm_list.{i}.Gates.bias"]),
        }}
        i += 1
    p["conv_out"] = {"kernel": _conv(sd, "conv_out.weight"),
                     "bias": _np(sd["conv_out.bias"])}
    p["fc_class"] = {"kernel": _linear(sd, "fc_class.weight"),
                     "bias": _np(sd["fc_class.bias"])}
    p["fc_stop"] = {"kernel": _linear(sd, "fc_stop.weight"),
                    "bias": _np(sd["fc_stop.bias"])}
    return p


_STAGE_SIZES = {"resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3),
                "resnet101": (3, 4, 23, 3)}


def load_state_dict_file(path: str) -> Dict[str, object]:
    """Load a torch state_dict from .pt/.pth (via torch) or .npz (numpy —
    the torch-free fallback; export with
    ``np.savez(path, **{k: v.numpy() for k, v in sd.items()})``)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        sd = sd["state_dict"]
    return dict(sd)


def init_encoder_from_torch(path: str, base_model: str, variables: dict
                            ) -> dict:
    """Merge pretrained encoder weights into a fresh variables pytree.

    The reference *always* trains from an ImageNet-pretrained backbone
    (reference: src/modules/model.py:25-34); this is the fresh-start twin.
    Two accepted layouts, auto-detected:

    - a reference ``encoder.pt`` (FeatureExtractor: ``base.*`` backbone +
      ``sk*``/``bn*`` skip heads) — replaces the whole encoder subtree;
    - a torchvision backbone state_dict (``conv1.weight`` /
      ``features.0.weight`` at the top level) — replaces only
      ``encoder["base"]``; the skip heads keep their fresh init, exactly
      like the reference's constructor.

    Returns a new variables pytree; the input is not mutated.
    """
    sd = strip_parallel_prefix(load_state_dict_file(path))
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    enc_p = dict(params["encoder"])
    enc_s = dict(stats["encoder"])
    if any(k.startswith("sk1.") for k in sd):
        new_p, new_s = import_encoder(sd, base_model)
        enc_p, enc_s = new_p, new_s
    elif base_model == "vgg16":
        enc_p["base"], _ = import_vgg16(sd)
    elif base_model in _STAGE_SIZES:
        enc_p["base"], enc_s["base"] = import_resnet(
            sd, _STAGE_SIZES[base_model],
            bottleneck=base_model != "resnet34")
    else:
        raise ValueError(
            f"no torch import layout for base_model={base_model!r}")
    params["encoder"] = enc_p
    stats["encoder"] = enc_s
    return {"params": params, "batch_stats": stats}


def import_reference_checkpoint(encoder_sd, decoder_sd, base_model: str):
    """Both reference state_dicts -> rsis_tpu variables pytree."""
    enc_p, enc_s = import_encoder(encoder_sd, base_model)
    dec_p = import_decoder(decoder_sd)
    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s},
    }
