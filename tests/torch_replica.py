"""Shim: the torch replica now lives in the package proper so the
verify_parity CLI can use it (rsis_tpu/models/torch_ref.py); tests keep
importing it from here."""

from rsis_tpu.models.torch_ref import *  # noqa: F401,F403
from rsis_tpu.models.torch_ref import (  # noqa: F401
    BasicBlock, Bottleneck, ConvLSTMCell, FeatureExtractor, ResNetTaps,
    RSISDecoder, VGG16Taps, randomize_bn_stats)
