"""Backbone CNNs with 5-scale feature taps, in flax (NHWC, TPU layout).

Functional re-designs of the reference's torchvision-subclassed backbones
(reference: src/modules/vision.py:11-115): ResNet-34/50/101 and VGG-16 whose
``__call__`` returns the five intermediate feature scales (x5..x1, coarsest
first) that feed the skip pyramid. Weight layouts are chosen so torchvision
ImageNet state_dicts import directly (see models/torch_import.py):
convs are HWIO, BatchNorm keeps separate scale/bias + running stats.

Compute dtype is configurable (bfloat16 for throughput on the MXU); params
and batch stats stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _max_pool_same(x, window, strides, padding):
    return nn.max_pool(x, window_shape=window, strides=strides,
                       padding=padding)


class BottleneckBlock(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3(stride) -> 1x1 (x4)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """torchvision-style basic block: 3x3(stride) -> 3x3."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetTaps(nn.Module):
    """ResNet trunk returning (x5, x4, x3, x2, x1), coarsest first."""
    stage_sizes: Sequence[int]
    bottleneck: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BottleneckBlock if self.bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x1 = nn.relu(x)
        x = _max_pool_same(x1, (3, 3), (2, 2), ((1, 1), (1, 1)))
        taps = []
        planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            expansion = 4 if self.bottleneck else 1
            for b in range(n_blocks):
                first = b == 0
                need_ds = first and (stride != 1
                                     or x.shape[-1] != planes * expansion)
                x = block_cls(planes=planes, stride=stride if first else 1,
                              downsample=need_ds, dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train=train)
            taps.append(x)
            planes *= 2
        x2, x3, x4, x5 = taps
        return x5, x4, x3, x2, x1


def resnet34(dtype=jnp.float32, **kw):
    return ResNetTaps(stage_sizes=(3, 4, 6, 3), bottleneck=False, dtype=dtype,
                      **kw)


def resnet50(dtype=jnp.float32, **kw):
    return ResNetTaps(stage_sizes=(3, 4, 6, 3), bottleneck=True, dtype=dtype,
                      **kw)


def resnet101(dtype=jnp.float32, **kw):
    return ResNetTaps(stage_sizes=(3, 4, 23, 3), bottleneck=True, dtype=dtype,
                      **kw)


class TinyTaps(nn.Module):
    """Minimal 5-scale trunk for tests and fast experimentation (not part of
    the reference surface). Strides mirror the ResNet tap geometry:
    x1 /2, x2 /4, x3 /8, x4 /16, x5 /32."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (16, 24, 32, 48, 64)
        taps = []
        for i, wd in enumerate(widths):
            x = nn.Conv(wd, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        x1, x2, x3, x4, x5 = taps
        return x5, x4, x3, x2, x1


def tiny(dtype=jnp.float32, **kw):
    return TinyTaps(dtype=dtype, **kw)


_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Taps(nn.Module):
    """VGG-16 features trunk; taps after each maxpool (x1..x5)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = []
        conv_idx = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = _max_pool_same(x, (2, 2), (2, 2), "VALID")
                taps.append(x)
            else:
                x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        x1, x2, x3, x4, x5 = taps
        return x5, x4, x3, x2, x1


def vgg16(dtype=jnp.float32, **kw):
    return VGG16Taps(dtype=dtype, **kw)


# channel widths of (x5..x1) per backbone
# (reference: src/utils/utils.py:129-137 get_skip_dims)
SKIP_DIMS = {
    "tiny": (64, 48, 32, 24, 16),
    "resnet50": (2048, 1024, 512, 256, 64),
    "resnet101": (2048, 1024, 512, 256, 64),
    "resnet34": (512, 256, 128, 64, 64),
    "vgg16": (512, 512, 256, 128, 64),
}

BACKBONES = {
    "tiny": tiny,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "vgg16": vgg16,
}
