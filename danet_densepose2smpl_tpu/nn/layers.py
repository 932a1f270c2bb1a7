"""Residual building blocks (BasicBlock / Bottleneck / ResLayer).

Parity: reference `models/module/res_module.py:27-104`. NHWC layout; grouped
variants use `feature_group_count` (the XLA-native form of torch groups=24
convs). BatchNorm carries an optional `axis_name` for cross-device syncing
under `shard_map` data parallelism (SURVEY.md §5 BN note).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (torch uses 0.1)


class NormAct(nn.Module):
    """BatchNorm (+ optional ReLU) with shared settings."""

    use_running_average: bool
    relu: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=BN_MOMENTUM,
            axis_name=self.axis_name,
            name="norm",
        )(x)
        return nn.relu(x) if self.relu else x


def conv(features: int, kernel: int, stride: int = 1, groups: int = 1, bias: bool = False, name: str | None = None):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=bias,
        feature_group_count=groups,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    train: bool = False
    axis_name: str | None = None

    expansion = 1

    @nn.compact
    def __call__(self, x):
        g = self.groups
        out = conv(self.planes * g, 3, self.stride, groups=g, name="conv1")(x)
        out = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(out)
        out = conv(self.planes * g, 3, groups=g, name="conv2")(out)
        out = NormAct(not self.train, relu=False, axis_name=self.axis_name, name="bn2")(out)

        if self.stride != 1 or x.shape[-1] != self.planes * g:
            x = conv(self.planes * g, 1, self.stride, groups=g, name="downsample_conv")(x)
            x = NormAct(not self.train, relu=False, axis_name=self.axis_name, name="downsample_bn")(x)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    train: bool = False
    axis_name: str | None = None

    expansion = 4

    @nn.compact
    def __call__(self, x):
        g = self.groups
        out = conv(self.planes * g, 1, groups=g, name="conv1")(x)
        out = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(out)
        out = conv(self.planes * g, 3, self.stride, groups=g, name="conv2")(out)
        out = NormAct(not self.train, axis_name=self.axis_name, name="bn2")(out)
        out = conv(self.planes * 4 * g, 1, groups=g, name="conv3")(out)
        out = NormAct(not self.train, relu=False, axis_name=self.axis_name, name="bn3")(out)

        if self.stride != 1 or x.shape[-1] != self.planes * 4 * g:
            x = conv(self.planes * 4 * g, 1, self.stride, groups=g, name="downsample_conv")(x)
            x = NormAct(not self.train, relu=False, axis_name=self.axis_name, name="downsample_bn")(x)
        return nn.relu(out + x)


class ResLayer(nn.Module):
    """A stage of `num_blocks` residual blocks (first carries the stride)."""

    block: Callable  # BasicBlock | Bottleneck class
    planes: int
    num_blocks: int
    stride: int = 1
    groups: int = 1
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = self.block(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                groups=self.groups,
                train=self.train,
                axis_name=self.axis_name,
                name=str(i),
            )(x)
        return x


# depth -> (block class, per-stage block counts); reference res_module.py:100-104
RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """Torch MaxPool2d(kernel=3, stride=2, padding=1) equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
