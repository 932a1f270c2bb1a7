"""ResNet variants: PoseResNet backbone, SmplResNet regressors, LimbResLayers.

Parity: reference `models/module/res_module.py:107-278` (PoseResNet: ResNet +
3 deconvs to 56x56), `:393-497` (SmplResNet: configurable-depth ResNet with
avg-pool + linear head, `truncate` cuts trailing stages), `:500-535`
(LimbResLayers: the groups=24 layer4 + pooling that runs all 24 part
networks in one grouped conv — kept as `feature_group_count=24`, the native
XLA grouped-conv form that tiles cleanly onto the MXU).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from danet_densepose2smpl_tpu.nn.layers import (
    RESNET_SPEC,
    NormAct,
    ResLayer,
    conv,
    max_pool_3x3_s2,
)


def _xavier_gain(gain: float):
    """Xavier-uniform init scaled by `gain` (reference uses gain=0.01 on the
    final parameter head, res_module.py:419)."""
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * gain

    return init


class SmplResNet(nn.Module):
    """ResNet trunk + optional global-average-pooled linear head.

    num_classes=0 returns features only; truncate in {0,1,2} removes the
    last stages (reference res_module.py:411-412, 452-453).
    """

    resnet_nums: int
    num_classes: int = 229
    last_stride: int = 2
    truncate: int = 0
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        block, layers = RESNET_SPEC[self.resnet_nums]
        x = conv(64, 7, 2, name="conv1")(x)
        x = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(x)
        x = max_pool_3x3_s2(x)

        common = dict(train=self.train, axis_name=self.axis_name)
        x = ResLayer(block, 64, layers[0], name="layer1", **common)(x)
        x = ResLayer(block, 128, layers[1], stride=2, name="layer2", **common)(x)
        if self.truncate < 2:
            x = ResLayer(block, 256, layers[2], stride=2, name="layer3", **common)(x)
        if self.truncate < 1:
            x = ResLayer(block, 512, layers[3], stride=self.last_stride, name="layer4", **common)(x)

        cls = None
        if self.num_classes > 0:
            pooled = jnp.mean(x, axis=(1, 2))
            cls = nn.Dense(self.num_classes, kernel_init=_xavier_gain(0.01), name="final_layer")(pooled)
        return cls, x


class LimbResLayers(nn.Module):
    """Grouped (24-part) ResNet layer4 + per-part global average pooling.

    Input: (B, H, W, 24*inplanes) concatenated part features.
    Output: (B, 24, outplanes) pooled per-part rotation features.
    """

    resnet_nums: int
    outplanes: int
    groups: int = 24
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        block, layers = RESNET_SPEC[self.resnet_nums]
        x = ResLayer(
            block,
            self.outplanes,
            layers[3],
            stride=2,
            groups=self.groups,
            train=self.train,
            axis_name=self.axis_name,
            name="layer4",
        )(x)
        pooled = jnp.mean(x, axis=(1, 2))  # (B, 24*outplanes*expansion)
        return pooled.reshape(x.shape[0], self.groups, -1)


class DeconvLayer(nn.Module):
    """ConvTranspose k=4 s=2 p=1 + BN + ReLU (torch _make_deconv_layer)."""

    features: int
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=4, s=2, p=1) doubles H/W; flax 'SAME'
        # transpose conv with stride 2 and k=4 matches that geometry.
        x = nn.ConvTranspose(
            features=self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
        )(x)
        return NormAct(not self.train, axis_name=self.axis_name)(x)


class PoseResNet(nn.Module):
    """ResNet-50 + 3 deconv layers -> 256-ch stride-4 feature map (56x56 for
    224 input). The IUV heads attach in the model layer (reference wires
    `final_pred` inside the backbone; we keep the head separate)."""

    resnet_nums: int = 50
    deconv_filters: tuple = (256, 256, 256)
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        block, layers = RESNET_SPEC[self.resnet_nums]
        x = conv(64, 7, 2, name="conv1")(x)
        x = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(x)
        x = max_pool_3x3_s2(x)

        common = dict(train=self.train, axis_name=self.axis_name)
        x = ResLayer(block, 64, layers[0], name="layer1", **common)(x)
        x = ResLayer(block, 128, layers[1], stride=2, name="layer2", **common)(x)
        x = ResLayer(block, 256, layers[2], stride=2, name="layer3", **common)(x)
        x = ResLayer(block, 512, layers[3], stride=2, name="layer4", **common)(x)

        for di, f in enumerate(self.deconv_filters):
            x = DeconvLayer(f, train=self.train, axis_name=self.axis_name, name=f"deconv{di}")(x)
        return x
