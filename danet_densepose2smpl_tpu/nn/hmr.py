"""HMR / SPIN baseline: ResNet-50 iterative-error-feedback SMPL regressor.

Parity: reference `models/hmr.py:51-165` — ResNet-50 trunk, global pool,
3 feedback iterations of (concat [feat, pose, shape, cam] -> fc1024 -> drop
-> fc1024 -> drop -> residual decoders), 6D pose output -> rotmats.
Selectable via `--regressor hmr` in the eval CLIs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from danet_densepose2smpl_tpu.nn.layers import Bottleneck, NormAct, ResLayer, conv, max_pool_3x3_s2
from danet_densepose2smpl_tpu.nn.resnet import _xavier_gain
from danet_densepose2smpl_tpu.ops.rotations import rot6d_to_rotmat

NPOSE = 24 * 6


class HMR(nn.Module):
    train: bool = False
    n_iter: int = 3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, init_pose, init_shape, init_cam):
        """x: (B, 224, 224, 3); init_*: mean params (broadcastable to batch).

        Returns (rotmats (B, 24, 3, 3), shape (B, 10), cam (B, 3)).
        """
        b = x.shape[0]
        common = dict(train=self.train, axis_name=self.axis_name)

        x = conv(64, 7, 2, name="conv1")(x)
        x = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(x)
        x = max_pool_3x3_s2(x)
        x = ResLayer(Bottleneck, 64, 3, name="layer1", **common)(x)
        x = ResLayer(Bottleneck, 128, 4, stride=2, name="layer2", **common)(x)
        x = ResLayer(Bottleneck, 256, 6, stride=2, name="layer3", **common)(x)
        x = ResLayer(Bottleneck, 512, 3, stride=2, name="layer4", **common)(x)
        xf = jnp.mean(x, axis=(1, 2))  # (B, 2048)

        fc1 = nn.Dense(1024, name="fc1")
        fc2 = nn.Dense(1024, name="fc2")
        decpose = nn.Dense(NPOSE, kernel_init=_xavier_gain(0.01), name="decpose")
        decshape = nn.Dense(10, kernel_init=_xavier_gain(0.01), name="decshape")
        deccam = nn.Dense(3, kernel_init=_xavier_gain(0.01), name="deccam")

        pose = jnp.broadcast_to(init_pose, (b, NPOSE))
        shape = jnp.broadcast_to(init_shape, (b, 10))
        cam = jnp.broadcast_to(init_cam, (b, 3))
        for i in range(self.n_iter):
            xc = jnp.concatenate([xf, pose, shape, cam], axis=1)
            xc = fc1(xc)
            xc = nn.Dropout(0.5, deterministic=not self.train)(xc)
            xc = fc2(xc)
            xc = nn.Dropout(0.5, deterministic=not self.train)(xc)
            pose = decpose(xc) + pose
            shape = decshape(xc) + shape
            cam = deccam(xc) + cam

        rotmats = rot6d_to_rotmat(pose.reshape(b * 24, 6)).reshape(b, 24, 3, 3)
        return rotmats, shape, cam
