"""HRNet-W48 backbone (pose_hrnet), NHWC.

Parity: reference `models/module/hr_module.py:15-411` with the shipped YAML
spec (`configs/danet_default.yaml:96-140`): stem (2x stride-2 conv) ->
layer1 (4 Bottleneck@64) -> 3 multi-resolution stages of BasicBlocks with
full cross-resolution fusion; stage widths (48, 96, 192, 384); output is the
highest-resolution branch (48 ch at stride 4 = 56x56 for a 224 input).

Module names mirror the reference state_dict layout (conv1/bn1/conv2/bn2/
layer1, transition{s}_{i}, stage{s}_{m} with branch{b} and fuse{i}_{j}
children) so checkpoint porting is name-for-name (port/blocks.py).

TPU notes: fusion upsampling is nearest-neighbor (as torch F.interpolate
nearest) implemented with jnp.repeat — shape-static and fusable; all convs
NHWC so XLA tiles channels onto the 128-lane axis.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from danet_densepose2smpl_tpu.nn.layers import BasicBlock, Bottleneck, NormAct, ResLayer, conv

# (num_modules, num_branches, num_blocks per branch, channels per branch)
HRNET_W48_STAGES = (
    (1, 2, (4, 4), (48, 96)),
    (4, 3, (4, 4, 4), (48, 96, 192)),
    (3, 4, (4, 4, 4, 4), (48, 96, 192, 384)),
)

# MXU-underfill experiment (PERF.md): the 48/96-ch branches leave the
# 128-lane MXU partly idle; this variant zero-pads them to sublane/lane
# multiples (48->64, 96->128; deeper branches already tile). A trained
# 48/96 checkpoint zero-padded into this topology is numerics-identical
# (extra channels carry zero weights/BN-bias, so they stay exactly 0).
HRNET_W48_STAGES_PADDED = (
    (1, 2, (4, 4), (64, 128)),
    (4, 3, (4, 4, 4), (64, 128, 192)),
    (3, 4, (4, 4, 4, 4), (64, 128, 192, 384)),
)


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class HRModule(nn.Module):
    """One multi-resolution module: per-branch residual blocks + full fusion."""

    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    multi_scale_output: bool = True
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs):
        common = dict(train=self.train, axis_name=self.axis_name)
        ys = [
            ResLayer(BasicBlock, self.channels[i], self.num_blocks[i], name=f"branch{i}", **common)(xs[i])
            for i in range(self.num_branches)
        ]

        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = ys[j]
                if j > i:
                    # lower-res -> i: 1x1 conv + BN then nearest upsample
                    y = conv(self.channels[i], 1, name=f"fuse{i}_{j}_conv")(y)
                    y = NormAct(not self.train, relu=False, axis_name=self.axis_name, name=f"fuse{i}_{j}_bn")(y)
                    y = _upsample_nearest(y, 2 ** (j - i))
                elif j < i:
                    # higher-res -> i: (i-j) stride-2 3x3 convs; ReLU between,
                    # none on the last (reference hr_module.py:150-176)
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = conv(
                            self.channels[i] if last else self.channels[j], 3, 2,
                            name=f"fuse{i}_{j}_{k}_conv",
                        )(y)
                        y = NormAct(
                            not self.train, relu=not last, axis_name=self.axis_name,
                            name=f"fuse{i}_{j}_{k}_bn",
                        )(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """HRNet-W48; returns the 48-ch stride-4 feature map (B, 56, 56, 48).

    `remat_modules`: checkpoint each HRModule (and the stem's layer1)
    individually — the per-module remat_scope (see core/config.py). Only the
    branch tensors at module boundaries are saved for the backward; each
    module's internals are recomputed one module at a time, so the backward
    never holds more than one module's activations."""

    stages: Sequence = HRNET_W48_STAGES
    train: bool = False
    axis_name: str | None = None
    remat_modules: bool = False
    # stage numbers (2-based, matching the stage{t} param names) whose
    # modules are NOT rematerialized even when remat_modules is on — their
    # activations stay live, trading HBM for skipped re-forward FLOPs
    # (remat_scope='early' passes (4,): stage4 is ~half the backbone FLOPs)
    remat_skip_stages: Sequence = ()

    @nn.compact
    def __call__(self, x):
        common = dict(train=self.train, axis_name=self.axis_name)
        hr_module = nn.remat(HRModule) if self.remat_modules else HRModule
        res_layer = nn.remat(ResLayer) if self.remat_modules else ResLayer

        # stem: two stride-2 3x3 convs -> 64ch stride 4
        x = conv(64, 3, 2, name="conv1")(x)
        x = NormAct(not self.train, axis_name=self.axis_name, name="bn1")(x)
        x = conv(64, 3, 2, name="conv2")(x)
        x = NormAct(not self.train, axis_name=self.axis_name, name="bn2")(x)
        x = res_layer(Bottleneck, 64, 4, name="layer1", **common)(x)  # -> 256 ch

        xs = [x]
        prev_channels = (256,)
        for s_idx, (num_modules, num_branches, num_blocks, channels) in enumerate(self.stages):
            # transition: adapt existing branches, spawn the new lowest one
            t = s_idx + 1
            new_xs = []
            for i in range(num_branches):
                if i < len(prev_channels):
                    if prev_channels[i] != channels[i]:
                        y = conv(channels[i], 3, name=f"transition{t}_{i}_conv")(xs[i])
                        y = NormAct(not self.train, axis_name=self.axis_name, name=f"transition{t}_{i}_bn")(y)
                    else:
                        y = xs[i]
                else:
                    y = conv(channels[i], 3, 2, name=f"transition{t}_{i}_conv")(xs[-1])
                    y = NormAct(not self.train, axis_name=self.axis_name, name=f"transition{t}_{i}_bn")(y)
                new_xs.append(y)

            last_stage = s_idx == len(self.stages) - 1
            stage_module = HRModule if (t + 1) in tuple(self.remat_skip_stages) else hr_module
            for m in range(num_modules):
                mso = not (last_stage and m == num_modules - 1)
                new_xs = stage_module(
                    num_branches=num_branches,
                    num_blocks=num_blocks,
                    channels=channels,
                    multi_scale_output=mso,
                    name=f"stage{t + 1}_{m}",
                    **common,
                )(new_xs)
            xs = new_xs
            prev_channels = channels

        return xs[0]
