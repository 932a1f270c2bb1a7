"""IUV prediction heads.

Parity: reference `models/module/res_module.py:281-390` (`IUV_predict_layer`):
four 3x3 conv heads over the backbone feature map — U (25), V (25), patch
index (25), ann index (15) — a 24-joint heatmap head (3 Bottlenecks + conv),
and, for the decomposed model, the grouped partial-IUV head mapping the 24
stacked part-feature crops to 24 x (3 x 7) channels in one groups=24 conv.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.constants import ANN_CHANNELS, IUV_CHANNELS
from danet_densepose2smpl_tpu.nn.layers import Bottleneck, ResLayer


def _head_init():
    return nn.initializers.normal(stddev=0.001)


class IUVPredictHead(nn.Module):
    """Global IUV heads + SMPL-joint heatmap head.

    Input (B, H, W, C) backbone features. Returns dict with channels-last
    maps: u/v/index (B, H, W, 25), ann (B, H, W, 15), heatmaps (B, H, W, 24).
    """

    num_joints: int = 24
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats):
        def head(out_ch, name):
            return nn.Conv(
                out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                kernel_init=_head_init(), name=name,
            )(feats)

        out = {
            "u": head(IUV_CHANNELS, "predict_u"),
            "v": head(IUV_CHANNELS, "predict_v"),
            "index": head(IUV_CHANNELS, "predict_uv_index"),
            "ann": head(ANN_CHANNELS, "predict_ann_index"),
        }

        feat_dim = feats.shape[-1]
        hm = ResLayer(
            Bottleneck, feat_dim // 4, 3, train=self.train, axis_name=self.axis_name,
            name="hm_trunk",
        )(feats)
        out["heatmaps"] = nn.Conv(
            self.num_joints, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
            kernel_init=_head_init(), name="predict_hm",
        )(hm)
        return out


class _GroupedConvParams(nn.Module):
    """Parameter holder for the grouped partial head (same tree path as the
    former nn.Conv: predict_partial_iuv/{kernel, bias}) so the standard and
    Pallas-fused forward paths share one set of weights."""

    in_per_group: int
    out_total: int

    @nn.compact
    def __call__(self):
        # explicit float32 param dtype: raw self.param initializers default
        # to float64 under jax_enable_x64 (the f64 checkpoint-parity tests),
        # whereas nn.Conv's param_dtype always defaults to float32
        kernel = self.param(
            "kernel", _head_init(), (3, 3, self.in_per_group, self.out_total),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_total,), jnp.float32)
        return kernel, bias


class PartialIUVHead(nn.Module):
    """Grouped partial-IUV head over the 24 part-feature crops.

    Standard path: input (B, S, S, 24*C) concatenated part crops ->
    groups=24 3x3 conv. Fused path (`fused_inputs`): the crops never
    materialize — kernels/part_crop_head.fused_part_predict computes
    crop+conv per part in VMEM (serving path; identical numerics).
    Output either way: (B, 24, S, S, 3, part_dim) partial IUV stacks
    (part_dim = 1 + 6 simplified patch channels).
    """

    part_dim: int = 7
    num_parts: int = 24

    @nn.compact
    def __call__(self, part_feats=None, fused_inputs=None, interpret=False,
                 part_slice=None):
        k = self.num_parts
        out_total = self.part_dim * 3 * k
        if fused_inputs is not None:
            from danet_densepose2smpl_tpu.kernels.part_crop_head import fused_part_predict

            feats, wy, wx = fused_inputs
            kernel, bias = _GroupedConvParams(
                feats.shape[-1], out_total, name="predict_partial_iuv"
            )()
            out = fused_part_predict(
                feats, wy, wx, kernel, bias, wy.shape[2], interpret=interpret
            )  # (B, K, S, S, 3*part_dim)
            b, _, s = out.shape[:3]
            return out.reshape(b, k, s, s, 3, self.part_dim)

        b, s = part_feats.shape[0], part_feats.shape[1]
        cin = (part_feats.shape[-1] // k if part_slice is None
               else part_feats.shape[-1] // part_slice[1])
        # full 24-group params even when applying a slice, so the chunked
        # serving path (config part_head_chunks) shares the one checkpointed
        # kernel with the standard path
        kernel, bias = _GroupedConvParams(cin, out_total, name="predict_partial_iuv")()
        groups = k
        if part_slice is not None:
            start, count = part_slice
            oc = self.part_dim * 3
            kernel = kernel[..., start * oc : (start + count) * oc]
            bias = bias[start * oc : (start + count) * oc]
            groups = count
        out = jax.lax.conv_general_dilated(
            part_feats, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        ) + bias
        # channel layout per part group: [u(7), v(7), index(7)] x groups ->
        # (B, S, S, groups, 3, 7) -> (B, groups, S, S, 3, 7)
        out = out.reshape(b, s, s, groups, 3, self.part_dim)
        return out.transpose(0, 3, 1, 2, 4, 5)
