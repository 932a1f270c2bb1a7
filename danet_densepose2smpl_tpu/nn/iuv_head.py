"""IUV prediction heads.

Parity: reference `models/module/res_module.py:281-390` (`IUV_predict_layer`):
four 3x3 conv heads over the backbone feature map — U (25), V (25), patch
index (25), ann index (15) — a 24-joint heatmap head (3 Bottlenecks + conv),
and, for the decomposed model, the grouped partial-IUV head mapping the 24
stacked part-feature crops to 24 x (3 x 7) channels in one groups=24 conv.
"""

from __future__ import annotations

import flax.linen as nn
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


class PartialIUVHead(nn.Module):
    """Grouped partial-IUV head over the 24 part-feature crops.

    Input (B, S, S, 24*C) concatenated part crops; output
    (B, 24, S, S, 3, part_dim) partial IUV stacks (part_dim = 1 + 6 simplified
    patch channels).
    """

    part_dim: int = 7
    num_parts: int = 24

    @nn.compact
    def __call__(self, part_feats):
        b, s = part_feats.shape[0], part_feats.shape[1]
        out = nn.Conv(
            self.part_dim * 3 * self.num_parts,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.num_parts,
            kernel_init=_head_init(),
            name="predict_partial_iuv",
        )(part_feats)
        # channel layout per part group: [u(7), v(7), index(7)] x 24 ->
        # (B, S, S, 24, 3, 7) -> (B, 24, S, S, 3, 7)
        out = out.reshape(b, s, s, self.num_parts, 3, self.part_dim)
        return out.transpose(0, 3, 1, 2, 4, 5)
