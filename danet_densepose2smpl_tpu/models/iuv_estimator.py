"""IUV estimator: image -> global IUV maps + joint-centric part crops.

Parity: reference `models/danet/iuv_estimator.py` — HRNet/PoseResNet backbone
-> IUV heads (global U/V/Index/Ann + 24 joint heatmaps), soft-argmax joint
centers, kinematic-scale STN parameters with learned per-joint ratio/offset,
24 affine feature crops, grouped partial-IUV head.

TPU-native differences: the 24-iteration STN loop becomes one separable
matmul crop (MXU forward and backward); part-visibility scoring is a single masked channel-max +
batched point sample; train-time jitters draw from explicit flax RNG streams
('jitter') instead of global torch RNG. All shapes static.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.nn.hrnet import PoseHighResolutionNet
from danet_densepose2smpl_tpu.nn.iuv_head import IUVPredictHead, PartialIUVHead
from danet_densepose2smpl_tpu.nn.resnet import PoseResNet
from danet_densepose2smpl_tpu.ops.imwarp import (
    crop_theta,
    separable_crop,
    separable_crop_concat,
)
from danet_densepose2smpl_tpu.ops.iuvmap import iuvmap_clean
from danet_densepose2smpl_tpu.ops.keypoints import soft_argmax_2d
from danet_densepose2smpl_tpu.ops.structure import (
    SMPL_CHILD2,
    SMPL_PARENT,
    smpl2dp_channel_mask,
)

# Shipped STN crop parameters (reference data/pretrained_model/learned_ratio.pkl,
# loaded at iuv_estimator.py:21-31). Non-trainable in 'iuv' mode, like the
# reference's register_buffer.
LEARNED_RATIO = np.array(
    [0.6827488, 1.2050959, 1.1849039, 1.3892102, 1.0949879, 1.0947448,
     1.6018374, 1.0222101, 1.0536219, 0.8735159, 0.35833353, 0.44389617,
     1.0155953, 1.2463734, 1.2582259, 0.5802805, 1.1734062, 1.2033107,
     1.1978842, 1.204344, 0.84852725, 0.8551517, 0.46325213, 0.3972259],
    dtype=np.float32,
)
LEARNED_OFFSET = np.array(
    [0.09105359, 0.02297057, 0.02257976, 0.2006476, 0.01430975, 0.01649577,
     0.11027719, 0.06102319, 0.06142722, 0.16606377, 0.7373183, 0.7548186,
     0.07830715, 0.15315747, 0.14974837, 0.25240502, 0.06382725, 0.06352104,
     0.046521, 0.0466027, 0.06009533, 0.05492286, 0.21719937, 0.21409516],
    dtype=np.float32,
)


def point_sample(maps: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample channel k of `maps` at point k (per-part scoring).

    maps: (B, H, W, K); pts: (B, K, 2) normalized [-1, 1] (x, y),
    align_corners=False, zero padding — matches the reference's per-part
    `F.grid_sample(score_map, center)` loop (iuv_estimator.py:176-187).
    Returns (B, K).
    """
    b, h, w, k = maps.shape
    fx = (pts[..., 0] + 1.0) * (w / 2.0) - 0.5
    fy = (pts[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0, y0 = jnp.floor(fx), jnp.floor(fy)
    tx, ty = fx - x0, fy - y0

    ks = jnp.arange(k)[None, :]
    bs = jnp.arange(b)[:, None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        vals = maps[bs, jnp.clip(yi, 0, h - 1).astype(jnp.int32), jnp.clip(xi, 0, w - 1).astype(jnp.int32), ks]
        return vals * valid.astype(maps.dtype)

    top = tap(y0, x0) * (1 - tx) + tap(y0, x0 + 1) * tx
    bot = tap(y0 + 1, x0) * (1 - tx) + tap(y0 + 1, x0 + 1) * tx
    return top * (1 - ty) + bot * ty


def stn_affine_params(
    centers: jnp.ndarray,
    ratio: jnp.ndarray,
    offset: jnp.ndarray,
    part_hidden: jnp.ndarray | None = None,
    scale_jitter: float = 0.0,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-part STN (theta, scale) from joint centers.

    Vectorized reference `affine_para` (iuv_estimator.py:262-301): part 0
    scales to the keypoint bounding box; others to 2x the larger of the
    half-distances to parent/child, then learned ratio/offset; hidden parts
    fall back to 0.8x the box scale. Scale jitter is applied twice when
    active, matching the reference's duplicated jitter block (:284-291).
    Centers/scales are gradient-stopped (reference detaches both).
    """
    centers = jax.lax.stop_gradient(centers)
    box_diag = centers.max(axis=1) - centers.min(axis=1)         # (B, 2)
    scale_box = box_diag.max(axis=-1) / 2.0                      # (B,)

    d_child = jnp.linalg.norm(centers[:, SMPL_CHILD2] - centers, axis=-1) / 2.0
    d_parent = jnp.linalg.norm(centers[:, SMPL_PARENT] - centers, axis=-1) / 2.0
    scale = 2.0 * jnp.maximum(d_child, d_parent)                 # (B, 24)
    scale = scale.at[:, 0].set(scale_box)
    scale = jax.lax.stop_gradient(scale)

    scale = scale * nn.relu(ratio)[None, :] + nn.relu(offset)[None, :]

    def jitter(s, key):
        return s * (1 + scale_jitter * (jax.random.uniform(key, s.shape) - 0.5))

    if scale_jitter > 0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        scale = jitter(scale, k1)

    if part_hidden is not None:
        fallback = 0.8 * scale_box[:, None]
        hide = part_hidden.at[:, 0].set(False)  # root never falls back
        scale = jnp.where(hide, fallback, scale)

    if scale_jitter > 0 and rng is not None:
        scale = jitter(scale, k2)

    theta = crop_theta(centers, scale)
    return theta, scale


class IUVEstimator(nn.Module):
    cfg: DaNetConfig
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> dict:
        """image: (B, 224, 224, 3) normalized RGB.

        Returns dict with channels-last predictions:
          u/v/index (B, 56, 56, 25); ann (B, 56, 56, 15);
          heatmaps (B, 56, 56, 24); stn_centers (B, 24, 2) in [-1, 1];
          stn_theta (B, 24, 2, 3); stn_scale (B, 24);
          part_iuv (B, 24, 56, 56, 3, 7); feats (B, 56, 56, C).
        """
        c = self.cfg
        backbone_cls = PoseHighResolutionNet if c.iuv_regressor == "hrnet" else PoseResNet
        remat_on = c.remat_backbone and self.train
        # remat_scope='modules' checkpoints each HRNet stage module instead
        # of the whole backbone: same recompute FLOPs, strictly lower peak
        # HBM (the backward holds one module's activations, not all of them).
        # 'early' additionally EXCLUDES stage4 from remat: its activations
        # stay live and its re-forward (the heaviest ~half of the backbone
        # FLOPs) is skipped — HBM headroom spent on step time.
        per_module = (remat_on and c.remat_scope in ("modules", "early")
                      and c.iuv_regressor == "hrnet")
        if remat_on and not per_module:
            # jax.checkpoint over the whole backbone: activations are
            # recomputed in the backward pass instead of held in HBM
            backbone_cls = nn.remat(backbone_cls)
        if c.iuv_regressor == "hrnet":
            from danet_densepose2smpl_tpu.nn.hrnet import (
                HRNET_W48_STAGES,
                HRNET_W48_STAGES_PADDED,
            )

            stages = HRNET_W48_STAGES_PADDED if c.hrnet_pad_channels else HRNET_W48_STAGES
            feats = backbone_cls(
                stages=stages, train=self.train, axis_name=self.axis_name,
                remat_modules=per_module,
                remat_skip_stages=(4,) if c.remat_scope == "early" else (),
                name="backbone",
            )(image)
        else:
            feats = backbone_cls(resnet_nums=c.msres_num_layers, train=self.train, axis_name=self.axis_name, name="backbone")(image)

        preds = IUVPredictHead(train=self.train, axis_name=self.axis_name, name="iuv_head")(feats)
        out = dict(preds)
        out["feats"] = feats

        if not c.decomposed:
            return out

        # learned STN ratio/offset; buffers in 'iuv' mode, trainable in
        # 'iuv_gt' (reference iuv_estimator.py:26-31)
        ratio = self.param("stn_ratio", lambda k: jnp.asarray(LEARNED_RATIO))
        off = self.param("stn_offset", lambda k: jnp.asarray(LEARNED_OFFSET))
        if c.input_mode != "iuv_gt":
            ratio = jax.lax.stop_gradient(ratio)
            off = jax.lax.stop_gradient(off)

        hm = preds["heatmaps"]
        s = hm.shape[1]
        centers = soft_argmax_2d(hm, temperature=10.0)  # (B, 24, 2) pixels
        centers = centers / (0.5 * s) - 1.0
        out["stn_centers"] = centers

        jitter_rng = None
        if self.train and (c.stn_center_jitter > 0 or c.stn_scale_jitter > 0):
            jitter_rng = self.make_rng("jitter")
            if c.stn_center_jitter > 0:
                jitter_rng, k = jax.random.split(jitter_rng)
                centers = centers + c.stn_center_jitter * (jax.random.uniform(k, centers.shape) - 0.5)

        # part visibility: max cleaned-index response of the joint's patch
        # channels at its center
        part_hidden = None
        if c.stn_part_vis_score > 0:
            _, _, index_cl, _ = iuvmap_clean(preds["u"], preds["v"], preds["index"], preds["ann"])
            mask = jnp.asarray(smpl2dp_channel_mask())      # (24, 25)
            score_maps = jnp.max(
                index_cl[:, :, :, None, :] * mask[None, None, None, :, :], axis=-1
            )  # (B, H, W, 24)
            scores = point_sample(jax.lax.stop_gradient(score_maps), jax.lax.stop_gradient(centers))
            part_hidden = scores < c.stn_part_vis_score
            out["part_vis_scores"] = scores

        theta, scale = stn_affine_params(
            centers, ratio, off, part_hidden,
            scale_jitter=c.stn_scale_jitter if self.train else 0.0,
            rng=jitter_rng,
        )
        if c.input_mode != "iuv_gt":
            theta = jax.lax.stop_gradient(theta)
        out["stn_theta"] = theta
        out["stn_scale"] = scale

        # diagonal thetas -> separable matmul crops (MXU fwd + bwd; the
        # gather form's scatter-add backward dominated the TPU train step).
        # Optional Pallas kernel fuses crop+head in VMEM so the
        # (B, 24, S, S, C) crop tensor never hits HBM; forward-only and
        # currently opt-in (see core/config.py fused_part_head).
        use_fused = (
            not self.train
            and c.fused_part_head
            and jax.default_backend() not in ("cpu",)
        )
        if c.input_mode in ("iuv_feat", "iuv_gt_feat", "feat"):
            # the *_feat ablations feed the STN feature crops themselves to
            # the SMPL regressor (reference iuv_estimator.py:213-214 emits
            # 'part_featmaps'); thetas are already gradient-stopped above,
            # the features are not — matching the reference
            crops = separable_crop(feats, theta[..., :, 2], theta[..., 0, 0], s)
            out["part_feats"] = crops                       # (B, 24, S, S, C)
            b = crops.shape[0]
            part_feats = crops.transpose(0, 2, 3, 1, 4).reshape(b, s, s, -1)
            out["part_iuv"] = PartialIUVHead(name="partial_head")(part_feats)
        elif use_fused:
            from danet_densepose2smpl_tpu.ops.imwarp import _axis_weights

            hh, ww = feats.shape[1:3]
            scales_t = theta[..., 0, 0]
            wy = _axis_weights(theta[..., 1, 2], scales_t, hh, s, feats.dtype)
            wx = _axis_weights(theta[..., 0, 2], scales_t, ww, s, feats.dtype)
            out["part_iuv"] = PartialIUVHead(name="partial_head")(
                fused_inputs=(feats, wy, wx)
            )
        elif c.part_head_chunks > 1:
            # chunked-memory mode: the (B, S, S, 24*C) crop tensor (and its
            # 2.3x-lane-padded einsum intermediate — the minor w=56 dim pads
            # to 128) is the peak-HBM driver at large batch (B=512 bf16
            # serving = 3.7 GB of crops; B=128 bf16 TRAINING without
            # backbone remat = 2x1.97 GB temps, the allocation that OOM'd
            # no-remat by 127 MB in r5). Crop+head runs per part chunk,
            # order-forced through an optimization_barrier (identity under
            # autodiff, so the training path shares it) — peak crop memory
            # divides by part_head_chunks. Same params, same numerics as
            # the one-shot path.
            head = PartialIUVHead(name="partial_head")
            pc = 24 // c.part_head_chunks
            chunk_outs = []
            feats_g = feats
            for g in range(c.part_head_chunks):
                sl = slice(g * pc, (g + 1) * pc)
                pf = separable_crop_concat(
                    feats_g, theta[:, sl, :, 2], theta[:, sl, 0, 0], s
                )
                o = head(pf, part_slice=(g * pc, pc))
                chunk_outs.append(o)
                feats_g, _ = jax.lax.optimization_barrier((feats, o))
            out["part_iuv"] = jnp.concatenate(chunk_outs, axis=1)
        else:
            part_feats = separable_crop_concat(feats, theta[..., :, 2], theta[..., 0, 0], s)
            out["part_iuv"] = PartialIUVHead(name="partial_head")(part_feats)
        return out
