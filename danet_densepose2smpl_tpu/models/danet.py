"""DaNet: image -> IUV -> SMPL parameters, composed.

Parity: reference `models/danet/danet.py` — routes the image through the IUV
estimator, cleans the predicted maps to one-hot stacks, assembles the 75-ch
global IUV input and the 24x(3x7) partial stacks, applies PartDrop during
training, and runs the SMPL regressor. GT IUV rendering and all losses live
outside the network (kernels/rasterizer + models/losses) so this module
stays a pure function of (params, image, rng).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.models.iuv_estimator import IUVEstimator
from danet_densepose2smpl_tpu.models.smpl_regressor import (
    DecomposedPredictor,
    GlobalPredictor,
    MeanParams,
    default_mean_params,
)
from danet_densepose2smpl_tpu.ops.iuvmap import iuvmap_clean
from danet_densepose2smpl_tpu.ops.structure import DP2SMPL_MAPPING


def partdrop_mask(rng: jax.Array, batch: int, rate: float) -> jnp.ndarray:
    """(B, 24) True where a DensePose patch is dropped (reference
    danet.py:194-203 draws per-sample per-patch uniform < rate)."""
    return jax.random.uniform(rng, (batch, 24)) < rate


def apply_partdrop_global(u, v, index, drop: jnp.ndarray):
    """Zero the channels (patch i -> channel i+1) of dropped patches."""
    keep = 1.0 - drop.astype(u.dtype)                       # (B, 24)
    keep = jnp.concatenate([jnp.ones_like(keep[:, :1]), keep], axis=1)  # bg kept
    keep = keep[:, None, None, :]
    return u * keep, v * keep, index * keep


def apply_partdrop_partial(part_iuv: jnp.ndarray, drop: jnp.ndarray) -> jnp.ndarray:
    """Zero the simplified channels of dropped patches in the partial stacks.

    part_iuv: (B, 24, S, S, 3, 7); local channel j+1 of part p carries patch
    DP2SMPL_MAPPING[p, j] (reference danet.py:251-274).
    """
    # keep[b, p, j] = not drop[b, mapping[p, j] - 1]
    mapping = jnp.asarray(DP2SMPL_MAPPING) - 1               # (24, 6)
    dropped = drop[:, mapping]                                # (B, 24, 6)
    keep = 1.0 - dropped.astype(part_iuv.dtype)
    keep = jnp.concatenate([jnp.ones_like(keep[..., :1]), keep], axis=-1)  # (B, 24, 7)
    return part_iuv * keep[:, :, None, None, None, :]


def clean_part_stacks(part_iuv: jnp.ndarray) -> jnp.ndarray:
    """One-hot-ify each part's 7-ch index stack and mask U/V (the per-part
    iuvmap_clean loop at reference danet.py:276-283, vectorized by folding
    the part axis into batch)."""
    b, p, s, _, _, k = part_iuv.shape
    u = part_iuv[..., 0, :].reshape(b * p, s, s, k)
    v = part_iuv[..., 1, :].reshape(b * p, s, s, k)
    idx = part_iuv[..., 2, :].reshape(b * p, s, s, k)
    cu, cv, ci, _ = iuvmap_clean(u, v, idx)
    out = jnp.stack([cu, cv, ci], axis=-2)                   # (B*P, S, S, 3, 7)
    return out.reshape(b, p, s, s, 3, k)


class DaNet(nn.Module):
    """Full model. `__call__` returns predictions + intermediates; the
    caller (eval harness / train step) derives losses and SMPL outputs."""

    cfg: DaNetConfig
    mean_params: MeanParams | None = None
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        pretrain_mode: bool = False,
        uv_image_gt: jnp.ndarray | None = None,
        smpl_kps_gt: jnp.ndarray | None = None,
    ) -> dict:
        c = self.cfg
        mp = self.mean_params or default_mean_params()

        if c.input_mode == "iuv_gt":
            # oracle ablation (reference danet.py:67-73, iuv_estimator.py:64-89):
            # no backbone — GT IUV maps feed the regressor directly, with STN
            # crops centred on the GT SMPL keypoints
            est = self._oracle_inputs(uv_image_gt, smpl_kps_gt)
        else:
            est = IUVEstimator(c, train=self.train, axis_name=self.axis_name, name="img2iuv")(image)
        out = {"iuv_raw": est}

        # GT part crops bypass the per-part clean: the reference consumes
        # `part_iuv_gt` directly as `part_iuv_map` (danet.py:88-90,249-251)
        # while predicted stacks go through per-part iuvmap_clean (:92-98).
        part_is_gt = c.input_mode == "iuv_gt"

        if c.input_mode == "iuv_gt_feat":
            # global IUV maps come from the GT render, backbone features from
            # the estimator (reference danet.py:74-77,185-187). Training
            # additionally feeds the limb branch GT part crops taken with the
            # estimator's detached STN thetas (reference danet.py:249-262 uses
            # `part_iuv_gt` from iuv_estimator.py:217-248); inference has no
            # GT crops and keeps the estimator's predicted stacks (:75-76,
            # :88-98).
            from danet_densepose2smpl_tpu.ops.iuvmap import iuv_img2map
            from danet_densepose2smpl_tpu.train.objective import part_iuv_gt_crops

            assert uv_image_gt is not None, "input_mode='iuv_gt_feat' needs uv_image_gt"
            u, v, index, ann = iuv_img2map(uv_image_gt)
            if self.train:
                est = dict(est)
                est["part_iuv"] = part_iuv_gt_crops(u, v, index, est["stn_theta"])
                part_is_gt = True
        else:
            u, v, index, ann = est["u"], est["v"], est["index"], est["ann"]
        part_iuv = est.get("part_iuv")

        if self.train and c.partdrop_rate > 0:
            drop = partdrop_mask(self.make_rng("partdrop"), image.shape[0], c.partdrop_rate)
            u, v, index = apply_partdrop_global(u, v, index, drop)
            if part_iuv is not None:
                part_iuv = apply_partdrop_partial(part_iuv, drop)

        u_cl, v_cl, index_cl, ann_cl = iuvmap_clean(u, v, index, ann)
        out["iuv_clean"] = (u_cl, v_cl, index_cl, ann_cl)

        if pretrain_mode:
            return out

        iuv_map = jnp.concatenate([u_cl, v_cl, index_cl], axis=-1)  # (B, S, S, 75)

        # ablation inputs (reference danet.py:293-332): backbone features and
        # their STN crops for the *_feat modes; the cleaned index maps alone
        # for 'seg'
        feat_mode = c.input_mode in ("iuv_feat", "iuv_gt_feat", "feat")
        gfeats = est.get("feats") if feat_mode else None
        pfeats = est.get("part_feats") if feat_mode else None

        if c.decomposed:
            part_map = part_iuv if part_is_gt else clean_part_stacks(part_iuv)
            out["part_iuv_clean"] = part_map
            if c.input_mode == "feat":
                body_in, part_in = None, None
            elif c.input_mode == "seg":
                body_in, part_in = index_cl, part_map[..., 2, :]
            else:
                body_in, part_in = iuv_map, part_map
            smpl_out = DecomposedPredictor(
                c, mp, train=self.train, axis_name=self.axis_name, name="iuv2smpl",
            )(body_in, part_in, global_feats=gfeats, part_feats=pfeats)
        else:
            if c.input_mode == "feat":
                body_in = None
            elif c.input_mode == "seg":
                body_in = index_cl
            else:
                body_in = iuv_map
            smpl_out = GlobalPredictor(
                c, train=self.train, axis_name=self.axis_name, name="iuv2smpl",
            )(body_in, global_feats=gfeats)

        out.update(smpl_out)
        para = smpl_out["para"]
        out["pred_cam"] = para[:, :3]
        out["pred_shape"] = para[:, 3:13]
        out["pred_rotmat"] = para[:, 13:].reshape(-1, 24, 3, 3)
        return out

    def _oracle_inputs(self, uv_image_gt, smpl_kps_gt):
        """'iuv_gt' mode: GT IUV maps + GT-keypoint STN crops, with the
        learned crop ratio/offset trainable (reference
        iuv_estimator.py:26-28, :64-89)."""
        from danet_densepose2smpl_tpu.models.iuv_estimator import (
            LEARNED_OFFSET,
            LEARNED_RATIO,
            stn_affine_params,
        )
        from danet_densepose2smpl_tpu.ops.iuvmap import iuv_img2map
        from danet_densepose2smpl_tpu.train.objective import part_iuv_gt_crops

        assert uv_image_gt is not None and smpl_kps_gt is not None, \
            "input_mode='iuv_gt' needs uv_image_gt and smpl_kps_gt"
        c = self.cfg
        u, v, index, ann = iuv_img2map(uv_image_gt)

        ratio = self.param("stn_ratio", lambda k: jnp.asarray(LEARNED_RATIO))
        off = self.param("stn_offset", lambda k: jnp.asarray(LEARNED_OFFSET))
        centers = smpl_kps_gt[..., :2]
        if self.train and c.stn_center_jitter > 0:
            k = self.make_rng("jitter")
            centers = centers + c.stn_center_jitter * (jax.random.uniform(k, centers.shape) - 0.5)
        theta, scale = stn_affine_params(centers, ratio, off)
        # oracle thetas keep gradients so the learned ratio/offset train
        part_iuv = part_iuv_gt_crops(u, v, index, theta, stop_grad=False)
        return {
            "u": u, "v": v, "index": index, "ann": ann,
            "stn_centers": centers, "stn_theta": theta, "stn_scale": scale,
            "part_iuv": part_iuv,
        }
