"""Loss assembly: DaNet outputs + batch GT -> total loss + per-term dict.

This is the jit-side half of the reference's `Trainer.train_step`
(`train/trainer.py:117-244`) + the loss blocks inside
`IUV_Estimator.forward` / `SMPL_Regressor._forward`. Everything is a pure
function of (cfg, smpl model arrays, model outputs, batch); partial-batch
validity flags arrive as {0,1} float masks.

Batch keys (all optional except img; missing keys skip their loss terms):
  img (B,224,224,3)          normalized RGB
  uv_image_gt (B,56,56,3)    rendered GT IUV image (zeros where ~has_iuv)
  keypoints (B,49,3)         2D keypoints in [-1,1] + confidence
  pose_3d (B,24,4)           3D GT joints + confidence
  target_smpl_kps (B,24,3)   projected GT SMPL joints in [-1,1] + conf
  target_cam (B,3)           weak-perspective GT camera
  opt_betas (B,10), opt_rotmat (B,24,3,3), target_verts (B,V,3)
  dp_dict {...}              sparse DensePose blobs (see losses.dp_uvia_losses)
  has_iuv, has_dp, has_pose_3d, valid_fit (B,)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.models import losses as L
from danet_densepose2smpl_tpu.ops.imwarp import separable_crop_pixel_major
from danet_densepose2smpl_tpu.ops.iuvmap import iuv_img2map
from danet_densepose2smpl_tpu.ops.structure import DP2SMPL_MAPPING
from danet_densepose2smpl_tpu.smpl import SMPLModel, smpl_forward


def _part_selection_tables():
    """One-hot channel-selection tables for `part_iuv_gt_crops`.

    The 24-part gather `m[..., mapping]` is a minor-axis gather that XLA
    lowers pathologically on TPU (same pathology as the CE `take_along_axis`
    fix in models/losses.py); a one-hot selection MATMUL is exact and ~1.5x
    faster end to end (scripts/probe_part_crops.py: 25.3 -> 16.4 ms at B=64,
    max_abs_err 0.0 on chip).

    Returns (M, Cnt): M (75, 24*21) maps the concatenated [u|v|i] 25-ch
    stacks to each part's flat 21-ch layout [u(7), v(7), i(7)] — slot 0 of
    u/v is the zero pad, slot 0 of i is the background (filled separately),
    slots 1..6 are that part's 6 mapped patch channels. Cnt (25, 24) counts,
    per part, how many mapped index channels fire at a pixel (duplicates in
    a mapping row double-count, matching the production sum-over-gathered
    test exactly).
    """
    mapping = np.asarray(DP2SMPL_MAPPING)                      # (24, 6)
    n_parts, n_sel = mapping.shape
    c = 25
    m = np.zeros((3 * c, n_parts * 21), np.float32)
    cnt = np.zeros((c, n_parts), np.float32)
    for k in range(n_parts):
        for j in range(n_sel):
            m[mapping[k, j], k * 21 + 1 + j] = 1.0             # u
            m[c + mapping[k, j], k * 21 + 8 + j] = 1.0         # v
            m[2 * c + mapping[k, j], k * 21 + 15 + j] = 1.0    # i
            cnt[mapping[k, j], k] += 1.0
    return m, cnt


_PART_SEL_M, _PART_SEL_CNT = _part_selection_tables()


def part_iuv_gt_crops(u_gt, v_gt, index_gt, theta, stop_grad: bool = True):
    """Build the 24-part simplified GT IUV crops with the predictor's thetas.

    Parity: reference `part_iuv_simp` + per-part grid_sample
    (`iuv_estimator.py:217-230`, `:422-445`): per part, gather its 6 mapped
    patch channels from the GT stacks, prepend a background channel (1 where
    no mapped patch is present — index stack only), and crop with the
    (gradient-stopped) STN theta.

    The channel gather and the crops are fused as matmuls: a one-hot
    selection einsum replaces the minor-axis `m[..., mapping]` gather (exact;
    see `_part_selection_tables`), and the separable crop einsums consume the
    pixel-major selected layout directly — no part-major transpose ever
    materializes. Crop weights run at HIGHEST so bf16 matmuls don't quantize
    the GT UV targets.

    u/v/index_gt: (B, S, S, 25); theta: (B, 24, 2, 3).
    Returns (B, 24, S, S, 3, 7).
    """
    b, s = u_gt.shape[0], u_gt.shape[1]
    dt = u_gt.dtype
    n_parts = _PART_SEL_CNT.shape[1]
    sel_m = jnp.asarray(_PART_SEL_M, dtype=dt)
    cnt_m = jnp.asarray(_PART_SEL_CNT, dtype=dt)

    uvi = jnp.concatenate([u_gt, v_gt, index_gt], axis=-1)     # (B, S, S, 75)
    sel = jnp.einsum("bhwc,cd->bhwd", uvi, sel_m,
                     precision=jax.lax.Precision.HIGHEST)       # one-hot: exact
    sel = sel.reshape(b, s, s, n_parts, 21)
    gi_sum = jnp.einsum("bhwc,ck->bhwk", index_gt, cnt_m,
                        precision=jax.lax.Precision.HIGHEST)
    bg = (gi_sum < 0.5).astype(dt)                             # (B, S, S, 24)
    sel = sel.at[..., 14].set(bg)                              # i-stack slot 0

    if stop_grad:
        theta = jax.lax.stop_gradient(theta)
    centers = jnp.stack([theta[..., 0, 2], theta[..., 1, 2]], axis=-1)
    crops = separable_crop_pixel_major(
        sel, centers, theta[..., 0, 0], s, precision=jax.lax.Precision.HIGHEST
    )
    return crops.reshape(b, n_parts, s, s, 3, 7)


def compute_losses(
    cfg: DaNetConfig,
    smpl: SMPLModel,
    out: dict,
    batch: dict,
    pretrain_mode: bool = False,
    openpose_weight: float = 0.0,
    gt_weight: float = 1.0,
):
    """Returns (total_loss, {name: value})."""
    losses = {}
    raw = out["iuv_raw"]
    has_iuv = batch["has_iuv"]

    # --- dense IUV supervision vs the rendered GT ---
    if "uv_image_gt" in batch:
        u_g, v_g, i_g, a_g = iuv_img2map(batch["uv_image_gt"])
        lu, lv, li, la = L.body_uv_losses(
            raw["u"], raw["v"], raw["index"], raw["ann"], u_g, v_g, i_g, a_g, has_iuv, cfg
        )
        losses.update(loss_U=lu, loss_V=lv, loss_IndexUV=li, loss_segAnn=la)

        if cfg.decomposed and "stn_theta" in raw:
            part_gt = part_iuv_gt_crops(u_g, v_g, i_g, raw["stn_theta"])
            lpu, lpv, lpi = L.partial_uv_losses(raw["part_iuv"], part_gt, has_iuv, cfg)
            losses.update(loss_pU=lpu, loss_pV=lpv, loss_pIndexUV=lpi)

    # --- sparse DensePose point supervision ---
    if "dp_dict" in batch:
        ldu, ldv, ldi, lda = L.dp_uvia_losses(
            raw["u"], raw["v"], raw["index"], raw["ann"],
            batch["dp_dict"], batch["has_dp"], cfg,
        )
        losses.update(loss_Udp=ldu, loss_Vdp=ldv, loss_IndexUVdp=ldi, loss_segAnndp=lda)

    # --- STN center supervision ---
    if cfg.decomposed and cfg.stn_kps_weights > 0 and "target_smpl_kps" in batch:
        losses["loss_roi"] = L.stn_losses(raw["stn_centers"], batch["target_smpl_kps"], cfg)
    if cfg.decomposed and cfg.stn_hm_weights > 0 and "target_smpl_kps" in batch and "heatmaps" in raw:
        losses["loss_stnhm"] = L.stn_heatmap_loss(
            raw["heatmaps"], batch["target_smpl_kps"], cfg
        )

    if pretrain_mode:
        total = sum(losses.values())
        return total, losses

    # --- SMPL-side losses ---
    pred_rotmat = out["pred_rotmat"]
    pred_betas = out["pred_shape"]
    pred_cam = out["pred_cam"]
    has_smpl = batch["valid_fit"]
    gt_rotmat = batch["opt_rotmat"]
    gt_betas = batch["opt_betas"]

    lp, lb = L.smpl_param_losses(pred_rotmat, pred_betas, gt_rotmat, gt_betas, has_smpl, cfg)
    losses.update(smpl_pose=lp, smpl_betas=lb)

    if cfg.orthogonal_weights > 0:
        losses["Rs_orth"] = L.orthogonal_loss(pred_rotmat, cfg)

    smpl_out = smpl_forward(smpl, pred_betas, pred_rotmat)
    kp2d = L.reproject(smpl_out.joints, pred_cam, float(cfg.img_size))
    losses["keypoints_2d"] = (
        L.keypoint_2d_loss(kp2d, batch["keypoints"], openpose_weight, gt_weight) * cfg.proj_kps_weights
    )
    if "pose_3d" in batch:
        losses["keypoints_3d"] = (
            L.keypoint_3d_loss(smpl_out.joints, batch["pose_3d"], batch["has_pose_3d"]) * cfg.kps3d_weights
        )
    if cfg.verts_weights > 0 and "target_verts" in batch:
        losses["smpl_verts"] = L.vertex_loss(smpl_out.vertices, batch["target_verts"], has_smpl) * cfg.verts_weights

    loss_cam, loss_depth = L.cam_losses(pred_cam, batch["target_cam"], has_smpl)
    losses["cam"] = loss_cam
    losses["cam_depth"] = loss_depth

    # --- intermediate refinement supervision ---
    gt_rot_flat = gt_rotmat.reshape(gt_rotmat.shape[0], -1)
    for i, jr in enumerate(out.get("joint_rotation", [])):
        losses[f"joint_rotation{i}"] = L.aux_rotation_loss(jr, gt_rot_flat, has_smpl, cfg)
    jps = out.get("joint_position", [])
    if jps and cfg.joint_position_weights > 0:
        gt_joints = smpl_forward(smpl, jax.lax.stop_gradient(gt_betas), jax.lax.stop_gradient(gt_rotmat)).smpl_joints
        for i, jp in enumerate(jps):
            losses[f"joint_position{i}"] = L.aux_position_loss(jp, gt_joints, has_smpl, cfg)

    total = sum(losses.values())
    return total, losses
