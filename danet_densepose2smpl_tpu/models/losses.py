"""Training losses — mask-weighted, fixed-shape, jit-safe.

Parity targets:
  * IUV map losses           — reference `iuv_estimator.py:304-341` (body_uv_losses)
  * sparse DensePose losses  — reference `iuv_estimator.py:343-419` (dp_uvia_losses)
  * STN losses               — reference `iuv_estimator.py:142-171`
  * SMPL-side losses         — reference `smpl_regressor.py:130-298`

The reference boolean-gathers valid samples (`x[mask==1]`) and branches on
`sum(mask)>0`; here every loss is a weighted sum over the fixed-shape batch
with the same normalization (validated in tests against a torch
transcription), so the whole loss tree lives inside one jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.ops.imwarp import grid_sample_bilinear
from danet_densepose2smpl_tpu.ops.projection import perspective_projection


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def _safe_div(num, den):
    return num / jnp.maximum(den, 1e-12)


def cross_entropy_int(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels over the last logits axis.

    Selects logp[label] by a one-hot contraction, NOT take_along_axis: XLA
    lowers the per-element gather (and its scatter-add transpose) terribly on
    TPU — measured 82.0 ms vs 4.1 ms for the one-hot form on the partial-IUV
    loss shape (B=64, 24x56x56x7) on v5e, bit-identical results
    (scripts/probe_partial_loss.py). The class axis is tiny everywhere this
    is used (7/15/25), so the K-fold broadcast is cheap.

    Out-of-range labels (e.g. -1 or >= num_classes) produce an all-zero
    one-hot row and therefore contribute CE = 0 — they are silently ignored,
    NOT clamped to a real class the way take_along_axis would. All current
    callers pass in-range int32 labels (argmax outputs, dp_annot int32
    fields); a future ignore-label convention can rely on the zero-loss
    semantics, but callers expecting clamping must mask explicitly."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * oh, axis=-1)


# --------------------------------------------------------------------------
# IUV map losses (dense, against rendered GT)
# --------------------------------------------------------------------------

def body_uv_losses(
    u_pred, v_pred, index_pred, ann_pred,
    u_gt, v_gt, index_gt, ann_gt,
    has_iuv, cfg: DaNetConfig,
):
    """Dense IUV losses. All maps channels-last (B, H, W, C); `index_gt` is
    the one-hot GT stack; `has_iuv` (B,) in {0,1}.

    Reference semantics (iuv_estimator.py:304-341): U/V smooth-l1 summed over
    foreground pixels of valid samples, divided by the FULL batch size;
    index/ann cross-entropy averaged over all pixels of valid samples.
    """
    b = u_pred.shape[0]
    w = has_iuv.astype(u_pred.dtype)
    wpix = w[:, None, None]

    fg = (index_gt > 0).astype(u_pred.dtype)  # (B, H, W, 25)
    loss_u = jnp.sum(smooth_l1(u_pred - u_gt) * fg * wpix[..., None]) / b
    loss_v = jnp.sum(smooth_l1(v_pred - v_gt) * fg * wpix[..., None]) / b

    i_target = jnp.argmax(index_gt, axis=-1)
    ce_i = cross_entropy_int(index_pred, i_target)                 # (B, H, W)
    loss_index = _safe_div(jnp.sum(ce_i * wpix), jnp.sum(wpix) * ce_i.shape[1] * ce_i.shape[2])

    loss_u = loss_u * cfg.point_regression_weights
    loss_v = loss_v * cfg.point_regression_weights

    loss_ann = None
    if ann_pred is not None:
        a_target = jnp.argmax(ann_gt, axis=-1)
        ce_a = cross_entropy_int(ann_pred, a_target)
        loss_ann = _safe_div(jnp.sum(ce_a * wpix), jnp.sum(wpix) * ce_a.shape[1] * ce_a.shape[2])

    return loss_u, loss_v, loss_index, loss_ann


def partial_uv_losses(part_pred, part_gt, has_iuv, cfg: DaNetConfig):
    """Per-part IUV losses summed over the 24 parts / 24 (reference
    iuv_estimator.py:232-252). part_pred/part_gt: (B, 24, S, S, 3, 7)."""
    b, p, s, _, _, k = part_pred.shape
    u_p = part_pred[..., 0, :].reshape(b, p * s, s, k)
    v_p = part_pred[..., 1, :].reshape(b, p * s, s, k)
    i_p = part_pred[..., 2, :].reshape(b, p * s, s, k)
    u_g = part_gt[..., 0, :].reshape(b, p * s, s, k)
    v_g = part_gt[..., 1, :].reshape(b, p * s, s, k)
    i_g = part_gt[..., 2, :].reshape(b, p * s, s, k)
    # The reference averages 24 per-part losses. Folding parts into the
    # spatial axis makes the U/V sums equal the 24-part SUM (so divide by p),
    # while the CE pixel-mean is already the 24-part AVERAGE (equal pixel
    # counts per part) — no extra division.
    lu, lv, li, _ = body_uv_losses(u_p, v_p, i_p, None, u_g, v_g, i_g, None, has_iuv, cfg)
    return lu / p, lv / p, li


# --------------------------------------------------------------------------
# Sparse DensePose point losses
# --------------------------------------------------------------------------

def dp_uvia_losses(
    u_pred, v_pred, index_pred, ann_pred,
    dp: dict, has_dp, cfg: DaNetConfig,
):
    """Mask-RCNN body-UV style sparse losses (reference
    iuv_estimator.py:343-419). `dp` carries per-sample blobs:
      x, y          (B, 196) point coords in heatmap pixels
      i_points      (B, 196) GT patch index at each point
      u_points      (B, 25, 196), v_points (B, 25, 196) channel-tiled UV GT
      point_weights (B, 25, 196) indicator weights
      ann_labels    (B, H, W) dense 15-part GT labels
    `has_dp` (B,) masks samples; normalizations follow the reference with the
    valid-sample restriction expressed as weights.
    """
    hm = cfg.heatmap_size
    w = has_dp.astype(u_pred.dtype)
    npts = dp["x"].shape[1]

    # normalized grid coords of the annotated points
    gx = (dp["x"] - hm / 2.0) * (2.0 / hm)
    gy = (dp["y"] - hm / 2.0) * (2.0 / hm)
    grid = jnp.stack([gx, gy], axis=-1)[:, None, :, :]  # (B, 1, 196, 2)

    def sample(m):
        return jax.vmap(grid_sample_bilinear)(m, grid)[:, 0]  # (B, 196, C)

    interp_u = sample(u_pred)
    interp_v = sample(v_pred)
    interp_i = sample(index_pred)

    # point-index CE: mean over valid samples' points
    ce_pts = cross_entropy_int(interp_i, dp["i_points"])  # (B, 196)
    loss_ipoints = _safe_div(jnp.sum(ce_pts * w[:, None]), jnp.sum(w) * npts)
    loss_ipoints = loss_ipoints * cfg.part_weights

    # U/V weighted smooth-l1: the reference reshapes to N=1, i.e. a plain
    # weighted sum over (valid samples x points x channels)
    uw = dp["point_weights"].transpose(0, 2, 1)  # (B, 196, 25)
    u_gt = dp["u_points"].transpose(0, 2, 1)
    v_gt = dp["v_points"].transpose(0, 2, 1)
    wexp = w[:, None, None]
    loss_upoints = jnp.sum(uw * smooth_l1(uw * (interp_u - u_gt)) * wexp) * cfg.point_regression_weights
    loss_vpoints = jnp.sum(uw * smooth_l1(uw * (interp_v - v_gt)) * wexp) * cfg.point_regression_weights

    # dense ann segmentation CE over the 56x56 GT label mask
    ce_ann = cross_entropy_int(ann_pred, dp["ann_labels"])  # (B, H, W)
    loss_ann = _safe_div(jnp.sum(ce_ann * w[:, None, None]), jnp.sum(w) * ce_ann.shape[1] * ce_ann.shape[2])
    loss_ann = loss_ann * cfg.index_weights

    return loss_upoints, loss_vpoints, loss_ipoints, loss_ann


# --------------------------------------------------------------------------
# STN losses
# --------------------------------------------------------------------------

def stn_losses(stn_centers, smpl_kps_gt, cfg: DaNetConfig):
    """Joint-center RoI loss (reference iuv_estimator.py:159-171):
    confidence-weighted smooth-l1 between soft-argmax centers and GT SMPL 2D
    keypoints (both in [-1, 1]), summed and divided by batch size."""
    conf = smpl_kps_gt[..., 2]
    diff = smooth_l1(stn_centers - smpl_kps_gt[..., :2]).sum(-1)
    loss = jnp.sum(conf * diff) / stn_centers.shape[0]
    return loss * cfg.stn_kps_weights


def stn_heatmap_loss(hm_pred, smpl_kps_gt, cfg: DaNetConfig):
    """STN heatmap supervision (reference iuv_estimator.py:142-158): mean
    smooth-l1 between the 24-joint heatmap head output and Gaussian targets
    centered at the GT SMPL keypoints (mapped [-1,1] -> [0,1]).

    hm_pred: (B, H, W, 24) channels-last; smpl_kps_gt: (B, 24, 3)."""
    from danet_densepose2smpl_tpu.ops.keypoints import gaussian_heatmaps

    kps01 = jax.lax.stop_gradient(smpl_kps_gt[..., :2]) * 0.5 + 0.5
    hm_gt, _ = gaussian_heatmaps(kps01, hm_pred.shape[1])
    return jnp.mean(smooth_l1(hm_pred - hm_gt)) * cfg.stn_hm_weights


# --------------------------------------------------------------------------
# SMPL-side losses
# --------------------------------------------------------------------------

def _masked_mean_elems(err, mask_b):
    """Mean over elements of valid samples (torch criterion(x[mask]) style)."""
    w = mask_b.astype(err.dtype).reshape((-1,) + (1,) * (err.ndim - 1))
    per_elem = err.size // err.shape[0]
    return _safe_div(jnp.sum(err * w), jnp.sum(w) * per_elem)


def _l1_sum_over_samples(err, mask_b):
    """Sum of |err| over valid samples / number of valid samples (reference
    l1_losses, smpl_regressor.py:233-238)."""
    w = mask_b.astype(err.dtype).reshape((-1,) + (1,) * (err.ndim - 1))
    return _safe_div(jnp.sum(jnp.abs(err) * w), jnp.sum(mask_b.astype(err.dtype)))


def smpl_param_losses(pred_rotmat, pred_betas, gt_rotmat, gt_betas, has_smpl, cfg: DaNetConfig):
    """MSE on rotmats and betas over valid samples (smpl_regressor.py:287-298)."""
    loss_pose = _masked_mean_elems((pred_rotmat - gt_rotmat) ** 2, has_smpl)
    loss_betas = _masked_mean_elems((pred_betas - gt_betas) ** 2, has_smpl)
    return loss_pose * cfg.smpl_pose_weights, loss_betas * cfg.smpl_betas_weights


def keypoint_2d_loss(pred_kp2d, gt_kp2d, openpose_weight, gt_weight):
    """Confidence-weighted MSE on normalized 2D keypoints
    (smpl_regressor.py:248-257); mean over the full tensor."""
    conf = gt_kp2d[..., 2:3]
    conf = conf.at[:, :25].multiply(openpose_weight)
    conf = conf.at[:, 25:].multiply(gt_weight)
    return jnp.mean(conf * (pred_kp2d - gt_kp2d[..., :2]) ** 2)


def keypoint_3d_loss(pred_joints49, gt_kp3d, has_kp3d):
    """Pelvis-centered confidence-weighted MSE on the 24 GT joints over valid
    samples (smpl_regressor.py:259-276)."""
    pred = pred_joints49[:, 25:, :]
    conf = gt_kp3d[..., -1:]
    gt = gt_kp3d[..., :3]
    gt_pelvis = (gt[:, 2, :] + gt[:, 3, :]) / 2.0
    gt = gt - gt_pelvis[:, None, :]
    pred_pelvis = (pred[:, 2, :] + pred[:, 3, :]) / 2.0
    pred = pred - pred_pelvis[:, None, :]
    err = conf * (pred - gt) ** 2
    return _masked_mean_elems(err, has_kp3d)


def vertex_loss(pred_verts, gt_verts, has_smpl):
    """Per-vertex L1 mean over valid samples (smpl_regressor.py:278-285)."""
    return _masked_mean_elems(jnp.abs(pred_verts - gt_verts), has_smpl)


def cam_losses(pred_cam, gt_cam, has_smpl):
    """L1 camera fit + positive-depth penalty (smpl_regressor.py:196, :218)."""
    loss_cam = _l1_sum_over_samples(pred_cam - gt_cam, has_smpl)
    loss_depth = jnp.mean(jnp.exp(-pred_cam[:, 0] * 10.0) ** 2)
    return loss_cam, loss_depth


def orthogonal_loss(pred_rotmat, cfg: DaNetConfig):
    """Orthogonality regularizer on predicted rotations (reference
    smpl_regressor.py:240-246): MSE between R @ R^T and identity over all
    B*24 rotation matrices."""
    r = pred_rotmat.reshape(-1, 3, 3)
    rrt = jnp.einsum("bij,bkj->bik", r, r)
    return jnp.mean((rrt - jnp.eye(3)) ** 2) * cfg.orthogonal_weights


def aux_rotation_loss(pred_rot_flat, gt_rotmat_flat, has_smpl, cfg: DaNetConfig):
    """Intermediate joint_rotation supervision (smpl_regressor.py:147-155)."""
    return _masked_mean_elems((pred_rot_flat - gt_rotmat_flat) ** 2, has_smpl) * cfg.smpl_pose_weights


def aux_position_loss(pred_coords, gt_smpl_joints, has_smpl, cfg: DaNetConfig):
    """Intermediate joint_position supervision (smpl_regressor.py:157-166)."""
    return _l1_sum_over_samples(pred_coords - gt_smpl_joints, has_smpl) * cfg.joint_position_weights


def reproject(pred_joints, pred_cam, img_size: float, focal_length: float = 5000.0):
    """Weak-perspective reprojection to [-1, 1] image coords
    (smpl_regressor.py:180-193)."""
    b = pred_joints.shape[0]
    tz = 2.0 * focal_length / (img_size * pred_cam[:, 0] + 1e-9)
    cam_t = jnp.stack([pred_cam[:, 1], pred_cam[:, 2], tz], axis=-1)
    kp2d = perspective_projection(
        pred_joints,
        jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        cam_t,
        focal_length,
        jnp.zeros((b, 2)),
    )
    return kp2d / (img_size / 2.0)
