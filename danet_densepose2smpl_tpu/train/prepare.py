"""Device-side GT target preparation — the jitted half of the reference's
`Trainer.train_step` preamble (`train/trainer.py:130-212`).

Given the raw batch + host-side fits lookup results, computes on device:
GT/pseudo SMPL meshes, batched WLS camera fits, projected target SMPL
keypoints, the weak-perspective target camera, and the rendered GT IUV
image. Everything fixed-shape; partial validity is expressed by the
has_iuv / valid_fit masks instead of boolean gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.core.config import Config
from danet_densepose2smpl_tpu.ops.projection import estimate_translation, perspective_projection
from danet_densepose2smpl_tpu.ops.rotations import batch_rodrigues
from danet_densepose2smpl_tpu.smpl import SMPLModel, smpl_forward_aa


def prepare_targets(
    cfg: Config,
    smpl: SMPLModel,
    batch: dict,
    renderer=None,
    is_itw: bool = False,
) -> dict:
    """Extend `batch` with the loss targets. Expects keys: img, keypoints,
    pose, betas, pose_3d, has_smpl, has_pose_3d, has_dp, smpl_2dkps,
    opt_pose, opt_betas, opt_valid (fits lookup), is_dp_dataset (B,).
    """
    img_res = float(cfg.danet.img_size)
    b = batch["img"].shape[0]
    gt_pose = batch["pose"]
    gt_betas = batch["betas"]
    has_smpl = batch["has_smpl"]

    gt_out = smpl_forward_aa(smpl, gt_betas, gt_pose)

    # pseudo fits: extreme betas -> 0; GT overrides where available
    opt_pose = batch["opt_pose"]
    opt_betas = batch["opt_betas"]
    opt_betas = jnp.where(
        (jnp.abs(opt_betas) > 3).any(axis=-1, keepdims=True), 0.0, opt_betas
    )
    m = has_smpl[:, None]
    opt_pose = jnp.where(m > 0, gt_pose, opt_pose)
    opt_betas = jnp.where(m > 0, gt_betas, opt_betas)
    opt_out = smpl_forward_aa(smpl, opt_betas, opt_pose)

    # camera fits against the de-normalized 2D keypoints
    kp = batch["keypoints"]
    kp_orig = kp.at[..., :2].set(0.5 * img_res * (kp[..., :2] + 1.0))
    gt_cam_t = estimate_translation(gt_out.joints, kp_orig, img_size=img_res)
    opt_cam_t = estimate_translation(opt_out.joints, kp_orig, img_size=img_res)

    valid_fit = (
        jnp.maximum(batch["opt_valid"], has_smpl) if is_itw else has_smpl
    )
    has_iuv = (1.0 - batch["is_dp_dataset"]) * valid_fit
    has_dp = batch["has_dp"]

    # target SMPL 2D keypoints in [-1, 1]: projected pseudo-GT joints for
    # rendered-IUV samples, dataset smpl_2dkps for DensePose samples
    proj = perspective_projection(
        jax.lax.stop_gradient(opt_out.smpl_joints),
        jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        opt_cam_t,
        5000.0,
        jnp.full((b, 2), 0.5 * img_res),
    )
    proj = proj / (0.5 * img_res) - 1.0
    target_kps = jnp.concatenate(
        [proj, (has_iuv > 0).astype(proj.dtype)[:, None, None].repeat(24, 1)], axis=-1
    )
    target_kps = jnp.where((has_dp > 0)[:, None, None], batch["smpl_2dkps"], target_kps)

    # weak-perspective camera for the renderer (trainer.py:207-212)
    tz = opt_cam_t[:, 2]
    target_cam = jnp.stack(
        [(2.0 * 5000.0 / img_res) / tz, opt_cam_t[:, 0], opt_cam_t[:, 1]], axis=-1
    )

    out = dict(batch)
    out.update(
        opt_pose=opt_pose,
        opt_betas=opt_betas,
        opt_rotmat=batch_rodrigues(opt_pose.reshape(b * 24, 3)).reshape(b, 24, 3, 3),
        target_verts=jax.lax.stop_gradient(opt_out.vertices),
        target_cam=target_cam,
        target_smpl_kps=target_kps,
        valid_fit=valid_fit,
        has_iuv=has_iuv,
    )
    if renderer is not None:
        uv_gt = renderer(jax.lax.stop_gradient(opt_out.vertices), target_cam)
        out["uv_image_gt"] = uv_gt * (has_iuv > 0).astype(uv_gt.dtype)[:, None, None, None]
    return out
