"""COCO keypoint evaluation harness.

Parity: reference `eval_coco.py:46-173` — per batch: model inference -> SMPL
joints -> 24-GT-joint block -> COCO-17 selection (J24_TO_JCOCO) ->
perspective projection to crop pixels -> inverse crop transform back to
original image coordinates -> OKS AP (numpy COCOeval equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.constants import FOCAL_LENGTH, IMG_RES, J24_TO_JCOCO
from danet_densepose2smpl_tpu.data.transforms import get_transform
from danet_densepose2smpl_tpu.eval.metrics import keypoint_oks_ap
from danet_densepose2smpl_tpu.ops.projection import perspective_projection
from danet_densepose2smpl_tpu.smpl import SMPLModel, smpl_forward


def transform_preds(coords: np.ndarray, center, scale, res) -> np.ndarray:
    """Crop-space pixel coords -> original-image coords (float inverse of
    the crop transform; reference `utils/transforms.py:49-54`)."""
    t = np.linalg.inv(get_transform(center, scale, res))
    homo = np.concatenate([coords, np.ones((coords.shape[0], 1))], axis=1)
    return (homo @ t.T)[:, :2]


def make_coco_step(infer_fn, smpl: SMPLModel, img_res: int = IMG_RES):
    @jax.jit
    def step(images):
        para = infer_fn(images)
        cam = para[:, :3]
        betas = para[:, 3:13]
        rotmat = para[:, 13:].reshape(-1, 24, 3, 3)
        out = smpl_forward(smpl, betas, rotmat)
        j_coco = out.joints[:, 25:][:, jnp.asarray(J24_TO_JCOCO)]
        b = j_coco.shape[0]
        tz = 2.0 * FOCAL_LENGTH / (img_res * cam[:, 0] + 1e-9)
        cam_t = jnp.stack([cam[:, 1], cam[:, 2], tz], axis=-1)
        kp = perspective_projection(
            j_coco, jnp.broadcast_to(jnp.eye(3), (b, 3, 3)), cam_t,
            FOCAL_LENGTH, jnp.zeros((b, 2)),
        )
        return kp + img_res / 2.0

    return step


def run_coco_eval(
    infer_fn,
    loader,
    smpl: SMPLModel,
    img_res: int = IMG_RES,
    log_every: int = 10,
):
    """Returns (ap_dict, all_preds (N, 17, 3) in original image coords).

    Each loader batch must carry img/center/scale/keypoints (GT keypoints in
    [-1, 1] crop coords; used to build the OKS ground truth).
    """
    step = make_coco_step(infer_fn, smpl, img_res)

    preds_list, gts_list = [], []
    all_preds = []
    for b, batch in loader:
        coords = np.asarray(step(jnp.asarray(batch["img"])))
        center = np.asarray(batch["center"])
        scale = np.asarray(batch["scale"])
        kp_gt = np.asarray(batch["keypoints"])  # (B, 49, 3) in [-1, 1]

        for i in range(coords.shape[0]):
            pred_orig = transform_preds(coords[i], center[i], float(scale[i]), (img_res, img_res))
            pred = np.concatenate([pred_orig, np.ones((17, 1))], axis=1)
            all_preds.append(pred)

            gt24 = kp_gt[i, 25:]
            gt_coco = gt24[J24_TO_JCOCO].copy()
            gt_px = 0.5 * img_res * (gt_coco[:, :2] + 1.0)
            gt_orig = transform_preds(gt_px, center[i], float(scale[i]), (img_res, img_res))
            vis = (gt_coco[:, 2] > 0).astype(np.float64) * 2
            area = (scale[i] * 200.0) ** 2
            preds_list.append([{"keypoints": pred, "score": 1.0}])
            gts_list.append([{"keypoints": np.concatenate([gt_orig, vis[:, None]], 1), "area": float(area)}])

        if log_every and b % log_every == 0:
            print(f"coco eval batch {b}")

    ap = keypoint_oks_ap(preds_list, gts_list)
    return ap, np.stack(all_preds) if all_preds else np.zeros((0, 17, 3))
