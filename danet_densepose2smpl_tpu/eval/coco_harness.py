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
from danet_densepose2smpl_tpu.eval.metrics import keypoint_oks_ap, rescore_detections
from danet_densepose2smpl_tpu.ops.projection import perspective_projection
from danet_densepose2smpl_tpu.smpl import SMPLModel, smpl_forward


def transform_preds(coords: np.ndarray, center, scale, res) -> np.ndarray:
    """Crop-space pixel coords -> original-image coords (float inverse of
    the crop transform; reference `utils/transforms.py:49-54`)."""
    t = np.linalg.inv(get_transform(center, scale, res))
    homo = np.concatenate([coords, np.ones((coords.shape[0], 1))], axis=1)
    return (homo @ t.T)[:, :2]


def make_coco_step(infer_fn, smpl: SMPLModel, img_res: int = IMG_RES, fg_conf: bool = False):
    """Jitted batch step: images -> (COCO-17 crop-pixel keypoints, per-
    keypoint confidences).

    With `fg_conf`, `infer_fn` returns `(para, fg_prob)` where fg_prob is
    the (B, S, S) predicted foreground probability (1 - P(background) of
    the 25-ch part-index softmax); confidence is fg_prob bilinearly sampled
    at each projected joint. The reference's pose-estimation lineage scores
    keypoints by heatmap maxvals (`coco_keypoint_dataset.py:316-340`); the
    projected-SMPL path has no per-joint heatmap maxval, so body-evidence-
    at-the-projected-joint is the analogous graded signal — it makes
    `rescore_detections`'s PR ordering non-degenerate (without it every
    score is box_score, reference eval_coco.py behavior)."""
    from danet_densepose2smpl_tpu.ops.imwarp import grid_sample_bilinear

    @jax.jit
    def step(images):
        if fg_conf:
            para, fg_prob = infer_fn(images)
        else:
            para, fg_prob = infer_fn(images), None
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
        ) + img_res / 2.0
        if fg_prob is None:
            conf = jnp.ones(kp.shape[:2], kp.dtype)
        else:
            grid = 2.0 * kp / img_res - 1.0                    # (B, 17, 2)
            conf = jax.vmap(
                lambda f, g: grid_sample_bilinear(f[..., None], g[:, None, :])[:, 0, 0]
            )(fg_prob, grid)
        return kp, conf

    return step


def image_id_from_name(imgname: str) -> int:
    """COCO image id from a val2014 path — reference
    `coco_keypoint_dataset.py:312` parses `int(img_path[-16:-4])`; fall back
    to any digits in the basename, then to a hash, for synthetic fixtures."""
    import os
    import re

    base = os.path.basename(str(imgname))
    tail = str(imgname)[-16:-4]
    if tail.isdigit():
        return int(tail)
    m = re.search(r"(\d+)", base)
    if m:
        return int(m.group(1))
    return abs(hash(base)) % (1 << 31)


def load_coco_gt(gt_json: str) -> list:
    """Ground-truth list for `keypoint_oks_ap` from a COCO person-keypoints
    annotation json — the exact GT COCOeval sees (crowd + zero-keypoint
    annotations become ignore regions)."""
    import json

    with open(gt_json) as f:
        coco = json.load(f)
    person_ids = {c["id"] for c in coco.get("categories", []) if c.get("name", "person") == "person"}
    gts = []
    for ann in coco["annotations"]:
        if person_ids and ann.get("category_id") not in person_ids:
            continue
        kp = np.asarray(ann["keypoints"], dtype=np.float64).reshape(-1, 3)
        gts.append({
            "image_id": int(ann["image_id"]),
            "keypoints": kp,
            "area": float(ann["area"]),
            "bbox": [float(v) for v in ann["bbox"]],
            "iscrowd": int(ann.get("iscrowd", 0)),
        })
    return gts


def run_coco_eval(
    infer_fn,
    loader,
    smpl: SMPLModel,
    img_res: int = IMG_RES,
    log_every: int = 10,
    imgnames=None,
    gt_json: str | None = None,
    fg_conf: bool = False,
):
    """Returns (stats_dict, all_preds (N, 17, 3) in original image coords).

    Detections are grouped per true COCO image (multi-person images evaluate
    jointly) and rescored per person by mean keypoint confidence x box score
    (reference `coco_keypoint_dataset.py:287-340`). With `fg_conf` (see
    `make_coco_step`), per-keypoint confidences come from the predicted
    foreground probability at each projected joint, giving a non-degenerate
    PR ordering; without it, confidences are 1 and the rescored score
    equals the box score (the reference eval_coco.py behavior). GT comes
    from `gt_json` when given (exact COCOeval ground truth incl. crowd
    regions); otherwise it is rebuilt from the npz keypoints with bbox area
    from center/scale.

    Each loader batch must carry img/center/scale/keypoints (GT keypoints in
    [-1, 1] crop coords) and sample indices b into `imgnames`.
    """
    step = make_coco_step(infer_fn, smpl, img_res, fg_conf=fg_conf)

    detections, gts_list = [], []
    all_preds = []
    n_done = 0
    for b, batch in loader:
        coords, confs = step(jnp.asarray(batch["img"]))
        coords, confs = np.asarray(coords), np.asarray(confs)
        center = np.asarray(batch["center"])
        scale = np.asarray(batch["scale"])
        kp_gt = np.asarray(batch["keypoints"])  # (B, 49, 3) in [-1, 1]
        idxs = np.asarray(batch["sample_index"]) if "sample_index" in batch else np.arange(
            n_done, n_done + coords.shape[0]
        )

        for i in range(coords.shape[0]):
            img_id = (
                image_id_from_name(imgnames[int(idxs[i])])
                if imgnames is not None
                else int(idxs[i])
            )
            pred_orig = transform_preds(coords[i], center[i], float(scale[i]), (img_res, img_res))
            pred = np.concatenate([pred_orig, confs[i][:, None].astype(np.float64)], axis=1)
            all_preds.append(pred)
            detections.append({"image_id": img_id, "keypoints": pred, "box_score": 1.0})

            if gt_json is None:
                gt24 = kp_gt[i, 25:]
                gt_coco = gt24[J24_TO_JCOCO].copy()
                gt_px = 0.5 * img_res * (gt_coco[:, :2] + 1.0)
                gt_orig = transform_preds(gt_px, center[i], float(scale[i]), (img_res, img_res))
                vis = (gt_coco[:, 2] > 0).astype(np.float64) * 2
                box = float(scale[i]) * 200.0
                gts_list.append({
                    "image_id": img_id,
                    "keypoints": np.concatenate([gt_orig, vis[:, None]], 1),
                    "area": float(box * box),
                    "bbox": [float(center[i][0] - box / 2), float(center[i][1] - box / 2), box, box],
                })

        n_done += coords.shape[0]
        if log_every and b % log_every == 0:
            print(f"coco eval batch {b}")

    if gt_json is not None:
        gts_list = load_coco_gt(gt_json)

    rescore_detections(detections)
    ap = keypoint_oks_ap(detections, gts_list)
    return ap, np.stack(all_preds) if all_preds else np.zeros((0, 17, 3))
