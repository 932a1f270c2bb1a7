"""Offline dataset preprocessing: DensePose-COCO json -> SPIN-format npz.

Parity: reference `datasets/preprocess/dp_coco.py` — `db_coco_extract`
walks the densepose_coco json, keeps annotations with DensePose labels,
derives center/scale from the bbox, synthesizes 24 SMPL 2D keypoints from
the 17 COCO keypoints (`kp_coco2smpl` averaging rules), and stores the raw
dp annotation for per-sample blob processing at train time. No pycocotools
needed (plain json + the native RLE codec).
"""

from __future__ import annotations

import json
import os

import numpy as np

# COCO keypoint order: 0 nose, 1-2 eyes, 3-4 ears, 5-6 shoulders,
# 7-8 elbows, 9-10 wrists, 11-12 hips, 13-14 knees, 15-16 ankles.
# Direct SMPL<-COCO joint correspondences (limbs); reference dp_coco.py:104-110.
SMPL_FROM_COCO_DIRECT = (
    (1, 11), (2, 12), (4, 13), (5, 14), (7, 15), (8, 16),
    (16, 5), (17, 6), (18, 7), (19, 8), (20, 9), (21, 10),
)


def kp_coco2smpl(coco_kps: np.ndarray) -> np.ndarray:
    """(17, 3) COCO keypoints (x, y, vis) -> (24, 3) SMPL 2D keypoints with
    confidence channel — the reference's synthesis rules
    (dp_coco.py:103-150): direct limb mappings at half the COCO confidence,
    then cascading mid-point constructions (pelvis from hips, neck from
    shoulders, head from neck+nose, spine chain, collars, hands/feet copy
    wrists/ankles) at confidence 0.5."""
    kp = np.zeros((24, 3), np.float64)
    for sj, cj in SMPL_FROM_COCO_DIRECT:
        kp[sj, :2] = coco_kps[cj, :2]
        kp[sj, 2] = coco_kps[cj, 2] / 2.0

    def mid(a, b):
        return (a[:2] + b[:2]) / 2.0

    if (coco_kps[[11, 12], 2] > 0).all():
        kp[0] = [*mid(coco_kps[11], coco_kps[12]), 0.5]
    if (coco_kps[[5, 6], 2] > 0).all():
        kp[12] = [*mid(coco_kps[5], coco_kps[6]), 0.5]
    if kp[12, 2] > 0 and coco_kps[0, 2] > 0:
        kp[15] = [*mid(kp[12], coco_kps[0]), 0.5]
    if kp[0, 2] > 0 and kp[12, 2] > 0:
        kp[6] = [*mid(kp[0], kp[12]), 0.5]
        kp[9] = kp[6].copy()
    if kp[0, 2] > 0 and kp[6, 2] > 0:
        kp[3] = [*mid(kp[0], kp[6]), 0.5]
    if kp[9, 2] > 0 and kp[16, 2] > 0:
        kp[13] = [*mid(kp[9], kp[16]), 0.5]
    if kp[9, 2] > 0 and kp[17, 2] > 0:
        kp[14] = [*mid(kp[9], kp[17]), 0.5]
    for src, dst in ((7, 10), (8, 11), (20, 22), (21, 23)):
        if kp[src, 2] > 0:
            kp[dst] = [*kp[src, :2], 0.5]
    return kp


def db_coco_extract(json_path: str, out_npz: str, min_dp_points: int = 1) -> int:
    """densepose_coco json -> SPIN npz with imgname/center/scale/part/
    smpl_2dkps/dp_annot columns. Returns the number of samples written."""
    with open(json_path) as f:
        db = json.load(f)

    images = {im["id"]: im for im in db["images"]}
    rows = {k: [] for k in ("imgname", "center", "scale", "part", "smpl_2dkps", "dp_annot")}

    for ann in db["annotations"]:
        if "dp_masks" not in ann or ann.get("num_keypoints", 0) == 0:
            continue
        if len(ann.get("dp_x", [])) < min_dp_points:
            continue
        im = images[ann["image_id"]]
        x, y, w, h = ann["bbox"]
        center = [x + w / 2.0, y + h / 2.0]
        scale = max(w, h) / 200.0 * 1.1  # bbox -> SPIN box with margin

        kps = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        kps[:, 2] = (kps[:, 2] > 0).astype(np.float64)
        part24 = np.zeros((24, 3))
        part24[:17] = kps  # COCO kps in the GT-24 layout used at eval

        rows["imgname"].append(im["file_name"])
        rows["center"].append(center)
        rows["scale"].append(scale)
        rows["part"].append(part24)
        rows["smpl_2dkps"].append(kp_coco2smpl(kps))
        rows["dp_annot"].append(
            {
                "bbox": ann["bbox"],
                "dp_masks": ann.get("dp_masks"),
                "dp_I": ann["dp_I"],
                "dp_U": ann["dp_U"],
                "dp_V": ann["dp_V"],
                "dp_x": ann["dp_x"],
                "dp_y": ann["dp_y"],
            }
        )

    n = len(rows["imgname"])
    os.makedirs(os.path.dirname(out_npz) or ".", exist_ok=True)
    np.savez(
        out_npz,
        imgname=np.array(rows["imgname"]),
        center=np.array(rows["center"], np.float64),
        scale=np.array(rows["scale"], np.float64),
        part=np.array(rows["part"], np.float64),
        smpl_2dkps=np.array(rows["smpl_2dkps"], np.float64),
        dp_annot=np.array(rows["dp_annot"], dtype=object),
    )
    return n
