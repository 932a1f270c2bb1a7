"""Evaluation metrics: MPJPE, segmentation accuracy/F1, COCO keypoint OKS AP.

Parity: reference `eval.py:211-266` (pose + LSP mask/parts) and
`datasets/coco_keypoint_dataset.py:287-443` (pycocotools OKS AP — here a
numpy reimplementation, since pycocotools isn't available).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from danet_densepose2smpl_tpu.ops.procrustes import reconstruction_error


def compute_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray):
    """Per-sample MPJPE and PA-MPJPE (meters). pred/gt: (B, J, 3)."""
    mpjpe = jnp.sqrt(((pred - gt) ** 2).sum(-1)).mean(-1)
    pa = reconstruction_error(pred, gt)
    return mpjpe, pa


@dataclass
class SegmentationScores:
    """Streaming accuracy + per-class F1 (reference eval.py:234-266)."""

    num_classes: int
    correct: float = 0.0
    total: float = 0.0
    tp: np.ndarray = None
    fp: np.ndarray = None
    fn: np.ndarray = None

    def __post_init__(self):
        self.tp = np.zeros(self.num_classes)
        self.fp = np.zeros(self.num_classes)
        self.fn = np.zeros(self.num_classes)

    def update(self, pred: np.ndarray, gt: np.ndarray):
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        self.correct += (pred == gt).sum()
        self.total += gt.size
        for c in range(self.num_classes):
            self.tp[c] += ((pred == c) & (gt == c)).sum()
            self.fp[c] += ((pred == c) & (gt != c)).sum()
            self.fn[c] += ((pred != c) & (gt == c)).sum()

    @property
    def accuracy(self) -> float:
        return float(self.correct / max(self.total, 1))

    @property
    def f1(self) -> np.ndarray:
        return 2 * self.tp / np.maximum(2 * self.tp + self.fp + self.fn, 1e-9)


# COCO 17-keypoint OKS sigmas (person category, pycocotools convention).
COCO_KP_SIGMAS = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
     1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
) / 10.0


def _oks(pred_kp: np.ndarray, gt_kp: np.ndarray, gt_vis: np.ndarray, area: float) -> float:
    """OKS between one detection and one GT (visible joints only)."""
    var = (COCO_KP_SIGMAS * 2) ** 2
    d2 = ((pred_kp[:, 0] - gt_kp[:, 0]) ** 2 + (pred_kp[:, 1] - gt_kp[:, 1]) ** 2)
    e = d2 / var / (area + np.spacing(1)) / 2.0
    vis = gt_vis > 0
    if not vis.any():
        return 0.0
    return float(np.exp(-e[vis]).mean())


def keypoint_oks_ap(
    preds: list,
    gts: list,
    thresholds: np.ndarray | None = None,
):
    """COCOeval-style keypoint AP over OKS thresholds.

    preds: per-image list of dicts {keypoints (17, 3 incl score col), score};
    gts: per-image list of dicts {keypoints (17, 3 with vis), area}.
    Returns dict with AP (mean over .5:.05:.95), AP50, AP75, AR.
    Matches pycocotools' greedy matching with sorted detections.
    """
    ths = thresholds if thresholds is not None else np.arange(0.5, 1.0, 0.05)

    all_matches = []  # (score, is_tp per threshold)
    n_gt = 0
    for img_preds, img_gts in zip(preds, gts):
        n_gt += len(img_gts)
        order = np.argsort([-p["score"] for p in img_preds])
        oks_mat = np.zeros((len(img_preds), len(img_gts)))
        for pi, p in enumerate(img_preds):
            for gi, g in enumerate(img_gts):
                oks_mat[pi, gi] = _oks(
                    np.asarray(p["keypoints"])[:, :2],
                    np.asarray(g["keypoints"])[:, :2],
                    np.asarray(g["keypoints"])[:, 2],
                    g["area"],
                )
        for t in ths:
            taken = np.zeros(len(img_gts), bool)
            for pi in order:
                best, best_g = t, -1
                for gi in range(len(img_gts)):
                    if not taken[gi] and oks_mat[pi, gi] >= best:
                        best, best_g = oks_mat[pi, gi], gi
                is_tp = best_g >= 0
                if is_tp:
                    taken[best_g] = True
                all_matches.append((img_preds[pi]["score"], t, is_tp))

    if n_gt == 0:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "AR": 0.0}

    aps, ars = [], []
    for t in ths:
        rows = [(s, tp) for (s, tt, tp) in all_matches if tt == t]
        rows.sort(key=lambda r: -r[0])
        tps = np.cumsum([r[1] for r in rows]) if rows else np.array([0])
        fps = np.cumsum([not r[1] for r in rows]) if rows else np.array([0])
        recall = tps / n_gt
        precision = tps / np.maximum(tps + fps, 1)
        # 101-point interpolated AP (COCO)
        prec_interp = np.zeros(101)
        for i, r in enumerate(np.linspace(0, 1, 101)):
            mask = recall >= r
            prec_interp[i] = precision[mask].max() if mask.any() else 0.0
        aps.append(prec_interp.mean())
        ars.append(recall[-1] if len(rows) else 0.0)

    ths_list = list(np.round(ths, 2))
    return {
        "AP": float(np.mean(aps)),
        "AP50": float(aps[ths_list.index(0.5)]),
        "AP75": float(aps[ths_list.index(0.75)]),
        "AR": float(np.mean(ars)),
    }
