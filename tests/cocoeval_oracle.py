"""Test-only COCO keypoint-AP oracle.

A deliberately LITERAL re-statement of the pycocotools COCOeval keypoint
algorithm (BSD-licensed public code; pycocotools itself is not installable in
this container) — per-image dict loops, id-based match matrices, the exact
`accumulate` interpolation — kept structurally different from the shipped
vectorized implementation in `danet_densepose2smpl_tpu/eval/metrics.py` so
that agreement between the two on randomized fixtures is evidence, not a
shared transcription bug (VERDICT r4 missing #2).

Semantics mirrored exactly:
  * Params(iouType='keypoints'): iouThrs linspace(.5,.95,10), recThrs
    linspace(0,1,101), maxDets=[20], areaRng all/medium/large.
  * _prepare: gt['ignore'] = iscrowd or num_keypoints==0 (the explicit
    'ignore' field is OVERWRITTEN — a documented pycocotools quirk).
  * loadRes: detection area/bbox = keypoint-extent box.
  * computeOks: per-pair loops, crowd fallback to the 3x-extended bbox.
  * evaluateImg: ignore-last gt sort, crowd re-matchable, the
    "stop at first ignored gt once a real match exists" break, unmatched
    out-of-area detections ignored.
  * accumulate/summarize: global score sort (mergesort), monotone precision
    envelope, searchsorted recall interpolation, mean over entries > -1.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
MAX_DET = 20
AREA_RNG = [(0.0, 1e5 ** 2), (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e5 ** 2)]
AREA_LBL = ["all", "medium", "large"]


def _prepare(detections, ground_truths):
    """pycocotools COCOeval._prepare + COCO.loadRes, keypoint branch."""
    gts, dts = [], []
    for gid, g in enumerate(ground_truths):
        g = dict(g)
        g["id"] = gid + 1
        kp = np.asarray(g["keypoints"], dtype=np.float64).reshape(-1, 3)
        g["_kp"] = kp
        nkp = g.get("num_keypoints")
        if nkp is None:
            nkp = int(np.count_nonzero(kp[:, 2] > 0))
        g["iscrowd"] = int(g.get("iscrowd", 0))
        # _prepare: explicit 'ignore' is overwritten by iscrowd, then OR'd
        # with the empty-keypoints condition for iouType='keypoints'
        g["ignore"] = int(bool(g["iscrowd"]) or nkp == 0)
        gts.append(g)
    for did, d in enumerate(detections):
        d = dict(d)
        d["id"] = did + 1
        kp = np.asarray(d["keypoints"], dtype=np.float64).reshape(-1, 3)
        d["_kp"] = kp
        x, y = kp[:, 0], kp[:, 1]
        d["area"] = (x.max() - x.min()) * (y.max() - y.min())
        dts.append(d)
    return dts, gts


def _compute_oks(dts, gts, sigmas):
    """COCOeval.computeOks — dts already score-sorted and truncated."""
    if len(gts) == 0 or len(dts) == 0:
        return np.zeros((len(dts), len(gts)))
    variances = (np.asarray(sigmas) * 2) ** 2
    k = len(sigmas)
    ious = np.zeros((len(dts), len(gts)))
    for j, gt in enumerate(gts):
        g = gt["_kp"]
        xg, yg, vg = g[:, 0], g[:, 1], g[:, 2]
        k1 = np.count_nonzero(vg > 0)
        bb = np.asarray(gt["bbox"], dtype=np.float64)
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = dt["_kp"]
            xd, yd = d[:, 0], d[:, 1]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros((k,))
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
            e = (dx ** 2 + dy ** 2) / variances / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _evaluate_img(dts, gts, ious, area_rng):
    """COCOeval.evaluateImg — returns the dict accumulate consumes."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (g["ignore"] or g["area"] < area_rng[0] or g["area"] > area_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    ious = ious[:, gtind] if len(ious) > 0 else ious
    iscrowd = [int(g["iscrowd"]) for g in gts]

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts]) if G else np.zeros(0)
    dt_ig = np.zeros((T, D))
    if len(ious) and G:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gts[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1] for d in dts]).reshape(1, D)
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def oracle_keypoint_eval(detections, ground_truths, sigmas):
    """COCOeval evaluate+accumulate+summarize (keypoints). Returns the same
    10-stat dict keys as `eval.metrics.keypoint_oks_ap`."""
    dts_all, gts_all = _prepare(detections, ground_truths)
    img_ids = sorted({g["image_id"] for g in gts_all} | {d["image_id"] for d in dts_all})

    by_gt = {i: [g for g in gts_all if g["image_id"] == i] for i in img_ids}
    by_dt = {}
    for i in img_ids:
        dts = [d for d in dts_all if d["image_id"] == i]
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        by_dt[i] = [dts[j] for j in inds][:MAX_DET]

    ious = {i: _compute_oks(by_dt[i], by_gt[i], sigmas) for i in img_ids}

    T, R, A = len(IOU_THRS), len(REC_THRS), len(AREA_RNG)
    precision = -np.ones((T, R, A))
    recall = -np.ones((T, A))
    for a, a_rng in enumerate(AREA_RNG):
        evals = [_evaluate_img(by_dt[i], by_gt[i], ious[i], a_rng) for i in img_ids]
        evals = [e for e in evals if e is not None]
        if not evals:
            continue
        dt_scores = np.concatenate([np.asarray(e["dtScores"][:MAX_DET]) for e in evals])
        inds = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"][:, :MAX_DET] for e in evals], axis=1)[:, inds]
        dt_ig = np.concatenate([e["dtIgnore"][:, :MAX_DET] for e in evals], axis=1)[:, inds]
        gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
        npig = np.count_nonzero(gt_ig == 0)
        if npig == 0:
            continue
        tps = np.logical_and(dtm, np.logical_not(dt_ig))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            recall[t, a] = rc[-1] if nd else 0
            q = np.zeros((R,))
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            pos = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(pos):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[t, :, a] = np.array(q)

    def _summ(ap, iou_thr=None, area="all"):
        a = AREA_LBL.index(area)
        if ap:
            s = precision[:, :, a]
            if iou_thr is not None:
                s = s[np.where(IOU_THRS == iou_thr)[0]]
        else:
            s = recall[:, a]
            if iou_thr is not None:
                s = s[np.where(IOU_THRS == iou_thr)[0]]
        valid = s[s > -1]
        return -1.0 if valid.size == 0 else float(np.mean(valid))

    return {
        "AP": _summ(1), "AP50": _summ(1, 0.5), "AP75": _summ(1, 0.75),
        "APm": _summ(1, area="medium"), "APl": _summ(1, area="large"),
        "AR": _summ(0), "AR50": _summ(0, 0.5), "AR75": _summ(0, 0.75),
        "ARm": _summ(0, area="medium"), "ARl": _summ(0, area="large"),
    }
