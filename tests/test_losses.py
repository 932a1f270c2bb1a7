"""Golden tests: the mask-weighted jit-safe losses must match a direct torch
transcription of the reference's boolean-gather implementations."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.models import losses as L

CFG = DaNetConfig()


def torch_body_uv_losses(u_pred, v_pred, i_pred, a_pred, Umap, Vmap, Imap, Annmap, has_iuv):
    """Transcription of reference iuv_estimator.py:304-341 (NCHW)."""
    bsz = u_pred.shape[0]
    sel = has_iuv.bool()
    u_pred, v_pred, i_pred = u_pred[sel], v_pred[sel], i_pred[sel]
    a_pred = a_pred[sel] if a_pred is not None else None
    Umap, Vmap, Imap = Umap[sel], Vmap[sel], Imap[sel]
    Annmap = Annmap[sel] if Annmap is not None else None

    Itarget = torch.argmax(Imap, dim=1).view(-1).long()
    ip = i_pred.permute(0, 2, 3, 1).reshape(-1, Imap.shape[1])
    loss_U = F.smooth_l1_loss(u_pred[Imap > 0], Umap[Imap > 0], reduction="sum") / bsz
    loss_V = F.smooth_l1_loss(v_pred[Imap > 0], Vmap[Imap > 0], reduction="sum") / bsz
    loss_I = F.cross_entropy(ip, Itarget)
    loss_U *= CFG.point_regression_weights
    loss_V *= CFG.point_regression_weights
    loss_A = None
    if a_pred is not None:
        At = torch.argmax(Annmap, dim=1).view(-1).long()
        ap = a_pred.permute(0, 2, 3, 1).reshape(-1, Annmap.shape[1])
        loss_A = F.cross_entropy(ap, At)
    return loss_U, loss_V, loss_I, loss_A


def make_iuv_batch(rng, b=4, s=8):
    part = rng.randint(0, 25, (b, s, s))
    onehot = np.eye(25, dtype=np.float32)[part]  # (B, S, S, 25)
    u_gt = onehot * rng.rand(b, s, s, 1).astype(np.float32)
    v_gt = onehot * rng.rand(b, s, s, 1).astype(np.float32)
    ann = np.eye(15, dtype=np.float32)[rng.randint(0, 15, (b, s, s))]
    preds = [rng.randn(b, s, s, c).astype(np.float32) for c in (25, 25, 25, 15)]
    return preds, (u_gt, v_gt, onehot, ann)


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_body_uv_losses_match_torch(rng):
    (u_p, v_p, i_p, a_p), (u_g, v_g, i_g, a_g) = make_iuv_batch(rng)
    has_iuv = np.array([1, 0, 1, 1], np.float32)

    got = L.body_uv_losses(
        *(jnp.asarray(x) for x in (u_p, v_p, i_p, a_p)),
        *(jnp.asarray(x) for x in (u_g, v_g, i_g, a_g)),
        jnp.asarray(has_iuv), CFG,
    )
    exp = torch_body_uv_losses(
        *(to_nchw(x) for x in (u_p, v_p, i_p, a_p)),
        *(to_nchw(x) for x in (u_g, v_g, i_g, a_g)),
        torch.from_numpy(has_iuv),
    )
    for g, e in zip(got, exp):
        np.testing.assert_allclose(float(g), float(e), rtol=1e-4, atol=1e-5)


def test_body_uv_losses_all_masked(rng):
    (u_p, v_p, i_p, a_p), gts = make_iuv_batch(rng)
    got = L.body_uv_losses(
        *(jnp.asarray(x) for x in (u_p, v_p, i_p, a_p)),
        *(jnp.asarray(x) for x in gts),
        jnp.zeros(4), CFG,
    )
    for g in got:
        assert float(g) == 0.0


def test_partial_uv_losses_match_torch_loop(rng):
    b, p, s, k = 2, 24, 8, 7
    pred = rng.randn(b, p, s, s, 3, k).astype(np.float32)
    idx_gt = np.eye(k, dtype=np.float32)[rng.randint(0, k, (b, p, s, s))]
    gt = np.stack([
        idx_gt * rng.rand(b, p, s, s, 1).astype(np.float32),
        idx_gt * rng.rand(b, p, s, s, 1).astype(np.float32),
        idx_gt,
    ], axis=-2)
    has_iuv = np.array([1, 1], np.float32)

    lu, lv, li = L.partial_uv_losses(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(has_iuv), CFG)

    # reference: per-part body_uv_losses summed, / 24
    eu = ev = ei = 0.0
    for pi in range(p):
        u_p = to_nchw(pred[:, pi, ..., 0, :])
        v_p = to_nchw(pred[:, pi, ..., 1, :])
        i_p = to_nchw(pred[:, pi, ..., 2, :])
        u_g = to_nchw(gt[:, pi, ..., 0, :])
        v_g = to_nchw(gt[:, pi, ..., 1, :])
        i_g = to_nchw(gt[:, pi, ..., 2, :])
        U, V, I, _ = torch_body_uv_losses(u_p, v_p, i_p, None, u_g, v_g, i_g, None, torch.from_numpy(has_iuv))
        eu, ev, ei = eu + float(U), ev + float(V), ei + float(I)
    np.testing.assert_allclose(float(lu), eu / 24, rtol=1e-4)
    np.testing.assert_allclose(float(lv), ev / 24, rtol=1e-4)
    np.testing.assert_allclose(float(li), ei / 24, rtol=1e-4, atol=1e-6)


def test_keypoint_2d_loss_matches_torch(rng):
    b, j = 3, 49
    pred = rng.randn(b, j, 2).astype(np.float32)
    gt = rng.randn(b, j, 3).astype(np.float32)
    gt[..., 2] = rng.rand(b, j)
    got = float(L.keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt), 0.0, 1.0))

    conf = torch.from_numpy(gt[..., 2:3].copy())
    conf[:, :25] *= 0.0
    exp = (conf * F.mse_loss(torch.from_numpy(pred), torch.from_numpy(gt[..., :2]), reduction="none")).mean()
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_keypoint_3d_loss_matches_torch(rng):
    b, j = 4, 24
    pred49 = rng.randn(b, 49, 3).astype(np.float32)
    gt = rng.randn(b, j, 4).astype(np.float32)[..., :4]
    gt = np.concatenate([rng.randn(b, j, 3), rng.rand(b, j, 1)], -1).astype(np.float32)
    has = np.array([1, 0, 1, 0], np.float32)

    got = float(L.keypoint_3d_loss(jnp.asarray(pred49), jnp.asarray(gt), jnp.asarray(has)))

    # torch transcription (smpl_regressor.py:259-276)
    pred = torch.from_numpy(pred49[:, 25:, :])
    conf = torch.from_numpy(gt[..., 3:].copy() if gt.shape[-1] == 4 else gt[..., 2:3].copy())
    conf = torch.from_numpy(gt[..., -1:].copy())
    gt3 = torch.from_numpy(gt[..., :3].copy())
    sel = torch.from_numpy(has) == 1
    gt3, conf, pred = gt3[sel], conf[sel], pred[sel]
    gt_pelvis = (gt3[:, 2] + gt3[:, 3]) / 2
    gt3 = gt3 - gt_pelvis[:, None]
    pr_pelvis = (pred[:, 2] + pred[:, 3]) / 2
    pred = pred - pr_pelvis[:, None]
    exp = (conf * F.mse_loss(pred, gt3, reduction="none")).mean()
    np.testing.assert_allclose(got, float(exp), rtol=1e-4)


def test_masked_param_losses_match_torch(rng):
    b = 5
    pr = rng.randn(b, 24, 3, 3).astype(np.float32)
    gr = rng.randn(b, 24, 3, 3).astype(np.float32)
    pb = rng.randn(b, 10).astype(np.float32)
    gb = rng.randn(b, 10).astype(np.float32)
    has = np.array([1, 1, 0, 1, 0], np.float32)

    lp, lb = L.smpl_param_losses(jnp.asarray(pr), jnp.asarray(pb), jnp.asarray(gr), jnp.asarray(gb), jnp.asarray(has), CFG)
    sel = torch.from_numpy(has) == 1
    exp_p = F.mse_loss(torch.from_numpy(pr)[sel], torch.from_numpy(gr)[sel]) * CFG.smpl_pose_weights
    exp_b = F.mse_loss(torch.from_numpy(pb)[sel], torch.from_numpy(gb)[sel]) * CFG.smpl_betas_weights
    np.testing.assert_allclose(float(lp), float(exp_p), rtol=1e-4)
    np.testing.assert_allclose(float(lb), float(exp_b), rtol=1e-4)


def test_l1_sum_over_samples_matches_reference(rng):
    b = 4
    pred = rng.randn(b, 3).astype(np.float32)
    gt = rng.randn(b, 3).astype(np.float32)
    has = np.array([1, 0, 1, 1], np.float32)
    got, _ = L.cam_losses(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(has))
    sel = torch.from_numpy(has) == 1
    exp = F.l1_loss(torch.from_numpy(pred)[sel], torch.from_numpy(gt)[sel], reduction="sum") / int(sel.sum())
    np.testing.assert_allclose(float(got), float(exp), rtol=1e-5)


def test_dp_uvia_losses_match_torch(rng):
    b, s, npts = 3, 16, 20
    u_p = rng.randn(b, s, s, 25).astype(np.float32)
    v_p = rng.randn(b, s, s, 25).astype(np.float32)
    i_p = rng.randn(b, s, s, 25).astype(np.float32)
    a_p = rng.randn(b, s, s, 15).astype(np.float32)
    cfg = DaNetConfig(heatmap_size=s)

    dp = {
        "x": rng.uniform(0, s, (b, npts)).astype(np.float32),
        "y": rng.uniform(0, s, (b, npts)).astype(np.float32),
        "i_points": rng.randint(0, 25, (b, npts)).astype(np.int32),
        "u_points": rng.rand(b, 25, npts).astype(np.float32),
        "v_points": rng.rand(b, 25, npts).astype(np.float32),
        "point_weights": (rng.rand(b, 25, npts) > 0.5).astype(np.float32),
        "ann_labels": rng.randint(0, 15, (b, s, s)).astype(np.int32),
    }
    has_dp = np.array([1, 1, 1], np.float32)

    got = L.dp_uvia_losses(
        *(jnp.asarray(x) for x in (u_p, v_p, i_p, a_p)),
        {k: jnp.asarray(v) for k, v in dp.items()}, jnp.asarray(has_dp), cfg,
    )

    # torch transcription of iuv_estimator.py:343-419
    U = to_nchw(u_p); V = to_nchw(v_p); I = to_nchw(i_p); A = to_nchw(a_p)
    gx = (torch.from_numpy(dp["x"]) - s / 2.0) * 2.0 / s
    gy = (torch.from_numpy(dp["y"]) - s / 2.0) * 2.0 / s
    grid = torch.stack([gx, gy], dim=-1).unsqueeze(1)
    iU = F.grid_sample(U, grid, align_corners=False).squeeze(2).transpose(1, 2)
    iV = F.grid_sample(V, grid, align_corners=False).squeeze(2).transpose(1, 2)
    iI = F.grid_sample(I, grid, align_corners=False).squeeze(2).transpose(1, 2).reshape(-1, 25)

    exp_i = F.cross_entropy(iI, torch.from_numpy(dp["i_points"]).long().view(-1)) * cfg.part_weights
    Upts = torch.from_numpy(dp["u_points"]).transpose(1, 2).reshape(1, 1, -1, 25)
    Vpts = torch.from_numpy(dp["v_points"]).transpose(1, 2).reshape(1, 1, -1, 25)
    Wpts = torch.from_numpy(dp["point_weights"]).transpose(1, 2).reshape(1, 1, -1, 25)
    iUr = iU.reshape(1, 1, -1, 25)
    iVr = iV.reshape(1, 1, -1, 25)

    def w_smooth_l1(p, t, w):
        d = w * (p - t)
        ad = d.abs()
        ls = torch.where(ad < 1, 0.5 * d * d, ad - 0.5)
        return (w * ls).sum()  # N=1 after the (1,1,-1,25) reshape

    exp_u = w_smooth_l1(iUr, Upts, Wpts) * cfg.point_regression_weights
    exp_v = w_smooth_l1(iVr, Vpts, Wpts) * cfg.point_regression_weights
    exp_a = F.cross_entropy(
        A.reshape(b, 15, -1).transpose(1, 2).reshape(-1, 15),
        torch.from_numpy(dp["ann_labels"]).long().view(-1),
    ) * cfg.index_weights

    np.testing.assert_allclose(float(got[0]), float(exp_u), rtol=1e-3)
    np.testing.assert_allclose(float(got[1]), float(exp_v), rtol=1e-3)
    np.testing.assert_allclose(float(got[2]), float(exp_i), rtol=1e-4)
    np.testing.assert_allclose(float(got[3]), float(exp_a), rtol=1e-4)


def test_reproject_range(rng):
    joints = rng.randn(2, 49, 3).astype(np.float32) * 0.2
    cam = np.array([[0.9, 0.0, 0.0], [1.1, 0.1, -0.1]], np.float32)
    out = np.asarray(L.reproject(jnp.asarray(joints), jnp.asarray(cam), 224.0))
    assert out.shape == (2, 49, 2)
    assert np.abs(out).max() < 5


def test_orthogonal_loss_matches_torch(rng):
    """Reference smpl_regressor.py:240-246: mse(R @ R^T, I) over B*24 rotmats."""
    from dataclasses import replace

    cfg = replace(CFG, orthogonal_weights=0.1)
    rotmat = rng.randn(3, 24, 3, 3).astype(np.float32)

    R = torch.from_numpy(rotmat).view(-1, 3, 3)
    exp = F.mse_loss(torch.bmm(R, R.transpose(1, 2)), torch.eye(3).expand(72, 3, 3)) * 0.1

    got = L.orthogonal_loss(jnp.asarray(rotmat), cfg)
    np.testing.assert_allclose(float(got), float(exp), rtol=1e-5)


def test_stn_heatmap_loss_matches_torch(rng):
    """Reference iuv_estimator.py:142-158: smooth-l1 vs generate_heatmap
    targets built from GT kps mapped [-1,1]->[0,1]."""
    from dataclasses import replace

    cfg = replace(CFG, stn_hm_weights=2.0)
    b, s = 2, 56
    kps = np.zeros((b, 24, 3), np.float32)
    kps[..., :2] = rng.uniform(-0.9, 0.9, (b, 24, 2))
    kps[..., 2] = 1.0
    hm_pred = (rng.randn(b, s, s, 24) * 0.1).astype(np.float32)

    # torch oracle: the reference's generate_heatmap per joint
    def ref_heatmap(joints01):
        tgt = np.zeros((24, s, s), np.float32)
        for j in range(24):
            mu_x = int(joints01[j, 0] * s + 0.5)
            mu_y = int(joints01[j, 1] * s + 0.5)
            ul = [mu_x - 3, mu_y - 3]
            br = [mu_x + 4, mu_y + 4]
            if ul[0] >= s or ul[1] >= s or br[0] < 0 or br[1] < 0:
                continue
            x = np.arange(7, dtype=np.float32)
            g = np.exp(-((x - 3) ** 2 + (x[:, None] - 3) ** 2) / 2.0)
            gx = max(0, -ul[0]), min(br[0], s) - ul[0]
            gy = max(0, -ul[1]), min(br[1], s) - ul[1]
            ix = max(0, ul[0]), min(br[0], s)
            iy = max(0, ul[1]), min(br[1], s)
            tgt[j, iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
        return tgt

    tgts = np.stack([ref_heatmap(kps[i, :, :2] * 0.5 + 0.5) for i in range(b)])
    exp = F.smooth_l1_loss(
        torch.from_numpy(np.moveaxis(hm_pred, -1, 1).copy()), torch.from_numpy(tgts)
    ) * 2.0

    got = L.stn_heatmap_loss(jnp.asarray(hm_pred), jnp.asarray(kps), cfg)
    # the vectorized target evaluates the Gaussian everywhere (no 7x7 box
    # truncation); the tail beyond 3 sigma is < 1.2e-2 per pixel
    np.testing.assert_allclose(float(got), float(exp), rtol=2e-2)


def test_part_iuv_gt_crops_matches_naive_gather(rng):
    """The one-hot-matmul `part_iuv_gt_crops` must reproduce the naive
    design exactly: per part, gather its 6 mapped channels from the 25-ch
    GT stacks (`m[..., mapping]`), prepend the zero/background slot 0, and
    crop part-major with the separable weights. Guards the selection-table
    layout ([u(7)|v(7)|i(7)], bg at flat index 14) and the pixel-major crop
    einsums against regression; on-chip the two were measured bit-identical
    (scripts/probe_part_crops.py, max_abs_err=0.0)."""
    import jax
    from danet_densepose2smpl_tpu.ops.imwarp import separable_crop_per_part
    from danet_densepose2smpl_tpu.ops.structure import DP2SMPL_MAPPING
    from danet_densepose2smpl_tpu.train.objective import part_iuv_gt_crops

    b, s = 3, 16
    _, (u_gt, v_gt, i_gt, _) = make_iuv_batch(rng, b=b, s=s)
    centers = rng.uniform(-0.5, 0.5, (b, 24, 2)).astype(np.float32)
    scales = rng.uniform(0.2, 0.6, (b, 24, 1, 1)).astype(np.float32)
    theta = np.zeros((b, 24, 2, 3), np.float32)
    theta[..., 0, 0] = scales[..., 0, 0]
    theta[..., 1, 1] = scales[..., 0, 0]
    theta[..., :, 2] = centers
    u_gt, v_gt, i_gt, theta = map(jnp.asarray, (u_gt, v_gt, i_gt, theta))

    mapping = jnp.asarray(DP2SMPL_MAPPING)

    def gather(m):  # (B, S, S, 25) -> (B, 24, S, S, 6)
        return m[..., mapping].transpose(0, 3, 1, 2, 4)

    gu, gv, gi = gather(u_gt), gather(v_gt), gather(i_gt)
    bg_i = (jnp.sum(gi, axis=-1, keepdims=True) < 0.5).astype(gi.dtype)
    zeros = jnp.zeros_like(bg_i)
    stacks = jnp.stack([
        jnp.concatenate([zeros, gu], axis=-1),
        jnp.concatenate([zeros, gv], axis=-1),
        jnp.concatenate([bg_i, gi], axis=-1),
    ], axis=-2)                                               # (B, 24, S, S, 3, 7)
    flat = stacks.reshape(stacks.shape[:4] + (21,))
    exp = separable_crop_per_part(
        flat, theta[..., :, 2], theta[..., 0, 0], s,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(stacks.shape)

    got = part_iuv_gt_crops(u_gt, v_gt, i_gt, theta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-6)

    # the stop_grad=False path must carry gradients through the thetas
    g = jax.grad(
        lambda t: jnp.sum(part_iuv_gt_crops(u_gt, v_gt, i_gt, t, stop_grad=False) ** 2)
    )(theta)
    assert float(jnp.abs(g).sum()) > 0.0
