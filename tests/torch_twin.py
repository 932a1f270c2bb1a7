"""Full reference-topology torch DaNet twin (test-only golden oracle).

This module transcribes the reference's inference path module-for-module so
the complete checkpoint conversion (`port/danet_map.py`) can be validated
end-to-end: a state_dict taken from this twin converts name-for-name into
the flax DaNet, and both must produce the same 229-dim `para`.

Transcribed from (all /root/reference):
  models/danet/danet.py:61-131            (infer_net composition)
  models/danet/iuv_estimator.py:58-260    (backbone -> STN -> partial head)
  models/danet/iuv_estimator.py:262-301   (affine_para)
  models/danet/smpl_regressor.py:397-928  (DecomposedPredictor, 'gcn')
  models/module/res_module.py             (blocks, SmplResNet, PoseResNet,
                                           LimbResLayers, IUV_predict_layer)
  models/module/hr_module.py              (HRNet)
  models/module/GCN.py                    (GraphConv / GCN)
  utils/iuvmap.py:6-38, utils/geometry.py:47-61, utils/keypoints.py:372-394
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from danet_densepose2smpl_tpu.ops.structure import (
    SMPL2DP_PART,
    SMPL_CHILD2,
    SMPL_PARENT,
    pos2rot_adjacency,
    refine_edge_mask,
    rot2pos_adjacency,
)

RESNET_SPEC = {18: ("basic", [2, 2, 2, 2]), 34: ("basic", [3, 4, 6, 3]),
               50: ("bottleneck", [3, 4, 6, 3]), 101: ("bottleneck", [3, 4, 23, 3]),
               152: ("bottleneck", [3, 8, 36, 3])}
EXPANSION = {"basic": 1, "bottleneck": 4}


# --------------------------------------------------------------------------
# residual blocks (res_module.py:27-104; groups-aware like the reference's)
# --------------------------------------------------------------------------

class TBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes * groups, planes * groups, 3, stride, 1,
                                bias=False, groups=groups)
        self.bn1 = tnn.BatchNorm2d(planes * groups)
        self.conv2 = tnn.Conv2d(planes * groups, planes * groups, 3, 1, 1,
                                bias=False, groups=groups)
        self.bn2 = tnn.BatchNorm2d(planes * groups)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes * groups, planes * groups, 1, bias=False, groups=groups)
        self.bn1 = tnn.BatchNorm2d(planes * groups)
        self.conv2 = tnn.Conv2d(planes * groups, planes * groups, 3, stride, 1,
                                bias=False, groups=groups)
        self.bn2 = tnn.BatchNorm2d(planes * groups)
        self.conv3 = tnn.Conv2d(planes * groups, planes * 4 * groups, 1, bias=False, groups=groups)
        self.bn3 = tnn.BatchNorm2d(planes * 4 * groups)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


BLOCKS = {"basic": TBasicBlock, "bottleneck": TBottleneck}


def make_layer(kind, inplanes, planes, blocks, stride=1, groups=1):
    block = BLOCKS[kind]
    exp = EXPANSION[kind]
    downsample = None
    if stride != 1 or inplanes != planes * exp:
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes * groups, planes * exp * groups, 1, stride,
                       bias=False, groups=groups),
            tnn.BatchNorm2d(planes * exp * groups),
        )
    layers = [block(inplanes, planes, stride, downsample, groups=groups)]
    inplanes = planes * exp
    for _ in range(1, blocks):
        layers.append(block(inplanes, planes, groups=groups))
    return tnn.Sequential(*layers), inplanes


# --------------------------------------------------------------------------
# numeric transcriptions
# --------------------------------------------------------------------------

def iuvmap_clean_t(u, v, index, ann=None):
    """utils/iuvmap.py:6-38 (argmax one-hot gating)."""
    def onehot(m):
        am = torch.argmax(m, dim=1)
        return F.one_hot(am, m.size(1)).permute(0, 3, 1, 2).to(m.dtype)

    idx = onehot(index)
    ann_cl = onehot(ann) if ann is not None else None
    return idx * u, idx * v, idx, ann_cl


def rot6d_to_rotmat_t(x):
    """utils/geometry.py:47-61."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = F.normalize(a1)
    b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack((b1, b2, b3), dim=-1)


def softmax_integral_t(hm):
    """utils/keypoints.py:372-394 (2-D branch), hm (B, J, H, W) pre-scaled."""
    b, j, h, w = hm.shape
    p = F.softmax(hm.reshape(b, j, -1), 2).reshape(b, j, h, w)
    accu_x = p.sum(dim=2) * torch.arange(w, dtype=hm.dtype)
    accu_y = p.sum(dim=3) * torch.arange(h, dtype=hm.dtype)
    return torch.cat([accu_x.sum(2, keepdim=True), accu_y.sum(2, keepdim=True)], dim=2)


def normalize_undigraph_t(A):
    """utils/graph.py:232-261 (D^-1/2 A D^-1/2)."""
    d = A.sum(0)
    dn = torch.where(d > 0, d ** -0.5, torch.zeros_like(d))
    return torch.diag(dn) @ A @ torch.diag(dn)


# --------------------------------------------------------------------------
# heads and backbones
# --------------------------------------------------------------------------

class TIUVPredictLayer(tnn.Module):
    """res_module.py:281-390."""

    def __init__(self, feat_dim=256, decomposed=True, part_out_dim=7):
        super().__init__()
        self.predict_u = tnn.Conv2d(feat_dim, 25, 3, 1, 1)
        self.predict_v = tnn.Conv2d(feat_dim, 25, 3, 1, 1)
        self.predict_ann_index = tnn.Conv2d(feat_dim, 15, 3, 1, 1)
        self.predict_uv_index = tnn.Conv2d(feat_dim, 25, 3, 1, 1)
        trunk, _ = make_layer("bottleneck", feat_dim, feat_dim // 4, 3)
        self.predict_hm = tnn.Sequential(trunk, tnn.Conv2d(feat_dim, 24, 3, 1, 1, bias=True))
        if decomposed:
            self.predict_partial_iuv = tnn.Conv2d(
                feat_dim * 24, part_out_dim * 3 * 24, 3, 1, 1, groups=24
            )

    def forward(self, x):
        return {
            "predict_u": self.predict_u(x),
            "predict_v": self.predict_v(x),
            "predict_uv_index": self.predict_uv_index(x),
            "predict_ann_index": self.predict_ann_index(x),
            "predict_hm": self.predict_hm(x),
        }


class TSmplResNet(tnn.Module):
    """res_module.py:393-466."""

    def __init__(self, resnet_nums, in_channels=3, num_classes=229, truncate=0):
        super().__init__()
        kind, layers = RESNET_SPEC[resnet_nums]
        self.truncate = truncate
        self.conv1 = tnn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = 64
        self.layer1, inp = make_layer(kind, inp, 64, layers[0])
        self.layer2, inp = make_layer(kind, inp, 128, layers[1], stride=2)
        if truncate < 2:
            self.layer3, inp = make_layer(kind, inp, 256, layers[2], stride=2)
        if truncate < 1:
            self.layer4, inp = make_layer(kind, inp, 512, layers[3], stride=2)
        self.num_classes = num_classes
        if num_classes > 0:
            self.final_layer = tnn.Linear(512 * EXPANSION[kind], num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        if self.truncate < 2:
            x = self.layer3(x)
        if self.truncate < 1:
            x = self.layer4(x)
        cls = None
        if self.num_classes > 0:
            cls = self.final_layer(x.mean(dim=(2, 3)))
        return cls, {"x4": x}


class TPoseResNet(tnn.Module):
    """res_module.py:107-224 (ResNet + 3 deconvs + IUV head)."""

    def __init__(self, resnet_nums=50, decomposed=True, deconv_filters=(256, 256, 256)):
        super().__init__()
        kind, layers = RESNET_SPEC[resnet_nums]
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = 64
        self.layer1, inp = make_layer(kind, inp, 64, layers[0])
        self.layer2, inp = make_layer(kind, inp, 128, layers[1], stride=2)
        self.layer3, inp = make_layer(kind, inp, 256, layers[2], stride=2)
        self.layer4, inp = make_layer(kind, inp, 512, layers[3], stride=2)
        mods = []
        for f in deconv_filters:
            mods += [tnn.ConvTranspose2d(inp, f, 4, 2, 1, 0, bias=False),
                     tnn.BatchNorm2d(f), tnn.ReLU(True)]
            inp = f
        self.deconv_layers = tnn.Sequential(*mods)
        self.final_pred = TIUVPredictLayer(feat_dim=deconv_filters[-1], decomposed=decomposed)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        xd = self.deconv_layers(x)
        out = self.final_pred(xd)
        out["xd"] = xd
        return out


class THRModule(tnn.Module):
    """hr_module.py:15-179 (one multi-branch module)."""

    def __init__(self, nb, nblk, ch, multi_scale_output=True):
        super().__init__()
        self.nb = nb
        self.branches = tnn.ModuleList(
            [make_layer("basic", ch[b], ch[b], nblk[b])[0] for b in range(nb)]
        )
        n_out = nb if multi_scale_output else 1
        fuse = tnn.ModuleList()
        for i in range(n_out):
            row = tnn.ModuleList()
            for j in range(nb):
                if j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(ch[j], ch[i], 1, bias=False), tnn.BatchNorm2d(ch[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                    ))
                elif j < i:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = ch[i] if last else ch[j]
                        seq = [tnn.Conv2d(ch[j], cout, 3, 2, 1, bias=False), tnn.BatchNorm2d(cout)]
                        if not last:
                            seq.append(tnn.ReLU())
                        steps.append(tnn.Sequential(*seq))
                    row.append(tnn.Sequential(*steps))
                else:
                    row.append(tnn.Identity())
            fuse.append(row)
        self.fuse_layers = fuse

    def forward(self, xs):
        ys = [self.branches[b](xs[b]) for b in range(self.nb)]
        outs = []
        for row in self.fuse_layers:
            acc = None
            for j in range(self.nb):
                y = ys[j] if isinstance(row[j], tnn.Identity) else row[j](ys[j])
                acc = y if acc is None else acc + y
            outs.append(torch.relu(acc))
        return outs


class THRNet(tnn.Module):
    """hr_module.py:188-378 with the head attached (final_pred + 'xd')."""

    def __init__(self, stages, decomposed=True):
        super().__init__()
        self.specs = stages
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        blocks = [TBottleneck(64, 64, downsample=tnn.Sequential(
            tnn.Conv2d(64, 256, 1, bias=False), tnn.BatchNorm2d(256)))]
        blocks += [TBottleneck(256, 64) for _ in range(3)]
        self.layer1 = tnn.Sequential(*blocks)

        prev = (256,)
        for s_idx, (nm, nb, nblk, ch) in enumerate(stages):
            t = s_idx + 1
            trans = tnn.ModuleList()
            for i in range(nb):
                if i < len(prev):
                    if prev[i] != ch[i]:
                        trans.append(tnn.Sequential(
                            tnn.Conv2d(prev[i], ch[i], 3, 1, 1, bias=False),
                            tnn.BatchNorm2d(ch[i]), tnn.ReLU(),
                        ))
                    else:
                        trans.append(tnn.Identity())
                else:
                    trans.append(tnn.Sequential(tnn.Sequential(
                        tnn.Conv2d(prev[-1], ch[i], 3, 2, 1, bias=False),
                        tnn.BatchNorm2d(ch[i]), tnn.ReLU(),
                    )))
            setattr(self, f"transition{t}", trans)
            mods = []
            for m in range(nm):
                last = s_idx == len(stages) - 1 and m == nm - 1
                mods.append(THRModule(nb, nblk, ch, multi_scale_output=not last))
            setattr(self, f"stage{t + 1}", tnn.ModuleList(mods))
            prev = ch
        self.final_pred = TIUVPredictLayer(feat_dim=stages[-1][3][0], decomposed=decomposed)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        prev_n = 1
        for s_idx, (nm, nb, nblk, ch) in enumerate(self.specs):
            t = s_idx + 1
            trans = getattr(self, f"transition{t}")
            new = []
            for i in range(nb):
                src = xs[i] if i < prev_n else xs[-1]
                new.append(src if isinstance(trans[i], tnn.Identity) else trans[i](src))
            for mod in getattr(self, f"stage{t + 1}"):
                new = mod(new)
            xs = new
            prev_n = nb
        xd = xs[0]
        out = self.final_pred(xd)
        out["xd"] = xd
        return out


class TLimbResLayers(tnn.Module):
    """res_module.py:500-535 (grouped layer4 + avgpool)."""

    def __init__(self, resnet_nums, inplanes, outplanes, groups=24):
        super().__init__()
        kind, layers = RESNET_SPEC[resnet_nums]
        self.layer4, _ = make_layer(kind, inplanes, outplanes, layers[3], stride=2, groups=groups)

    def forward(self, x):
        x = self.layer4(x)
        return x.mean(dim=(2, 3), keepdim=True)


class TGraphConv(tnn.Module):
    def __init__(self, input_dim, output_dim):
        super().__init__()
        self.weight = tnn.Parameter(torch.empty(input_dim, output_dim))
        self.bias = tnn.Parameter(torch.zeros(output_dim))
        tnn.init.xavier_uniform_(self.weight, gain=tnn.init.calculate_gain("relu"))

    def forward(self, x, adj):
        return torch.matmul(adj, x) @ self.weight + self.bias


class TGCN(tnn.Module):
    """GCN.py:44-92 (bn=True over the 24-node axis)."""

    def __init__(self, input_dim, hidden_dim, out_dim, num_layers, num_nodes=24):
        super().__init__()
        dims = ([(input_dim, out_dim)] if num_layers == 1 else
                [(input_dim, hidden_dim)]
                + [(hidden_dim, hidden_dim)] * (num_layers - 2)
                + [(hidden_dim, out_dim)])
        self.gc = tnn.ModuleList([TGraphConv(i, o) for i, o in dims])
        self.act = tnn.ModuleList(
            [tnn.Sequential(tnn.BatchNorm1d(num_nodes), tnn.ReLU(True)) for _ in dims]
        )

    def forward(self, x, A):
        for gc, act in zip(self.gc, self.act):
            x = act(gc(x, A))
        return x


# --------------------------------------------------------------------------
# IUV estimator + decomposed predictor + DaNet
# --------------------------------------------------------------------------

class TIUVEstimator(tnn.Module):
    """iuv_estimator.py:17-260 inference path ('iuv' mode, eval)."""

    def __init__(self, backbone, learned_ratio, learned_offset, part_vis_thresh=0.5,
                 hrnet_stages=None, msres_num_layers=50):
        super().__init__()
        self.register_buffer("learned_ratio", torch.as_tensor(learned_ratio))
        self.register_buffer("learned_offset", torch.as_tensor(learned_offset))
        if backbone == "hrnet":
            self.iuv_est = THRNet(hrnet_stages)
        else:
            self.iuv_est = TPoseResNet(msres_num_layers)
        self.part_vis_thresh = part_vis_thresh

    def affine_para(self, stn_centers, part_hidden=None):
        """iuv_estimator.py:262-301 (eval: no jitter)."""
        thetas, scales = [], []
        box_diag = stn_centers.max(dim=1)[0] - stn_centers.min(dim=1)[0]
        scale_box = box_diag.max(dim=1)[0] / 2.0
        for i in range(24):
            center_i = stn_centers[:, i].detach()
            if i == 0:
                scale_i = scale_box
            else:
                c, p = int(SMPL_CHILD2[i]), int(SMPL_PARENT[i])
                sc = torch.norm(stn_centers[:, c] - stn_centers[:, i], dim=1) / 2.0
                sp = torch.norm(stn_centers[:, p] - stn_centers[:, i], dim=1) / 2.0
                scale_i = 2 * torch.max(torch.stack([sc, sp]), dim=0)[0]
            scale_i = scale_i.detach()
            scale_i = scale_i * F.relu(self.learned_ratio[i]) + F.relu(self.learned_offset[i])
            if i != 0 and part_hidden is not None:
                scale_i = torch.where(part_hidden[i], 0.8 * scale_box, scale_i)
            theta_i = torch.zeros(stn_centers.size(0), 2, 3, dtype=stn_centers.dtype)
            theta_i[:, 0, 0] = scale_i
            theta_i[:, 1, 1] = scale_i
            theta_i[:, :, -1] = center_i
            thetas.append(theta_i)
            scales.append(scale_i)
        return thetas, scales

    def forward(self, data):
        uv = self.iuv_est(data)
        u_pred, v_pred = uv["predict_u"], uv["predict_v"]
        index_pred, ann_pred = uv["predict_uv_index"], uv["predict_ann_index"]
        out = {"uvia_pred": [u_pred, v_pred, index_pred, ann_pred]}

        _, _, index_pred_cl, _ = iuvmap_clean_t(u_pred, v_pred, index_pred, ann_pred)
        feat = uv["xd"]
        hm = uv["predict_hm"]
        s = hm.size(-1)
        stn_centers = softmax_integral_t(10 * hm)
        stn_centers = stn_centers / (0.5 * s) - 1

        part_hidden = None
        if self.part_vis_thresh > 0:
            scores = []
            for i in range(24):
                score_map = torch.max(index_pred_cl[:, list(SMPL2DP_PART[i])], dim=1)[0].detach()
                si = F.grid_sample(
                    score_map.unsqueeze(1),
                    stn_centers[:, i].unsqueeze(1).unsqueeze(1),
                    align_corners=False,
                ).detach()
                scores.append(si.reshape(-1))
            part_hidden = torch.stack(scores) < self.part_vis_thresh

        thetas, _ = self.affine_para(stn_centers, part_hidden)
        maps = []
        for i in range(24):
            grid = F.affine_grid(thetas[i].detach(), feat.size(), align_corners=False)
            maps.append(F.grid_sample(feat, grid, align_corners=False))
        part_maps = torch.cat(maps, dim=1)
        part_iuv = self.iuv_est.final_pred.predict_partial_iuv(part_maps)
        out["part_iuv_pred"] = part_iuv.reshape(part_iuv.size(0), 24, 3, -1, s, s)
        return out


class TDecomposedPredictor(tnn.Module):
    """smpl_regressor.py:397-928, 'gcn' strategy, eval path."""

    def __init__(self, mean_cam_shape, mean_pose, glo_num_layers=18, limb_num_layers=18,
                 feat_dim=128, gcn_num_layer=3):
        super().__init__()
        self.register_buffer("mean_cam_shape", torch.as_tensor(mean_cam_shape).reshape(1, 13))
        self.register_buffer("mean_pose", torch.as_tensor(mean_pose).reshape(1, 144))
        self.body_net = tnn.Sequential(
            tnn.Conv2d(75, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(glo_num_layers, in_channels=64, num_classes=13),
        )
        self.limb_net = tnn.Sequential(
            tnn.Conv2d(21, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(limb_num_layers, in_channels=64, num_classes=0, truncate=1),
        )
        self.limb_reslayer = TLimbResLayers(limb_num_layers, inplanes=256,
                                            outplanes=feat_dim, groups=24)

        self.r2p_gcn = TGCN(feat_dim, feat_dim, feat_dim, 1)
        self.refine_gcn = TGCN(feat_dim, 2 * feat_dim, feat_dim, gcn_num_layer)
        self.p2r_gcn = TGCN(feat_dim, feat_dim, feat_dim, 1)
        self.edge_importance = tnn.Parameter(torch.ones(1, 24, 24))
        self.register_buffer("I_n", torch.eye(24).unsqueeze(0))
        self.register_buffer("A_mask", torch.as_tensor(refine_edge_mask(), dtype=torch.float32))
        self.register_buffer("r2p_A", torch.as_tensor(rot2pos_adjacency(), dtype=torch.float32).unsqueeze(0))
        self.register_buffer("p2r_A", torch.as_tensor(pos2rot_adjacency(), dtype=torch.float32).unsqueeze(0))

        self.pose_regressors = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(feat_dim * 24, 6 * 24, 1, groups=24)),
            tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(feat_dim * 24, 6 * 24, 1, groups=24)),
        ])
        self.coord_regressors = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(feat_dim * 24, 3 * 24, 1, groups=24))
            for _ in range(2)
        ])

    def forward(self, body_iuv, limb_iuv):
        nbs = body_iuv.size(0)
        global_para, _ = self.body_net(body_iuv)
        global_para = global_para + self.mean_cam_shape

        s = limb_iuv.size(-1)
        _, limb_feat = self.limb_net(limb_iuv.reshape(nbs * 24, -1, s, s))
        limb_feat = limb_feat["x4"]
        limb_feat = self.limb_reslayer(
            limb_feat.reshape(nbs, -1, limb_feat.size(-2), limb_feat.size(-1))
        )
        rot_feats = limb_feat.reshape(nbs, 24, -1)

        pos_feats_init = self.r2p_gcn(rot_feats, self.r2p_A[0])
        graph_A = self.A_mask * F.relu(self.edge_importance)
        norm_graph_A = normalize_undigraph_t((self.I_n + graph_A)[0])
        pos_refined = pos_feats_init + self.refine_gcn(pos_feats_init, norm_graph_A)
        rot_refined = self.p2r_gcn(pos_refined, self.p2r_A[0])

        part_feats = rot_refined.reshape(nbs, -1, 1, 1)
        local_para = self.pose_regressors[-1](part_feats).reshape(nbs, -1)
        smpl_pose = local_para + self.mean_pose
        smpl_pose = rot6d_to_rotmat_t(smpl_pose).reshape(nbs, -1)
        return {"para": torch.cat([global_para, smpl_pose], dim=1)}


LIMB_BRANCH = [[0, 3, 6, 9, 12, 15], [13, 16, 18, 20, 22], [14, 17, 19, 21, 23],
               [1, 4, 7, 10], [2, 5, 8, 11]]
LIMB_BRANCH_LSTM = [[0, 3, 6, 9], [12, 15], [9, 13, 16, 18, 20, 22],
                    [9, 14, 17, 19, 21, 23], [0, 1, 4, 7, 10], [0, 2, 5, 8, 11]]


def _mlp1x1(cin, hidden, cout):
    return tnn.Sequential(
        tnn.Conv2d(cin, hidden, 1), tnn.BatchNorm2d(hidden), tnn.ReLU(True),
        tnn.Conv2d(hidden, cout, 1), tnn.BatchNorm2d(cout), tnn.ReLU(True),
    )


class TDecomposedPredictorLSTM(tnn.Module):
    """smpl_regressor.py 'lstm' strategy (init :528-580, forward :771-845),
    eval path: rot2pos kinematic sweep -> Bi-LSTM chains with the trunk's
    hidden-state handoff -> (parent, self, child) pos2rot -> grouped head."""

    def __init__(self, mean_cam_shape, mean_pose, glo_num_layers=18, limb_num_layers=18,
                 feat_dim=128, stack_num=1):
        super().__init__()
        self.stack_num = stack_num
        self.register_buffer("mean_cam_shape", torch.as_tensor(mean_cam_shape).reshape(1, 13))
        self.register_buffer("mean_pose", torch.as_tensor(mean_pose).reshape(1, 144))
        self.body_net = tnn.Sequential(
            tnn.Conv2d(75, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(glo_num_layers, in_channels=64, num_classes=13),
        )
        self.limb_net = tnn.Sequential(
            tnn.Conv2d(21, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(limb_num_layers, in_channels=64, num_classes=0, truncate=1),
        )
        self.limb_reslayer = TLimbResLayers(limb_num_layers, inplanes=256,
                                            outplanes=feat_dim, groups=24)
        self.limb_lstm = tnn.ModuleList()
        self.rot2pos = tnn.ModuleList()
        self.pos2rot = tnn.ModuleList()
        for _ in range(stack_num):
            self.limb_lstm.append(tnn.ModuleList([
                tnn.LSTM(feat_dim, feat_dim, num_layers=1, batch_first=True,
                         bidirectional=True) for _ in range(5)
            ]))
            self.rot2pos.append(tnn.ModuleList(
                [_mlp1x1(2 * feat_dim, 512, feat_dim) for _ in range(24)]
            ))
            self.pos2rot.append(_mlp1x1(feat_dim * 2 * 3, 1024, feat_dim))
        self.coord_regressors = tnn.ModuleList([tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(feat_dim * 24, 3 * 24, 1, groups=24))])
        for _ in range(stack_num):
            self.coord_regressors.append(tnn.Sequential(
                tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(feat_dim * 2 * 24, 3 * 24, 1, groups=24)))
        self.pose_regressors = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(1),
                           tnn.Conv2d(feat_dim * 24, 6 * 24, 1, groups=24))
            for _ in range(1 + stack_num)
        ])

    def forward(self, body_iuv, limb_iuv):
        nbs = body_iuv.size(0)
        global_para, _ = self.body_net(body_iuv)
        global_para = global_para + self.mean_cam_shape

        s = limb_iuv.size(-1)
        _, limb_feat = self.limb_net(limb_iuv.reshape(nbs * 24, -1, s, s))
        limb_feat = limb_feat["x4"]
        limb_feat = self.limb_reslayer(
            limb_feat.reshape(nbs, -1, limb_feat.size(-2), limb_feat.size(-1))
        )
        rot_feats = limb_feat.reshape(nbs, 24, -1, 1, 1)
        rot_feats_before = rot_feats

        for s_i in range(self.stack_num):
            pos_feats = {0: rot_feats_before[:, 0]}
            for br in LIMB_BRANCH:
                for ind in br:
                    p_ind = int(SMPL_PARENT[ind])
                    cat = torch.cat([pos_feats[p_ind], rot_feats_before[:, p_ind]], dim=1)
                    pos_feats[ind] = self.rot2pos[s_i][ind](cat)

            pos_feats_refined = {}
            hidden_feat = None
            for br in range(len(LIMB_BRANCH_LSTM)):
                pos_feat_in = torch.stack(
                    [pos_feats[i] for i in LIMB_BRANCH_LSTM[br]], dim=1
                ).squeeze(-1).squeeze(-1)
                if br == 0:
                    lstm_out, hidden_feat = self.limb_lstm[s_i][0](pos_feat_in)
                elif br == 1:
                    lstm_out, _ = self.limb_lstm[s_i][0](pos_feat_in, hidden_feat)
                elif br in (2, 3):
                    lstm_out, _ = self.limb_lstm[s_i][br - 1](pos_feat_in, hidden_feat)
                else:
                    lstm_out, _ = self.limb_lstm[s_i][br - 1](pos_feat_in)
                for i, ind in enumerate(LIMB_BRANCH_LSTM[br]):
                    if ind == 0 and br != 0:
                        continue
                    pos_feats_refined[ind] = lstm_out[:, i].unsqueeze(-1).unsqueeze(-1)

            for i in range(24):
                pos_feats[i] = pos_feats[i].repeat(1, 2, 1, 1) + pos_feats_refined[i]

            tri = [torch.cat([pos_feats[int(SMPL_PARENT[i])], pos_feats[i],
                              pos_feats[int(SMPL_CHILD2[i])]], dim=1) for i in range(24)]
            tri = torch.cat(tri, dim=0)
            tran = self.pos2rot[s_i](tri)
            tran = tran.reshape(24, nbs, -1, 1, 1).transpose(0, 1)
            part_feats = tran.contiguous().reshape(nbs, -1, 1, 1)
            local_para = self.pose_regressors[s_i + 1](part_feats).reshape(nbs, -1)
            smpl_pose = local_para + self.mean_pose
            smpl_pose = rot6d_to_rotmat_t(smpl_pose).reshape(nbs, -1)
        return {"para": torch.cat([global_para, smpl_pose], dim=1)}


class TDecomposedPredictorLSTMDirect(tnn.Module):
    """smpl_regressor.py 'lstm_direct' strategy (init :509-525, forward
    :727-766), eval path: Bi-LSTM chains directly on the rotation features
    (no rot2pos/pos2rot) -> grouped 9-channel heads emitting raw rotmats
    with no mean-pose residual and no 6D parametrization."""

    def __init__(self, mean_cam_shape, glo_num_layers=18, limb_num_layers=18,
                 feat_dim=128, stack_num=1):
        super().__init__()
        self.stack_num = stack_num
        self.register_buffer("mean_cam_shape", torch.as_tensor(mean_cam_shape).reshape(1, 13))
        self.body_net = tnn.Sequential(
            tnn.Conv2d(75, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(glo_num_layers, in_channels=64, num_classes=13),
        )
        self.limb_net = tnn.Sequential(
            tnn.Conv2d(21, 64, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(True),
            TSmplResNet(limb_num_layers, in_channels=64, num_classes=0, truncate=1),
        )
        self.limb_reslayer = TLimbResLayers(limb_num_layers, inplanes=256,
                                            outplanes=feat_dim, groups=24)
        self.limb_lstm = tnn.ModuleList()
        for _ in range(stack_num):
            self.limb_lstm.append(tnn.ModuleList([
                tnn.LSTM(feat_dim, feat_dim, num_layers=1, batch_first=True,
                         bidirectional=True) for _ in range(5)
            ]))
        self.pose_regressors = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(1),
                           tnn.Conv2d(feat_dim * 24, 9 * 24, 1, groups=24))
        ])
        for _ in range(stack_num):
            self.pose_regressors.append(tnn.Sequential(
                tnn.AdaptiveAvgPool2d(1),
                tnn.Conv2d(feat_dim * 2 * 24, 9 * 24, 1, groups=24)))

    def forward(self, body_iuv, limb_iuv):
        nbs = body_iuv.size(0)
        global_para, _ = self.body_net(body_iuv)
        global_para = global_para + self.mean_cam_shape

        s = limb_iuv.size(-1)
        _, limb_feat = self.limb_net(limb_iuv.reshape(nbs * 24, -1, s, s))
        limb_feat = limb_feat["x4"]
        limb_feat = self.limb_reslayer(
            limb_feat.reshape(nbs, -1, limb_feat.size(-2), limb_feat.size(-1))
        )
        rot_feats = limb_feat.reshape(nbs, 24, -1, 1, 1)

        smpl_pose = self.pose_regressors[0](
            rot_feats.reshape(nbs, -1, 1, 1)
        ).reshape(nbs, -1)
        for s_i in range(self.stack_num):
            pos_feats = {i: rot_feats[:, i] for i in range(24)}

            pos_feats_refined = {}
            hidden_feat = None
            for br in range(len(LIMB_BRANCH_LSTM)):
                pos_feat_in = torch.stack(
                    [pos_feats[i] for i in LIMB_BRANCH_LSTM[br]], dim=1
                ).squeeze(-1).squeeze(-1)
                if br == 0:
                    lstm_out, hidden_feat = self.limb_lstm[s_i][0](pos_feat_in)
                elif br == 1:
                    lstm_out, _ = self.limb_lstm[s_i][0](pos_feat_in, hidden_feat)
                elif br in (2, 3):
                    lstm_out, _ = self.limb_lstm[s_i][br - 1](pos_feat_in, hidden_feat)
                else:
                    lstm_out, _ = self.limb_lstm[s_i][br - 1](pos_feat_in)
                for i, ind in enumerate(LIMB_BRANCH_LSTM[br]):
                    if ind == 0 and br != 0:
                        continue
                    pos_feats_refined[ind] = lstm_out[:, i].unsqueeze(-1).unsqueeze(-1)

            for i in range(24):
                pos_feats[i] = pos_feats[i].repeat(1, 2, 1, 1) + pos_feats_refined[i]

            part_feats = torch.stack(
                [pos_feats[i] for i in range(24)], dim=1
            ).reshape(nbs, -1, 1, 1)
            smpl_pose = self.pose_regressors[s_i + 1](part_feats).reshape(nbs, -1)
        return {"para": torch.cat([global_para, smpl_pose], dim=1)}


class TSMPLRegressor(tnn.Module):
    def __init__(self, predictor):
        super().__init__()
        self.smpl_para_Outs = predictor


class TorchDaNet(tnn.Module):
    """danet.py:31-131 composition (eval/infer path)."""

    def __init__(self, backbone, mean_params, learned_ratio, learned_offset,
                 hrnet_stages=None, msres_num_layers=50, part_vis_thresh=0.5,
                 refine_strategy="gcn"):
        super().__init__()
        self.img2iuv = TIUVEstimator(
            backbone, learned_ratio, learned_offset, part_vis_thresh,
            hrnet_stages=hrnet_stages, msres_num_layers=msres_num_layers,
        )
        mcs = np.concatenate([mean_params.cam, mean_params.shape])
        if refine_strategy == "lstm":
            pred = TDecomposedPredictorLSTM(mcs, mean_params.pose6d)
        elif refine_strategy == "lstm_direct":
            pred = TDecomposedPredictorLSTMDirect(mcs)
        else:
            pred = TDecomposedPredictor(mcs, mean_params.pose6d)
        self.iuv2smpl = TSMPLRegressor(pred)

    @torch.no_grad()
    def infer_net(self, image):
        uv = self.img2iuv(image)
        u, v, index, ann = iuvmap_clean_t(*uv["uvia_pred"])
        iuv_map = torch.cat([u, v, index], dim=1)
        part_pred = uv["part_iuv_pred"]
        part_maps = []
        for p in range(part_pred.size(1)):
            pu, pv, pi, _ = iuvmap_clean_t(
                part_pred[:, p, 0], part_pred[:, p, 1], part_pred[:, p, 2]
            )
            part_maps.append(torch.stack([pu, pv, pi], dim=1))
        part_iuv_map = torch.stack(part_maps, dim=1)  # (B, 24, 3, 7, S, S)
        return self.iuv2smpl.smpl_para_Outs(iuv_map, part_iuv_map)["para"]


def randomize_twin(model: tnn.Module, seed: int = 0, scale: float = 0.05):
    """Random weights + non-trivial BN running stats everywhere, so the
    converted state_dict exercises every rule with real numbers."""
    rng = np.random.RandomState(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
                m.weight.copy_(torch.from_numpy(
                    rng.randn(*m.weight.shape).astype(np.float32) * scale))
                if m.bias is not None:
                    m.bias.copy_(torch.from_numpy(
                        rng.randn(*m.bias.shape).astype(np.float32) * scale))
            elif isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                n = m.num_features
                m.running_mean.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5))
                m.weight.copy_(torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
            elif isinstance(m, (TGraphConv, tnn.LSTM)):
                for p in m.parameters():
                    p.copy_(torch.from_numpy(
                        rng.randn(*p.shape).astype(np.float32) * scale))
        if hasattr(model, "iuv2smpl") and hasattr(model.iuv2smpl.smpl_para_Outs, "edge_importance"):
            ei = model.iuv2smpl.smpl_para_Outs.edge_importance
            ei.copy_(torch.from_numpy(rng.rand(*ei.shape).astype(np.float32) + 0.5))
