"""Full DaNet checkpoint name map: released .pt state_dict -> this framework.

Torch tree (reference danet.py / iuv_estimator.py / smpl_regressor.py):
  img2iuv.learned_ratio / learned_offset
  img2iuv.iuv_est.<backbone>                (HRNet or PoseResNet)
  img2iuv.iuv_est.final_pred.predict_{u,v,uv_index,ann_index,hm,partial_iuv}
  iuv2smpl.smpl_para_Outs.body_net.{0,1,3.<SmplResNet>}
  iuv2smpl.smpl_para_Outs.limb_net.{0,1,3.<SmplResNet truncate=1>}
  iuv2smpl.smpl_para_Outs.limb_reslayer.layer4.<blocks>
  iuv2smpl.smpl_para_Outs.{r2p_gcn,refine_gcn,p2r_gcn}.gc.{i} + act.{i}.0
  iuv2smpl.smpl_para_Outs.edge_importance
  iuv2smpl.smpl_para_Outs.pose_regressors.{0,1}.1 / coord_regressors.{0,1}.1

Block-level layouts are numerically validated in tests/test_port_blocks.py;
`synthesize_torch_state_dict` builds a shape-correct fake state_dict from a
rule list so the full map is structurally testable without the released
checkpoints.
"""

from __future__ import annotations

import numpy as np

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.nn.hrnet import HRNET_W48_STAGES
from danet_densepose2smpl_tpu.port.blocks import (
    basic_block_rules,
    bn_rules,
    conv_rules,
    hrnet_rules,
    res_layer_rules,
    smpl_resnet_rules,
)
from danet_densepose2smpl_tpu.port.convert import (
    convert_conv,
    convert_deconv,
    convert_grouped_head,
    convert_grouped_head_bias,
    convert_linear,
)


def iuv_head_rules(tpre: str, fpath: tuple) -> list:
    """IUV_predict_layer map (reference res_module.py:281-390). The heatmap
    trunk is 3 Bottlenecks + a conv (torch `predict_hm.0.{i}` + `predict_hm.1`)."""
    rules = []
    for tname, fname in (
        ("predict_u", "predict_u"),
        ("predict_v", "predict_v"),
        ("predict_uv_index", "predict_uv_index"),
        ("predict_ann_index", "predict_ann_index"),
    ):
        rules += conv_rules(f"{tpre}.{tname}", fpath + (fname,), bias=True)
    # trunk: 3 Bottlenecks at feat_dim/4 planes; in==out so no projection
    rules += res_layer_rules(f"{tpre}.predict_hm.0", fpath + ("hm_trunk",), "bottleneck", 3, False)
    rules += conv_rules(f"{tpre}.predict_hm.1", fpath + ("predict_hm",), bias=True)
    return rules


def adapter_rules(tpre: str, fpath: tuple) -> list:
    """Conv1x1BNRelu adapter = torch Sequential(conv, bn, relu) prefix .0/.1."""
    rules = conv_rules(f"{tpre}.0", fpath + ("Conv_0",))
    rules += bn_rules(f"{tpre}.1", fpath + ("NormAct_0", "norm"))
    return rules


def gcn_rules(tpre: str, fpath: tuple, num_layers: int) -> list:
    """GCN map (reference GCN.py): gc.{i}.weight/bias + act.{i}.0 BatchNorm1d."""
    rules = []
    for i in range(num_layers):
        rules += [
            (f"{tpre}.gc.{i}.weight", ("params",) + fpath + (f"gc{i}", "weight"), np.asarray),
            (f"{tpre}.gc.{i}.bias", ("params",) + fpath + (f"gc{i}", "bias"), np.asarray),
        ]
        rules += bn_rules(f"{tpre}.act.{i}.0", fpath + (f"bn{i}",))
    return rules


def _edge_importance_t(w) -> np.ndarray:
    """Torch registers edge_importance as (1, 24, 24) (reference
    smpl_regressor.py:668-674); named so the manifest can invert it exactly
    (a probe cannot distinguish (1,24,24) from (576,))."""
    return np.asarray(w).reshape(24, 24)


def grouped_head_rules(tpre: str, fpath: tuple) -> list:
    """pose/coord regressor: Sequential(pool, grouped 1x1 conv) -> PartwiseDense."""
    return [
        (f"{tpre}.1.weight", ("params",) + fpath + ("kernel",), lambda w: convert_grouped_head(w, 24)),
        (f"{tpre}.1.bias", ("params",) + fpath + ("bias",), lambda b: convert_grouped_head_bias(b, 24)),
    ]


def mlp1x1_rules(tpre: str, fpath: tuple) -> list:
    """rot2pos / pos2rot torch Sequential(conv1x1, bn, relu, conv1x1, bn,
    relu) (reference smpl_regressor.py:536-558) -> flax MLP1x1."""
    rules = conv_rules(f"{tpre}.0", fpath + ("Conv_0",), bias=True)
    rules += bn_rules(f"{tpre}.1", fpath + ("NormAct_0", "norm"))
    rules += conv_rules(f"{tpre}.3", fpath + ("Conv_1",), bias=True)
    rules += bn_rules(f"{tpre}.4", fpath + ("NormAct_1", "norm"))
    return rules


def _lstm_gate_w(k: int):
    """Gate k slice of a torch LSTM weight (4H, D), transposed to (D, H).
    Torch and flax share the i, f, g, o gate order."""

    def t(w):
        w = np.asarray(w)
        h = w.shape[0] // 4
        return np.transpose(w[k * h : (k + 1) * h], (1, 0))

    return t


def _lstm_gate_b(k: int):
    def t(b):
        b = np.asarray(b)
        h = b.shape[0] // 4
        return b[k * h : (k + 1) * h]

    return t


def fuse_lstm_biases(sd: dict) -> dict:
    """Torch LSTMs carry two bias vectors per direction (b_ih + b_hh, always
    summed); flax OptimizedLSTMCell has one (on the recurrent dense). Fuse
    them so each flax bias maps to exactly one torch-side key."""
    out = dict(sd)
    for k in list(sd):
        if ".bias_ih_l0" in k:
            hh = k.replace("bias_ih", "bias_hh")
            if hh not in sd:
                continue  # preflight will flag the unfused key as unmapped
            out[k.replace("bias_ih", "bias")] = np.asarray(sd[k]) + np.asarray(sd[hh])
            del out[k]
            del out[hh]
    return out


def lstm_rules(tpre: str, fpath: tuple) -> list:
    """One torch bidirectional nn.LSTM (num_layers=1, batch_first) -> flax
    BiLSTM (fwd/bwd OptimizedLSTMCells). Expects biases pre-fused by
    `fuse_lstm_biases` ({tpre}.bias_l0[_reverse])."""
    rules = []
    # BiLSTM constructs the fwd cell first, then the bwd cell, so flax
    # auto-names them OptimizedLSTMCell_0 (fwd) and _1 (bwd)
    for direction, sfx in (("OptimizedLSTMCell_0", ""), ("OptimizedLSTMCell_1", "_reverse")):
        cell = fpath + (direction,)
        for k, g in enumerate("ifgo"):
            rules += [
                (f"{tpre}.weight_ih_l0{sfx}", ("params",) + cell + (f"i{g}", "kernel"), _lstm_gate_w(k)),
                (f"{tpre}.weight_hh_l0{sfx}", ("params",) + cell + (f"h{g}", "kernel"), _lstm_gate_w(k)),
                (f"{tpre}.bias_l0{sfx}", ("params",) + cell + (f"h{g}", "bias"), _lstm_gate_b(k)),
            ]
    return rules


def danet_rules(cfg: DaNetConfig) -> list:
    """The complete released-checkpoint map for the default 'gcn' DaNet."""
    rules = []

    # STN crop parameters (buffers in 'iuv' mode)
    rules += [
        ("img2iuv.learned_ratio", ("params", "img2iuv", "stn_ratio"), np.asarray),
        ("img2iuv.learned_offset", ("params", "img2iuv", "stn_offset"), np.asarray),
    ]

    bpre = "img2iuv.iuv_est"
    bpath = ("img2iuv", "backbone")
    if cfg.iuv_regressor == "hrnet":
        rules += [(f"{bpre}.{k}", d, t) for k, d, t in _strip(hrnet_rules(HRNET_W48_STAGES, bpath))]
    else:
        rules += smpl_resnet_like_pose_resnet(bpre, bpath, cfg.msres_num_layers)

    rules += iuv_head_rules(f"{bpre}.final_pred", ("img2iuv", "iuv_head"))
    if cfg.decomposed:
        # the grouped partial head lives in its own flax module beside the
        # iuv head (groups=24 3x3 conv keeps the plain conv layout rule)
        rules += conv_rules(
            f"{bpre}.final_pred.predict_partial_iuv",
            ("img2iuv", "partial_head", "predict_partial_iuv"), bias=True,
        )

    rpre = "iuv2smpl.smpl_para_Outs"
    rpath = ("iuv2smpl",)
    rules += adapter_rules(f"{rpre}.body_net", rpath + ("body_adapter",))
    rules += smpl_resnet_rules(f"{rpre}.body_net.3", rpath + ("body_net",), cfg.glo_num_layers, 13)
    rules += adapter_rules(f"{rpre}.limb_net", rpath + ("limb_adapter",))
    rules += smpl_resnet_rules(
        f"{rpre}.limb_net.3", rpath + ("limb_net",), cfg.limb_num_layers, 0, truncate=1
    )
    rules += res_layer_rules(
        f"{rpre}.limb_reslayer.layer4", rpath + ("limb_reslayer", "layer4"), "basic", 2, True
    )

    r = cfg.refinement
    if cfg.refine_strategy in ("gcn", "gcn_direct"):
        if cfg.refine_strategy == "gcn":
            rules += gcn_rules(f"{rpre}.r2p_gcn", rpath + ("r2p_gcn",), 1)
            rules += gcn_rules(f"{rpre}.p2r_gcn", rpath + ("p2r_gcn",), 1)
        rules += gcn_rules(f"{rpre}.refine_gcn", rpath + ("refine_gcn",), r.gcn_num_layer)
        rules += [
            (f"{rpre}.edge_importance", ("params",) + rpath + ("edge_importance",),
             _edge_importance_t),
        ]
        rules += grouped_head_rules(f"{rpre}.pose_regressors.0", rpath + ("pose_regressor_0",))
        rules += grouped_head_rules(f"{rpre}.pose_regressors.1", rpath + ("pose_regressor_1",))
        if cfg.refine_strategy == "gcn":
            rules += grouped_head_rules(f"{rpre}.coord_regressors.0", rpath + ("coord_regressor_0",))
            rules += grouped_head_rules(f"{rpre}.coord_regressors.1", rpath + ("coord_regressor_1",))
    elif cfg.refine_strategy == "lstm":
        # reference smpl_regressor.py:528-580: per-stack rot2pos MLPs (all 24
        # joints), 5 Bi-LSTMs, one shared pos2rot, grouped pose/coord heads
        rules += grouped_head_rules(f"{rpre}.pose_regressors.0", rpath + ("pose_regressor_0",))
        for s in range(r.stack_num):
            for j in range(5):
                rules += lstm_rules(
                    f"{rpre}.limb_lstm.{s}.{j}", rpath + (f"lstm_{s}_{j}",)
                )
            for ind in range(24):
                rules += mlp1x1_rules(
                    f"{rpre}.rot2pos.{s}.{ind}", rpath + (f"rot2pos_{s}_{ind}",)
                )
            rules += mlp1x1_rules(f"{rpre}.pos2rot.{s}", rpath + (f"pos2rot_{s}",))
            rules += grouped_head_rules(
                f"{rpre}.pose_regressors.{s + 1}", rpath + (f"pose_regressor_{s + 1}",)
            )
            rules += grouped_head_rules(
                f"{rpre}.coord_regressors.{s}", rpath + (f"coord_regressor_{s}_pre",)
            )
            rules += grouped_head_rules(
                f"{rpre}.coord_regressors.{s + 1}", rpath + (f"coord_regressor_{s}_post",)
            )
    else:
        # 'lstm_direct' (reference smpl_regressor.py:509-525, :727-766):
        # per-stack 5 Bi-LSTMs + grouped 9-ch pose heads only — no
        # rot2pos/pos2rot MLPs and no coord regressors
        rules += grouped_head_rules(f"{rpre}.pose_regressors.0", rpath + ("pose_regressor_0",))
        for s in range(r.stack_num):
            for j in range(5):
                rules += lstm_rules(
                    f"{rpre}.limb_lstm.{s}.{j}", rpath + (f"lstm_{s}_{j}",)
                )
            rules += grouped_head_rules(
                f"{rpre}.pose_regressors.{s + 1}", rpath + (f"pose_regressor_direct_{s}",)
            )
    return rules


def _strip(rules):
    """hrnet_rules emits bare torch keys; reattach under a prefix."""
    return [(k, d, t) for (k, d, t) in rules]


def smpl_resnet_like_pose_resnet(tpre: str, fpath: tuple, depth: int) -> list:
    """PoseResNet map: resnet trunk + 3 deconv layers (torch
    `deconv_layers.{0,3,6}` convs and `{1,4,7}` bns)."""
    rules = smpl_resnet_rules(tpre, fpath, depth, num_classes=0)
    for di in range(3):
        rules += [
            (f"{tpre}.deconv_layers.{di * 3}.weight",
             ("params",) + fpath + (f"deconv{di}", "ConvTranspose_0", "kernel"), convert_deconv),
        ]
        rules += bn_rules(f"{tpre}.deconv_layers.{di * 3 + 1}", fpath + (f"deconv{di}", "NormAct_0", "norm"))
    return rules


def expected_torch_shapes(rules, variables) -> dict:
    """Torch-side key -> expected shape manifest, inverted from the flax
    template through each rule's layout transform. This is the released-
    checkpoint contract: a real .pt must carry exactly these keys at these
    shapes (reference module definitions, README.md:94-107)."""
    from danet_densepose2smpl_tpu.port.convert import _flatten

    flat = {col: _flatten(variables.get(col, {})) for col in ("params", "batch_stats")}
    manifest = {}
    for torch_key, dest, transform in rules:
        col, *path = dest
        tgt = flat[col].get(tuple(path))
        if tgt is None:
            raise KeyError(f"rule {torch_key}: no flax leaf {col}/{'/'.join(path)}")
        shape = tuple(tgt.shape)
        if transform is convert_conv:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif transform is convert_deconv:
            tshape = (shape[2], shape[3], shape[0], shape[1])
        elif transform is convert_linear:
            tshape = (shape[1], shape[0])
        elif transform is np.asarray or transform is None:
            tshape = shape
        elif transform is _edge_importance_t:
            tshape = (1,) + shape
        else:
            # grouped heads / reshapes: probe by transforming a trial array
            tshape = _probe_inverse(transform, shape)
        prev = manifest.get(torch_key)
        if prev is not None and prev != tshape:
            # several rules slice one torch tensor (LSTM gates): keep the
            # full torch-side shape, which every slicing rule agrees on
            raise ValueError(f"{torch_key}: inconsistent shapes {prev} vs {tshape}")
        manifest[torch_key] = tshape
    return manifest


def synthesize_torch_state_dict(rules, variables) -> dict:
    """Shape-correct fake torch state_dict from a rule list + flax template
    (structural testing without the released files)."""
    inv = {}
    rng = np.random.RandomState(0)
    for torch_key, tshape in expected_torch_shapes(rules, variables).items():
        val = rng.randn(*tshape).astype(np.float32) * 0.05
        if torch_key.endswith("running_var"):
            val = np.abs(val) + 0.5  # variances must be positive
        inv[torch_key] = val
    return inv


def _probe_inverse(transform, out_shape):
    """Find a torch-side shape whose transform yields `out_shape` by trying
    the known grouped/reshape layouts."""
    candidates = [
        (out_shape[0] * out_shape[-1], out_shape[1], 1, 1) if len(out_shape) == 3 else None,  # grouped kernel
        (out_shape[0] * out_shape[-1],) if len(out_shape) == 2 else None,                      # grouped bias
        (1,) + out_shape if len(out_shape) == 2 else None,                                     # edge importance (1,24,24)
        (4 * out_shape[1], out_shape[0]) if len(out_shape) == 2 else None,                     # lstm gate weight slice
        (4 * out_shape[0],) if len(out_shape) == 1 else None,                                  # lstm gate bias slice
    ]
    for cand in candidates:
        if cand is None:
            continue
        try:
            if tuple(np.asarray(transform(np.zeros(cand, np.float32))).shape) == tuple(out_shape):
                return cand
        except Exception:
            continue
    raise ValueError(f"cannot invert transform for target shape {out_shape}")


def load_danet_checkpoint(pt_path: str, cfg: DaNetConfig, variables: dict, strict: bool = True):
    """Load a released reference checkpoint (.pt) into flax variables.

    The files store {'model': state_dict}; DataParallel 'module.' prefixes
    are stripped (reference res_module.py:262-270). Returns
    (variables, report)."""
    import torch

    from danet_densepose2smpl_tpu.port.convert import apply_rules

    ckpt = torch.load(pt_path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {
        (k[7:] if k.startswith("module.") else k): v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
    }
    sd = fuse_lstm_biases(sd)
    return apply_rules(sd, variables, danet_rules(cfg), strict=strict)


def hmr_rules() -> list:
    """HMR/SPIN checkpoint map (reference models/hmr.py:51-154): ResNet-50
    trunk (torchvision names) + fc1/fc2 + decpose/decshape/deccam heads."""
    rules = []
    rules += conv_rules("conv1", ("conv1",))
    rules += bn_rules("bn1", ("bn1", "norm"))
    counts = (3, 4, 6, 3)
    in_ch = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        stride = 1 if li == 0 else 2
        has_ds = stride != 1 or in_ch != planes * 4
        rules += res_layer_rules(f"layer{li + 1}", (f"layer{li + 1}",), "bottleneck", counts[li], has_ds)
        in_ch = planes * 4
    for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        rules += [
            (f"{name}.weight", ("params", name, "kernel"), convert_linear),
            (f"{name}.bias", ("params", name, "bias"), np.asarray),
        ]
    return rules


def load_hmr_checkpoint(pt_path: str, variables: dict, strict: bool = True):
    """Load a released SPIN/HMR checkpoint into the flax HMR baseline."""
    import torch

    from danet_densepose2smpl_tpu.port.convert import apply_rules

    ckpt = torch.load(pt_path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {
        (k[7:] if k.startswith("module.") else k): v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
    }
    # the HMR baseline stores mean-param buffers we don't port (init args)
    sd = {k: v for k, v in sd.items() if not k.startswith("init_")}
    return apply_rules(sd, variables, hmr_rules(), strict=strict)
