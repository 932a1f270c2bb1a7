"""Immutable configuration tree.

Replaces the reference's global mutable `cfg` AttrDict singleton
(`models/core/config.py:23-26` + YAML merge) with frozen dataclasses passed
explicitly. `load_config` ingests the reference's YAML layout
(`configs/danet_default.yaml`) so shipped configs keep working; unknown or
Detectron-legacy keys are ignored.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Sequence


@dataclass(frozen=True)
class SolverConfig:
    base_lr: float = 1e-4
    steps: tuple = (0, 30000, 60000)   # LR decays 10x at each step boundary
    max_iter: int = 500000
    optimizer: str = "adam"


@dataclass(frozen=True)
class RefinementConfig:
    refine_on: bool = True
    stack_num: int = 1
    feat_dim: int = 128
    gcn_num_layer: int = 3
    pos_intersupv: bool = True


@dataclass(frozen=True)
class DaNetConfig:
    """Model architecture + loss-weight operating point (YAML `DANET:` block)."""

    img_size: int = 224
    heatmap_size: int = 56
    num_patches: int = 24
    decomposed: bool = True
    input_mode: str = "iuv"          # 'iuv' | 'iuv_gt' (oracle) | 'iuv_feat' |
                                     # 'iuv_gt_feat' | 'feat' | 'seg' (ablations)
    use_6d_rot: bool = True
    iuv_regressor: str = "hrnet"     # 'hrnet' | 'resnet'
    glo_num_layers: int = 18         # body-net ResNet depth
    limb_num_layers: int = 18        # limb-net ResNet depth
    smpl_model_type: str = "neutral"
    gtcam_for_repj: bool = True
    gtshape_for_repj: bool = True

    # loss weights (YAML DANET:17-50)
    index_weights: float = 2.0             # 15-part ann seg CE
    part_weights: float = 0.3              # 25-patch point CE
    point_regression_weights: float = 0.5  # sparse UV smooth-l1
    smpl_pose_weights: float = 60.0
    smpl_betas_weights: float = 0.06
    proj_kps_weights: float = 300.0
    kps3d_weights: float = 300.0
    verts_weights: float = 0.0
    orthogonal_weights: float = 0.0
    joint_position_weights: float = 1.0
    stn_kps_weights: float = 1.0
    stn_hm_weights: float = 0.0

    # STN (joint-centric RoI pooling)
    stn_center_jitter: float = 0.1
    stn_scale_jitter: float = 0.2
    stn_part_vis_score: float = 0.5
    use_learned_ratio: bool = True
    partdrop_rate: float = 0.3

    refine_strategy: str = "gcn"     # 'gcn' | 'gcn_direct' | 'lstm' | 'lstm_direct'
    refinement: RefinementConfig = field(default_factory=RefinementConfig)

    # backbone spec
    msres_num_layers: int = 50       # PoseResNet depth when iuv_regressor='resnet'
    hrnet_width: int = 48
    # MXU-underfill experiment (PERF.md): zero-pad the 48/96-ch HRNet
    # branches to 64/128 so convs fill the 128-lane MXU. Numerics-preserving
    # for ported checkpoints (padded weights are zero); changes the randomly
    # initialized topology, so OFF by default.
    hrnet_pad_channels: bool = False

    # numerics
    compute_dtype: str = "float32"   # 'bfloat16' flips conv/matmul activations
    # Rematerialize the IUV backbone in the backward pass (jax.checkpoint):
    # trades ~1/3 more backbone FLOPs for not keeping its activations live,
    # lifting the trainable batch per chip (B=64 fp32 OOMs 16 GB HBM
    # without it; the reference never faces this at B=16/GPU).
    remat_backbone: bool = False
    # Remat granularity. 'backbone' = one jax.checkpoint over the whole
    # backbone: the backward re-runs the ENTIRE forward and holds its full
    # activation set live while backpropping through it. 'modules' = each
    # HRNet stage module (and stem layer1) checkpoints separately: same
    # recompute FLOPs (everything still re-runs exactly once), but only ONE
    # module's activations are ever live in the backward — strictly less
    # peak HBM, admitting larger batches. 'early' = per-module remat for
    # stem/stage2/stage3 but stage4 (the FLOP-heaviest ~half of the
    # backbone) keeps its activations: spends HBM headroom to skip most of
    # the re-forward FLOPs (r5: the remat re-forward was the largest single
    # line item left in the B=128 train step).
    remat_scope: str = "backbone"    # 'backbone' | 'modules' | 'early'
    # Pallas crop+head fusion at inference. Default OFF: the kernel's
    # in-kernel (H, W, C)->(H, W*C) shape cast fails Mosaic vector-layout
    # inference on real v5e hardware (it passes only in interpret mode);
    # the XLA separable-matmul path is the validated serving path until the
    # kernel is restructured around Mosaic-legal layouts.
    fused_part_head: bool = False
    # Serving-memory knob: split the STN crop + grouped partial-IUV-head
    # subgraph into N sequential part chunks (24 % N == 0). The (B, S, S,
    # 24*C) crop tensor is the serving peak-HBM driver (B=512 bf16 OOMs at
    # 3.7 GB of crops alone); chunks are order-forced with an
    # optimization_barrier so peak crop memory divides by N. Numerics
    # identical (tests/test_danet_model.py). Inference-only; 1 = off.
    part_head_chunks: int = 1

    def __post_init__(self):
        # Fail fast on knobs we deliberately don't wire instead of silently
        # accepting them. All working reference INPUT_MODE ablations
        # (danet.py:67-124) are implemented; 'rgb' is rejected because the
        # reference's own inference wiring for it is broken (infer_net has no
        # 'rgb' branch -> UnboundLocalError at danet.py:109-124) and no
        # shipped config uses it.
        supported_modes = ("iuv", "iuv_gt", "iuv_feat", "iuv_gt_feat", "feat", "seg")
        if self.input_mode not in supported_modes:
            raise ValueError(
                f"input_mode '{self.input_mode}' is not implemented; supported: "
                f"{supported_modes}. 'rgb' is deliberately rejected: the "
                "reference's inference path for it is broken (see PARITY.md)."
            )
        if self.refine_strategy not in ("gcn", "gcn_direct", "lstm", "lstm_direct"):
            raise ValueError(
                f"unknown refine_strategy '{self.refine_strategy}' "
                "(supported: gcn, gcn_direct, lstm, lstm_direct)"
            )
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown compute_dtype '{self.compute_dtype}' (supported: "
                "float32, bfloat16 — bf16 runs the train-step forward in "
                "mixed precision, enabled via `train --bf16`; serving casts "
                "params independently of this knob)"
            )
        if self.iuv_regressor not in ("hrnet", "resnet"):
            raise ValueError(
                f"unknown iuv_regressor '{self.iuv_regressor}' (supported: hrnet, resnet)"
            )
        if self.remat_scope not in ("backbone", "modules", "early"):
            raise ValueError(
                f"unknown remat_scope '{self.remat_scope}' "
                "(supported: backbone, modules, early)"
            )
        if self.part_head_chunks < 1 or self.num_patches % self.part_head_chunks:
            raise ValueError(
                f"part_head_chunks={self.part_head_chunks} must divide "
                f"num_patches={self.num_patches}"
            )


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    num_epochs: int = 10
    pretr_step: int = 5000           # IUV-only pretrain steps (two-stage schedule)
    openpose_train_weight: float = 0.0
    gt_train_weight: float = 1.0
    noise_factor: float = 0.4
    rot_factor: float = 30.0
    scale_factor: float = 0.25
    checkpoint_steps: int = 20000
    summary_steps: int = 100
    vis_interval: int = 1000
    test_steps: int = 10000
    train_data: str = "h36m_dp"      # 'h36m_dp' | 'h36m_coco_itw'
    seed: int = 0
    prefetch_workers: int = -1       # -1 = core-count-aware default
                                     # (PrefetchLoader), 0 = synchronous


@dataclass(frozen=True)
class Config:
    solver: SolverConfig = field(default_factory=SolverConfig)
    danet: DaNetConfig = field(default_factory=DaNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def default_config() -> Config:
    return Config()


def _lower_keys(d: dict) -> dict:
    return {k.lower(): v for k, v in d.items()}


def load_config(yaml_path: str | None = None, overrides: dict | None = None) -> Config:
    """Build a Config, optionally merging a reference-layout YAML file.

    Recognized YAML sections: SOLVER, DANET (incl. REFINEMENT), TRAIN.
    Unknown keys (Detectron legacy, HR_MODEL/MSRES_MODEL architecture blocks
    whose values are already our defaults) are skipped.
    """
    cfg = default_config()
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}

        if "SOLVER" in raw:
            s = _lower_keys(raw["SOLVER"])
            cfg = replace(
                cfg,
                solver=replace(
                    cfg.solver,
                    base_lr=float(s.get("base_lr", cfg.solver.base_lr)),
                    steps=tuple(s.get("steps", cfg.solver.steps)),
                    max_iter=int(s.get("max_iter", cfg.solver.max_iter)),
                    optimizer=str(s.get("type", cfg.solver.optimizer)).lower(),
                ),
            )
        if "DANET" in raw:
            d = _lower_keys(raw["DANET"])
            danet_fields = {f.name for f in dataclasses.fields(DaNetConfig)}
            renames = {"inimg_size": "img_size"}
            kw = {}
            for k, v in d.items():
                k = renames.get(k, k)
                if k == "refinement":
                    r = _lower_keys(v)
                    kw["refinement"] = RefinementConfig(
                        refine_on=bool(r.get("refine_on", True)),
                        stack_num=int(r.get("stack_num", 1)),
                        feat_dim=int(r.get("feat_dim", 128)),
                        gcn_num_layer=int(r.get("gcn_num_layer", 3)),
                        pos_intersupv=bool(r.get("pos_intersupv", True)),
                    )
                elif k in danet_fields:
                    kw[k] = v
            cfg = replace(cfg, danet=replace(cfg.danet, **kw))
        if "TRAIN" in raw:
            t = _lower_keys(raw["TRAIN"])
            if "batch_size" in t:
                cfg = replace(cfg, train=replace(cfg.train, batch_size=int(t["batch_size"])))

    if overrides:
        for dotted, v in overrides.items():
            section, name = dotted.split(".", 1)
            sub = getattr(cfg, section)
            cfg = replace(cfg, **{section: replace(sub, **{name: v})})
    return cfg
