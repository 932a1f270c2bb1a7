"""SMPL parameter regressors: global and decomposed predictors.

Parity: reference `models/danet/smpl_regressor.py` — `GlobalPredictor`
(`:321-395`): one ResNet on the stacked 75-ch IUV map -> 229 params;
`DecomposedPredictor` (`:397-942`): body-net (cam+shape) + grouped limb-net
over 24 partial IUV stacks + position-aided rotation-feature refinement
('gcn' strategy: rot2pos GCN over ancestor chains, learned-edge skeleton
GCN, pos2rot GCN over (parent, self, child)), grouped 6D pose regressors
added to the mean pose.

TPU-native: the groups=24 1x1-conv regressors become per-part einsum Dense
layers; adjacency constants are precomputed numpy; the learned-edge
re-normalization happens in-graph each call (as in the reference).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.nn.gcn import GCN, normalize_undigraph
from danet_densepose2smpl_tpu.nn.layers import NormAct
from danet_densepose2smpl_tpu.nn.resnet import LimbResLayers, SmplResNet, _xavier_gain
from danet_densepose2smpl_tpu.ops.rotations import rot6d_to_rotmat
from danet_densepose2smpl_tpu.ops.structure import (
    pos2rot_adjacency,
    refine_edge_mask,
    rot2pos_adjacency,
)


class MeanParams(NamedTuple):
    """SPIN mean parameters (cam 3, shape 10, pose 24x6D)."""

    cam: np.ndarray
    shape: np.ndarray
    pose6d: np.ndarray


def default_mean_params() -> MeanParams:
    """T-pose / unit-scale fallback when smpl_mean_params.npz is absent:
    identity rotations in 6D ([1,0,0,1,0,0] per joint), zero shape,
    cam scale ~0.9 (SPIN's mean camera is close to this)."""
    pose = np.tile(np.array([1, 0, 0, 1, 0, 0], dtype=np.float32), 24)
    return MeanParams(
        cam=np.array([0.9, 0.0, 0.0], dtype=np.float32),
        shape=np.zeros(10, dtype=np.float32),
        pose6d=pose,
    )


def load_mean_params(path: str | None) -> MeanParams:
    """Load SPIN's smpl_mean_params.npz (keys: pose (144,), shape, cam)."""
    if path is None:
        return default_mean_params()
    d = np.load(path)
    return MeanParams(
        cam=np.asarray(d["cam"], dtype=np.float32).reshape(3),
        shape=np.asarray(d["shape"], dtype=np.float32).reshape(10),
        pose6d=np.asarray(d["pose"], dtype=np.float32).reshape(24 * 6),
    )


class PartwiseDense(nn.Module):
    """Per-part linear head: the einsum form of a groups=24 1x1 conv over
    (B, 24*C, 1, 1) feature stacks (reference pose/coord regressors)."""

    out_dim: int
    num_parts: int = 24
    init_gain: float | None = None

    @nn.compact
    def __call__(self, x):
        # x: (B, P, C)
        init = _xavier_gain(self.init_gain) if self.init_gain is not None else nn.initializers.lecun_normal()
        w = self.param("kernel", init, (self.num_parts, x.shape[-1], self.out_dim), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.num_parts, self.out_dim), jnp.float32)
        return jnp.einsum("bpc,pcd->bpd", x, w) + b


class Conv1x1BNRelu(nn.Module):
    features: int
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return NormAct(not self.train, axis_name=self.axis_name)(x)


class MLP1x1(nn.Module):
    """conv1x1 -> BN -> ReLU -> conv1x1 -> BN -> ReLU on (B, N, C) features
    (the reference's rot2pos / pos2rot heads operate on 1x1 maps)."""

    hidden: int
    out: int
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        # treat the node axis as batch for BN parity: reference BN2d over C
        # with spatial 1x1 normalizes per-channel over (B*24) samples.
        b, n, c = x.shape
        y = x.reshape(b * n, 1, 1, c)
        y = nn.Conv(self.hidden, (1, 1))(y)
        y = NormAct(not self.train, axis_name=self.axis_name)(y)
        y = nn.Conv(self.out, (1, 1))(y)
        y = NormAct(not self.train, axis_name=self.axis_name)(y)
        return y.reshape(b, n, self.out)


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM with explicit carry handoff.

    Matches torch `nn.LSTM(F, F, num_layers=1, batch_first=True,
    bidirectional=True)` semantics: returns (y (B, T, 2F), final carries
    ((fwd_c, fwd_h), (bwd_c, bwd_h))) so the reference's hidden-state reuse
    between kinematic branches (`smpl_regressor.py:800-815`) carries over.
    """

    features: int

    @nn.compact
    def __call__(self, x, init=None):
        # carry dtype must follow the activation dtype (f64 parity runs)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.features, param_dtype=x.dtype),
                     return_carry=True, name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.features, param_dtype=x.dtype),
                     return_carry=True, name="bwd")
        if init is not None:
            cf, yf = fwd(x, initial_carry=init[0])
            cb, yb = bwd(x[:, ::-1], initial_carry=init[1])
        else:
            cf, yf = fwd(x)
            cb, yb = bwd(x[:, ::-1])
        return jnp.concatenate([yf, yb[:, ::-1]], axis=-1), (cf, cb)


# Kinematic-branch orders of the LSTM strategies (reference
# smpl_regressor.py:459-476): limb branches for the rot2pos sweep, and the
# root-anchored chains the Bi-LSTMs run along.
LIMB_BRANCHES = (
    (0, 3, 6, 9, 12, 15),
    (13, 16, 18, 20, 22),
    (14, 17, 19, 21, 23),
    (1, 4, 7, 10),
    (2, 5, 8, 11),
)
LSTM_CHAINS = (
    (0, 3, 6, 9),
    (12, 15),
    (9, 13, 16, 18, 20, 22),
    (9, 14, 17, 19, 21, 23),
    (0, 1, 4, 7, 10),
    (0, 2, 5, 8, 11),
)


class GlobalPredictor(nn.Module):
    """Single ResNet on the stacked input map -> 229 params.

    Input channels follow the input_mode (reference smpl_regressor.py:332-346):
    75 ('iuv'/'iuv_gt'), 75+C ('iuv_feat'/'iuv_gt_feat' — IUV concat backbone
    features), C ('feat'), 25 ('seg', the cleaned index map)."""

    cfg: DaNetConfig
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, iuv_map, global_feats=None):
        xs = [t for t in (iuv_map, global_feats) if t is not None]
        body_in = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
        x = Conv1x1BNRelu(64, self.train, self.axis_name)(body_in)
        para, _ = SmplResNet(
            resnet_nums=self.cfg.glo_num_layers, num_classes=229,
            train=self.train, axis_name=self.axis_name, name="conv_body",
        )(x)
        return {"para": para}


class DecomposedPredictor(nn.Module):
    cfg: DaNetConfig
    mean_params: MeanParams
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        iuv_map: jnp.ndarray | None,
        part_iuv_map: jnp.ndarray | None,
        global_feats: jnp.ndarray | None = None,
        part_feats: jnp.ndarray | None = None,
    ) -> dict:
        """iuv_map: (B, 56, 56, 75) — or (B, 56, 56, 25) cleaned index map in
        'seg' mode, or None in 'feat' mode; part_iuv_map: (B, 24, 56, 56, 3, 7)
        partial IUV stacks — or (B, 24, 56, 56, 7) index stacks ('seg'), or
        None ('feat'). global_feats / part_feats: backbone feature map and its
        STN crops for the *_feat / 'feat' ablations (concatenated onto the
        body / limb inputs, reference smpl_regressor.py:412-426, :689-721).

        Returns {'para': (B, 229), 'joint_position': [...], 'joint_rotation': [...]}
        where para = [cam(3), shape(10), rotmats(216)].
        """
        c = self.cfg
        r = c.refinement
        out = {"joint_position": [], "joint_rotation": []}

        mean_cam_shape = jnp.asarray(np.concatenate([self.mean_params.cam, self.mean_params.shape]))
        mean_pose = jnp.asarray(self.mean_params.pose6d)

        # --- global body net: cam + shape ---
        body_parts = [t for t in (iuv_map, global_feats) if t is not None]
        body_in = body_parts[0] if len(body_parts) == 1 else jnp.concatenate(body_parts, axis=-1)
        b = body_in.shape[0]
        x = Conv1x1BNRelu(64, self.train, self.axis_name, name="body_adapter")(body_in)
        global_para, _ = SmplResNet(
            resnet_nums=c.glo_num_layers, num_classes=13,
            train=self.train, axis_name=self.axis_name, name="body_net",
        )(x)
        global_para = global_para + mean_cam_shape[None, :]

        # --- limb net over the 24 partial stacks (part axis -> batch) ---
        limb_parts = []
        if part_iuv_map is not None:
            p = part_iuv_map
            if p.ndim == 6:  # (B, 24, S, S, 3, 7) -> flatten the (3, 7) stack
                p = p.reshape(*p.shape[:4], -1)
            limb_parts.append(p)
        if part_feats is not None:
            limb_parts.append(part_feats)
        part_in = limb_parts[0] if len(limb_parts) == 1 else jnp.concatenate(limb_parts, axis=-1)
        s = part_in.shape[2]
        limb_in = part_in.reshape(b * 24, s, s, -1)  # (B*24, S, S, Cin)
        y = Conv1x1BNRelu(64, self.train, self.axis_name, name="limb_adapter")(limb_in)
        _, limb_feat = SmplResNet(
            resnet_nums=c.limb_num_layers, num_classes=0, truncate=1,
            train=self.train, axis_name=self.axis_name, name="limb_net",
        )(y)
        hs = limb_feat.shape[1]
        limb_feat = limb_feat.reshape(b, 24, hs, hs, -1).transpose(0, 2, 3, 1, 4).reshape(b, hs, hs, -1)
        rot_feats = LimbResLayers(
            resnet_nums=c.limb_num_layers, outplanes=r.feat_dim, groups=24,
            train=self.train, axis_name=self.axis_name, name="limb_reslayer",
        )(limb_feat)  # (B, 24, feat_dim)

        rot_dim = 6 if c.use_6d_rot else 9

        def to_rotmat_flat(pose):
            pose = pose.reshape(b, 24 * rot_dim) + mean_pose[None, :]
            if c.use_6d_rot:
                return rot6d_to_rotmat(pose.reshape(b * 24, 6)).reshape(b, 216)
            return pose

        if c.refine_strategy in ("gcn", "gcn_direct"):
            # aux heads are built unconditionally so train- and eval-mode
            # models share one parameter tree (checkpoints interchange);
            # their outputs are dead code at eval and XLA removes them
            init_pose = PartwiseDense(rot_dim, init_gain=0.01, name="pose_regressor_0")(rot_feats)
            if self.train:
                out["joint_rotation"].append(to_rotmat_flat(init_pose))

            if c.refine_strategy == "gcn":
                r2p_A = jnp.asarray(rot2pos_adjacency())
                pos_init = GCN(
                    hidden_dim=r.feat_dim, out_dim=r.feat_dim, num_layers=1,
                    train=self.train, axis_name=self.axis_name, name="r2p_gcn",
                )(rot_feats, r2p_A)
            else:
                pos_init = rot_feats

            if c.joint_position_weights > 0 and r.pos_intersupv and c.refine_strategy == "gcn":
                coords0 = PartwiseDense(3, name="coord_regressor_0")(pos_init)
                if self.train:
                    out["joint_position"].append(coords0)

            if r.refine_on:
                mask = jnp.asarray(refine_edge_mask())
                edge_imp = self.param("edge_importance", nn.initializers.ones, (24, 24), jnp.float32)
                graph_A = mask * nn.relu(edge_imp)
                norm_A = normalize_undigraph(jnp.eye(24) + graph_A)
                refined = GCN(
                    hidden_dim=2 * r.feat_dim, out_dim=r.feat_dim,
                    num_layers=r.gcn_num_layer,
                    train=self.train, axis_name=self.axis_name, name="refine_gcn",
                )(pos_init, norm_A)
                pos_refined = pos_init + refined
                if c.joint_position_weights > 0 and r.pos_intersupv and c.refine_strategy == "gcn":
                    coords1 = PartwiseDense(3, name="coord_regressor_1")(pos_refined)
                    if self.train:
                        out["joint_position"].append(coords1)
            else:
                pos_refined = pos_init

            if c.refine_strategy == "gcn":
                p2r_A = jnp.asarray(pos2rot_adjacency())
                rot_refined = GCN(
                    hidden_dim=r.feat_dim, out_dim=r.feat_dim, num_layers=1,
                    train=self.train, axis_name=self.axis_name, name="p2r_gcn",
                )(pos_refined, p2r_A)
            else:
                rot_refined = pos_refined

            local_pose = PartwiseDense(rot_dim, init_gain=0.01, name="pose_regressor_1")(rot_refined)
            smpl_pose = to_rotmat_flat(local_pose)
        elif c.refine_strategy in ("lstm", "lstm_direct"):
            smpl_pose = self._lstm_refine(c, r, rot_feats, rot_dim, to_rotmat_flat, out)
        else:
            raise ValueError(f"unknown refine strategy '{c.refine_strategy}'")

        out["para"] = jnp.concatenate([global_para, smpl_pose], axis=1)
        return out

    def _lstm_refine(self, c, r, rot_feats, rot_dim, to_rotmat_flat, out):
        """'lstm' / 'lstm_direct' strategies (reference
        smpl_regressor.py:509-580, :727-842): per-joint rot2pos MLPs swept
        down the kinematic branches, Bi-LSTM refinement along the six
        root-anchored chains with hidden-state handoff from the trunk chain,
        (parent, self, child) aggregation, grouped pose heads."""
        from danet_densepose2smpl_tpu.ops.structure import SMPL_CHILD2, SMPL_PARENT

        direct = c.refine_strategy == "lstm_direct"
        b = rot_feats.shape[0]
        f = r.feat_dim

        # 'lstm_direct' heads always emit raw 9-channel rotmats — no 6D
        # param, no mean-pose residual (reference smpl_regressor.py:518-525,
        # :731-766)
        init_pose = PartwiseDense(
            9 if direct else rot_dim, init_gain=0.01, name="pose_regressor_0"
        )(rot_feats)
        if self.train or direct:
            out["joint_rotation"].append(
                init_pose.reshape(b, -1) if direct else to_rotmat_flat(init_pose)
            )

        feats = rot_feats
        smpl_pose = None
        for s_i in range(r.stack_num):
            if direct:
                # reference :737-740 rebuilds pos from the ORIGINAL rot
                # features every stack (stacks are independent; only the
                # last stack's head output survives)
                pos = {i: rot_feats[:, i] for i in range(24)}
            else:
                # rot2pos sweep: per-joint MLP on (parent pos, parent rot)
                pos = {0: feats[:, 0]}
                for branch in LIMB_BRANCHES:
                    for ind in branch:
                        p = int(SMPL_PARENT[ind])
                        cat = jnp.concatenate([pos[p], feats[:, p]], axis=-1)
                        pos[ind] = MLP1x1(
                            512, f, train=self.train, axis_name=self.axis_name,
                            name=f"rot2pos_{s_i}_{ind}",
                        )(cat[:, None, :])[:, 0]
                if c.joint_position_weights > 0 and r.pos_intersupv:
                    stack = jnp.stack([pos[i] for i in range(24)], axis=1)
                    coords = PartwiseDense(3, name=f"coord_regressor_{s_i}_pre")(stack)
                    if self.train:
                        out["joint_position"].append(coords)

            # Bi-LSTM along the six chains; trunk chain's final carry seeds
            # chains 1-3 (reference's hidden_feat reuse)
            lstm_trunk = BiLSTM(f, name=f"lstm_{s_i}_0")
            refined = {}
            y0, carry = lstm_trunk(jnp.stack([pos[i] for i in LSTM_CHAINS[0]], axis=1))
            for t, ind in enumerate(LSTM_CHAINS[0]):
                refined[ind] = y0[:, t]
            specs = [
                (1, lstm_trunk, carry),
                (2, BiLSTM(f, name=f"lstm_{s_i}_1"), carry),
                (3, BiLSTM(f, name=f"lstm_{s_i}_2"), carry),
                (4, BiLSTM(f, name=f"lstm_{s_i}_3"), None),
                (5, BiLSTM(f, name=f"lstm_{s_i}_4"), None),
            ]
            for br, cell, init in specs:
                chain = LSTM_CHAINS[br]
                y, _ = cell(jnp.stack([pos[i] for i in chain], axis=1), init=init)
                for t, ind in enumerate(chain):
                    # the reference skips only joint 0 (smpl_regressor.py:
                    # 815-817); joint 9 heads chains 2 AND 3, so its refined
                    # feature is overwritten — chain 3's output wins
                    if ind == 0 and br != 0:
                        continue
                    refined[ind] = y[:, t]

            # residual update in the doubled (bi-directional) width
            pos2 = {i: jnp.concatenate([pos[i], pos[i]], axis=-1) + refined[i] for i in range(24)}

            if direct:
                stack = jnp.stack([pos2[i] for i in range(24)], axis=1)
                local = PartwiseDense(9, name=f"pose_regressor_direct_{s_i}")(stack)
                smpl_pose = local.reshape(b, -1)  # last stack wins (:766)
                continue

            if c.joint_position_weights > 0 and r.pos_intersupv:
                stack = jnp.stack([pos2[i] for i in range(24)], axis=1)
                coords = PartwiseDense(3, name=f"coord_regressor_{s_i}_post")(stack)
                if self.train:
                    out["joint_position"].append(coords)

            # (parent, self, child) aggregation -> shared pos2rot MLP
            tri = jnp.stack(
                [
                    jnp.concatenate(
                        [pos2[int(SMPL_PARENT[i])], pos2[i], pos2[int(SMPL_CHILD2[i])]], axis=-1
                    )
                    for i in range(24)
                ],
                axis=1,
            )  # (B, 24, 6F)
            feats = MLP1x1(
                1024, f, train=self.train, axis_name=self.axis_name, name=f"pos2rot_{s_i}",
            )(tri)

            local = PartwiseDense(rot_dim, init_gain=0.01, name=f"pose_regressor_{s_i + 1}")(feats)
            smpl_pose = to_rotmat_flat(local)
        return smpl_pose
