"""3D pose evaluation harness (the reference's eval.py core loop).

Parity: `eval.py:57-316` — per batch: model inference -> SMPL forward ->
H36M-regressor joints -> pelvis-centred MPJPE + Procrustes PA-MPJPE (mm);
gendered GT meshes for 3DPW; H36M-P2 per-action breakdown. The per-sample
numpy SVD loop becomes the batched on-device Procrustes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.constants import (
    H36M_TO_J14,
    H36M_TO_J17,
    J24_TO_J14,
    J24_TO_J17,
)
from danet_densepose2smpl_tpu.eval.metrics import compute_mpjpe
from danet_densepose2smpl_tpu.smpl import SMPLModel, smpl_forward, smpl_forward_aa


def synthetic_h36m_regressor(num_verts: int, seed: int = 0) -> np.ndarray:
    """(17, V) stand-in for the official J_regressor_h36m.npy (rows sum 1)."""
    rng = np.random.RandomState(seed)
    J = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        ids = rng.choice(num_verts, size=8, replace=False)
        w = rng.rand(8).astype(np.float32)
        J[j, ids] = w / w.sum()
    return J


@dataclass
class PoseEvalResult:
    mpjpe: np.ndarray
    pa_mpjpe: np.ndarray
    per_action: dict = field(default_factory=dict)

    @property
    def mpjpe_mm(self) -> float:
        return float(self.mpjpe.mean() * 1000.0)

    @property
    def pa_mpjpe_mm(self) -> float:
        return float(self.pa_mpjpe.mean() * 1000.0)

    def summary(self, name: str = "") -> str:
        lines = [f"*** {name} ***", f"MPJPE: {self.mpjpe_mm:.2f} mm", f"PA-MPJPE (rec. err): {self.pa_mpjpe_mm:.2f} mm"]
        if self.per_action:
            lines.append("per-action PA-MPJPE:")
            for act, (m, pa) in sorted(self.per_action.items()):
                lines.append(f"  {act:16s} MPJPE {m:7.2f}  PA {pa:7.2f}")
        return "\n".join(lines)


def h36m_action_of(imgname: str) -> str:
    """Action tag from an H36M frame path (reference eval.py:152)."""
    return imgname.split("/")[-1].split(".")[0].split("_")[1]


def make_eval_step(
    infer_fn,
    smpl_neutral: SMPLModel,
    j_regressor: np.ndarray,
    joint_mapper_h36m: np.ndarray,
    joint_mapper_gt: np.ndarray,
    use_gt_verts: bool,
    smpl_male: SMPLModel | None = None,
    smpl_female: SMPLModel | None = None,
    device_preprocess: bool = False,
    mesh=None,
):
    """One jitted eval step: images (+GT) -> per-sample (mpjpe, pa).

    With `device_preprocess`, `images` is the raw uint8 frame batch and
    crop+resize+normalize fuses into the same jitted program
    (data/pipeline.device_preprocess; BASELINE north star). With `mesh`,
    the step is data-parallel: batch args/outputs shard over the mesh
    (params replicate; XLA inserts no collectives — eval is embarrassingly
    parallel over the batch)."""

    jreg = jnp.asarray(j_regressor)
    mh = jnp.asarray(joint_mapper_h36m)
    mg = jnp.asarray(joint_mapper_gt)

    def step(images, gt_pose, gt_betas, gender, pose_3d, centers=None, scales=None):
        if device_preprocess:
            from danet_densepose2smpl_tpu.data.pipeline import device_preprocess as dp

            images = dp(images, centers, scales)
        para = infer_fn(images)
        pred_betas = para[:, 3:13]
        pred_rotmat = para[:, 13:].reshape(-1, 24, 3, 3)
        pred_verts = smpl_forward(smpl_neutral, pred_betas, pred_rotmat).vertices

        pred_j = jnp.einsum("jv,bvc->bjc", jreg, pred_verts, precision=jax.lax.Precision.HIGHEST)
        pred_pelvis = pred_j[:, :1]
        pred_sel = pred_j[:, mh] - pred_pelvis

        if use_gt_verts:
            # 3DPW: gendered GT meshes (reference eval.py:192-198)
            vm = smpl_forward_aa(smpl_male, gt_betas, gt_pose).vertices
            vf = smpl_forward_aa(smpl_female, gt_betas, gt_pose).vertices
            gt_verts = jnp.where((gender == 1)[:, None, None], vf, vm)
            gt_j = jnp.einsum("jv,bvc->bjc", jreg, gt_verts, precision=jax.lax.Precision.HIGHEST)
            gt_sel = gt_j[:, mh] - gt_j[:, :1]
        else:
            gt_sel = pose_3d[:, mg, :3]

        return compute_mpjpe(pred_sel, gt_sel), para

    if mesh is None:
        return jax.jit(step)

    from danet_densepose2smpl_tpu.parallel.mesh import batch_sharding

    bs = batch_sharding(mesh)
    n_args = 7 if device_preprocess else 5
    return jax.jit(
        step,
        in_shardings=(bs,) * n_args,
        out_shardings=((bs, bs), bs),
    )


def run_pose_eval(
    infer_fn,
    loader,
    dataset_name: str,
    smpl_neutral: SMPLModel,
    j_regressor: np.ndarray,
    smpl_male: SMPLModel | None = None,
    smpl_female: SMPLModel | None = None,
    imgnames: np.ndarray | None = None,
    log_every: int = 10,
    device_preprocess: bool = False,
    mesh=None,
) -> PoseEvalResult:
    """Evaluate over `loader` batches (dicts with img/pose/betas/gender/
    pose_3d/sample_index; raw_img/center/scale when device_preprocess)."""
    is_mpi = dataset_name == "mpi-inf-3dhp"
    mapper_h36m = H36M_TO_J17 if is_mpi else H36M_TO_J14
    mapper_gt = J24_TO_J17 if is_mpi else J24_TO_J14
    use_gt_verts = dataset_name == "3dpw"

    step = make_eval_step(
        infer_fn, smpl_neutral, j_regressor, mapper_h36m, mapper_gt,
        use_gt_verts, smpl_male or smpl_neutral, smpl_female or smpl_neutral,
        device_preprocess=device_preprocess, mesh=mesh,
    )

    all_mpjpe, all_pa, all_idx = [], [], []
    for b, batch in loader:
        if device_preprocess:
            extra = (jnp.asarray(batch["center"]), jnp.asarray(batch["scale"]))
            images = jnp.asarray(batch["raw_img"])
        else:
            extra = ()
            images = jnp.asarray(batch["img"])
        (mpjpe, pa), _ = step(
            images,
            jnp.asarray(batch["pose"]),
            jnp.asarray(batch["betas"]),
            jnp.asarray(batch["gender"]),
            jnp.asarray(batch["pose_3d"]),
            *extra,
        )
        all_mpjpe.append(np.asarray(mpjpe))
        all_pa.append(np.asarray(pa))
        all_idx.append(np.asarray(batch["sample_index"]))
        if log_every and b % log_every == 0:
            print(f"batch {b}: MPJPE {np.concatenate(all_mpjpe).mean()*1000:.2f} mm "
                  f"PA {np.concatenate(all_pa).mean()*1000:.2f} mm")

    mpjpe = np.concatenate(all_mpjpe)
    pa = np.concatenate(all_pa)
    idx = np.concatenate(all_idx)

    per_action = {}
    if dataset_name == "h36m-p2" and imgnames is not None:
        actions = {}
        for row, i in enumerate(idx):
            act = h36m_action_of(str(imgnames[i]))
            actions.setdefault(act, []).append(row)
        for act, rows in actions.items():
            per_action[act] = (
                float(mpjpe[rows].mean() * 1000.0),
                float(pa[rows].mean() * 1000.0),
            )
    return PoseEvalResult(mpjpe=mpjpe, pa_mpjpe=pa, per_action=per_action)
