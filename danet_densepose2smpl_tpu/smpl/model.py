"""Fused batched SMPL forward (blendshapes + joint regression + LBS).

TPU-native equivalent of `smplx.SMPL.forward` as wrapped by the reference
(`models/smpl.py:15-46`): everything is a batched matmul chain that XLA fuses
into the surrounding jitted step. The kinematic-chain accumulation is an
unrolled 24-step loop of (3,3)/(3,1) products — static shapes, no scan
overhead at this tiny depth.

Output convention (reference parity):
  vertices     (B, V, 3)
  joints       (B, 49, 3)  — SPIN 49-joint superset via joint_map
  smpl_joints  (B, 24, 3)  — the native kinematic joints (posed)
  joints_j19   (B, 19, 3)  — J24_TO_J19 subset of the GT 24
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.constants import J24_TO_J19
from danet_densepose2smpl_tpu.ops.rotations import batch_rodrigues
from danet_densepose2smpl_tpu.ops.structure import NUM_SMPL_JOINTS, SMPL_PARENT
from danet_densepose2smpl_tpu.smpl.loader import SMPLModel

# SMPL accuracy budget is millimeters; keep contractions fp32 on TPU.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray
    joints: jnp.ndarray
    smpl_joints: jnp.ndarray
    joints_j19: jnp.ndarray
    betas: jnp.ndarray
    rotmats: jnp.ndarray


def _rigid_transforms(rotmats: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """Forward-kinematics world transforms relative to the rest pose.

    rotmats: (B, 24, 3, 3) local joint rotations; joints: (B, 24, 3) rest
    joint locations. Returns the skinning transforms A (B, 24, 3, 4) such
    that skinning applies `x -> A_rot @ x + A_t` to rest-pose vertices.
    """
    parents = SMPL_PARENT

    rel = joints.at[:, 1:].add(-joints[:, parents[1:]])  # bone vectors

    # World rotation/translation per joint, accumulated down the tree.
    world_rot = [rotmats[:, 0]]
    world_t = [joints[:, 0]]
    for j in range(1, NUM_SMPL_JOINTS):
        p = int(parents[j])
        world_rot.append(
            _einsum("bij,bjk->bik", world_rot[p], rotmats[:, j])
        )
        world_t.append(
            _einsum("bij,bj->bi", world_rot[p], rel[:, j]) + world_t[p]
        )
    R_w = jnp.stack(world_rot, axis=1)  # (B, 24, 3, 3)
    t_w = jnp.stack(world_t, axis=1)    # (B, 24, 3)

    # Subtract the rest-pose joint positions rotated into the new frame so
    # the transform maps rest-space points (the classic A - [0|A@j] trick).
    t_skin = t_w - _einsum("bjik,bjk->bji", R_w, joints)
    return jnp.concatenate([R_w, t_skin[..., None]], axis=-1), t_w


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,
    rotmats: jnp.ndarray,
    transl: jnp.ndarray | None = None,
) -> SMPLOutput:
    """SMPL forward from rotation matrices.

    betas: (B, 10); rotmats: (B, 24, 3, 3) (joint 0 = global orient);
    transl: optional (B, 3) root translation.
    """
    v_template = jnp.asarray(model.v_template)
    shapedirs = jnp.asarray(model.shapedirs)
    posedirs = jnp.asarray(model.posedirs)
    J_reg = jnp.asarray(model.J_regressor)
    weights = jnp.asarray(model.lbs_weights)

    # 1) shape blendshapes
    v_shaped = v_template + _einsum("vck,bk->bvc", shapedirs, betas)

    # 2) rest-pose joints
    joints_rest = _einsum("jv,bvc->bjc", J_reg, v_shaped)

    # 3) pose blendshapes from the non-root rotations
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_feat = (rotmats[:, 1:] - eye).reshape(rotmats.shape[0], -1)  # (B, 207)
    v_posed = v_shaped + _einsum("vcp,bp->bvc", posedirs, pose_feat)

    # 4) kinematic chain + 5) linear blend skinning
    A, joints_world = _rigid_transforms(rotmats, joints_rest)
    T = _einsum("vj,bjcd->bvcd", weights, A)  # (B, V, 3, 4)
    verts = _einsum("bvcd,bvd->bvc", T[..., :3], v_posed) + T[..., 3]

    if transl is not None:
        verts = verts + transl[:, None, :]
        joints_world = joints_world + transl[:, None, :]

    # 6) extended joint set: 24 kinematic + 21 surface + 9 extra-regressed,
    # then the 49-joint selection (reference models/smpl.py:30-35).
    vertex_joints = verts[:, jnp.asarray(model.vertex_joint_ids), :]
    extra = _einsum("jv,bvc->bjc", jnp.asarray(model.J_regressor_extra), verts)
    all_joints = jnp.concatenate([joints_world, vertex_joints, extra], axis=1)
    joints49 = all_joints[:, jnp.asarray(model.joint_map), :]
    joints_j19 = joints49[:, 25:, :][:, jnp.asarray(J24_TO_J19), :]

    return SMPLOutput(
        vertices=verts,
        joints=joints49,
        smpl_joints=joints_world,
        joints_j19=joints_j19,
        betas=betas,
        rotmats=rotmats,
    )


def smpl_forward_aa(
    model: SMPLModel,
    betas: jnp.ndarray,
    pose_aa: jnp.ndarray,
    transl: jnp.ndarray | None = None,
) -> SMPLOutput:
    """SMPL forward from a 72-dim axis-angle pose (global orient first)."""
    b = pose_aa.shape[0]
    rotmats = batch_rodrigues(pose_aa.reshape(b * NUM_SMPL_JOINTS, 3))
    return smpl_forward(model, betas, rotmats.reshape(b, NUM_SMPL_JOINTS, 3, 3), transl)
