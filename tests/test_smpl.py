import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation
import scipy.sparse

from danet_densepose2smpl_tpu.constants import J24_TO_J19
from danet_densepose2smpl_tpu.ops.structure import SMPL_PARENT
from danet_densepose2smpl_tpu.smpl import (
    SMPLModel,
    load_smpl_model,
    save_smpl_npz,
    smpl_forward,
    smpl_forward_aa,
    synthetic_smpl_model,
)


def numpy_lbs(model, betas, rotmats):
    """Independent homogeneous-matrix LBS (SMPL paper eqs.) for golden tests."""
    v_shaped = model.v_template + model.shapedirs @ betas
    J = model.J_regressor @ v_shaped  # (24, 3)
    pose_feat = (rotmats[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + model.posedirs @ pose_feat

    G = np.zeros((24, 4, 4))
    for j in range(24):
        p = SMPL_PARENT[j]
        local = np.eye(4)
        local[:3, :3] = rotmats[j]
        local[:3, 3] = J[j] - (J[p] if j > 0 else 0)
        G[j] = (G[p] @ local) if j > 0 else local
    # remove rest-pose joint offset
    Grel = np.zeros_like(G)
    for j in range(24):
        off = np.eye(4)
        off[:3, 3] = -J[j]
        Grel[j] = G[j] @ off
    T = np.einsum("vj,jab->vab", model.lbs_weights, Grel)
    vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], axis=1)
    verts = np.einsum("vab,vb->va", T, vh)[:, :3]
    joints = G[:, :3, 3]
    return verts, joints


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_verts=400, seed=1)


def test_matches_numpy_golden(model, rng):
    B = 3
    betas = rng.randn(B, 10).astype(np.float32) * 0.5
    aa = rng.randn(B, 72).astype(np.float32) * 0.4
    out = smpl_forward_aa(model, jnp.asarray(betas), jnp.asarray(aa))

    for i in range(B):
        rotmats = Rotation.from_rotvec(aa[i].reshape(24, 3)).as_matrix()
        verts_ref, joints_ref = numpy_lbs(model, betas[i], rotmats)
        np.testing.assert_allclose(np.asarray(out.vertices[i]), verts_ref, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.smpl_joints[i]), joints_ref, atol=2e-5)


def test_zero_pose_identity(model, rng):
    betas = jnp.zeros((2, 10))
    rotmats = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
    out = smpl_forward(model, betas, rotmats)
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.broadcast_to(model.v_template, (2,) + model.v_template.shape), atol=1e-5
    )


def test_translation_shifts_everything(model, rng):
    betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    aa = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.3)
    t = jnp.asarray([[0.5, -0.2, 1.0]])
    base = smpl_forward_aa(model, betas, aa)
    moved = smpl_forward_aa(model, betas, aa, transl=t)
    np.testing.assert_allclose(np.asarray(moved.vertices - base.vertices), np.broadcast_to(np.asarray(t)[:, None], base.vertices.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(moved.joints - base.joints), np.broadcast_to(np.asarray(t)[:, None], base.joints.shape), atol=1e-5)


def test_output_shapes(model, rng):
    out = smpl_forward_aa(model, jnp.zeros((2, 10)), jnp.zeros((2, 72)))
    assert out.vertices.shape == (2, model.num_verts, 3)
    assert out.joints.shape == (2, 49, 3)
    assert out.smpl_joints.shape == (2, 24, 3)
    assert out.joints_j19.shape == (2, 19, 3)


def test_joint49_mapping_consistency(model, rng):
    """GT-joint block of the 49 set must contain the mapped kinematic joints:
    e.g. 'Right Knee' (GT idx 1 -> 49-idx 26) is SMPL joint 5."""
    aa = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.2)
    out = smpl_forward_aa(model, jnp.zeros((1, 10)), aa)
    np.testing.assert_allclose(np.asarray(out.joints[0, 26]), np.asarray(out.smpl_joints[0, 5]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.joints[0, 25]), np.asarray(out.smpl_joints[0, 8]), atol=1e-6)
    # J19 selection matches constants
    np.testing.assert_allclose(
        np.asarray(out.joints_j19), np.asarray(out.joints[:, 25:, :][:, J24_TO_J19, :]), atol=0
    )


def test_npz_roundtrip(tmp_path, model):
    p = str(tmp_path / "model.npz")
    save_smpl_npz(model, p)
    loaded = load_smpl_model(p)
    for a, b in zip(loaded, model):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class FakeCh:  # mimics a chumpy array's pickled state (module-level: picklable)
    def __init__(self, x):
        self.x = x


def test_pkl_loading_without_chumpy(tmp_path, model):
    """Official-style .pkl: scipy-sparse J_regressor, (V,3,207)->(V*3,207)
    posedirs layout, chumpy-like wrapper objects for dense arrays."""

    raw = {
        "v_template": FakeCh(model.v_template),
        "shapedirs": FakeCh(model.shapedirs),
        "posedirs": model.posedirs.reshape(model.num_verts, 3, -1),
        "J_regressor": scipy.sparse.csc_matrix(model.J_regressor),
        "weights": FakeCh(model.lbs_weights),
        "f": model.faces.astype(np.uint32),
        "kintree_table": np.stack([SMPL_PARENT, np.arange(24)]),
    }
    p = str(tmp_path / "SMPL_NEUTRAL.pkl")
    with open(p, "wb") as f:
        pickle.dump(raw, f)

    extra_p = str(tmp_path / "extra.npy")
    np.save(extra_p, model.J_regressor_extra)

    loaded = load_smpl_model(str(tmp_path), j_regressor_extra_path=extra_p)
    np.testing.assert_allclose(loaded.v_template, model.v_template)
    np.testing.assert_allclose(loaded.J_regressor, model.J_regressor, atol=1e-6)
    np.testing.assert_allclose(loaded.posedirs, model.posedirs)
    np.testing.assert_allclose(loaded.J_regressor_extra, model.J_regressor_extra)
    assert loaded.faces.dtype == np.int32
