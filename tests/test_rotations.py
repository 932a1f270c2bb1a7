import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from danet_densepose2smpl_tpu.ops import (
    batch_rodrigues,
    quat_to_rotmat,
    rotmat_to_quat,
    rotmat_to_axis_angle,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotate_axis_angle,
)


def random_rotmats(rng, n):
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_rodrigues_matches_scipy(rng):
    aa = rng.randn(32, 3).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rodrigues_zero_angle():
    R = np.asarray(batch_rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotmats(rng, 64)
    q = rotmat_to_quat(jnp.asarray(R))
    R2 = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    R = batch_rodrigues(jnp.asarray(aa))
    aa2 = np.asarray(rotmat_to_axis_angle(R))
    R2 = np.asarray(batch_rodrigues(jnp.asarray(aa2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)


def test_axis_angle_near_identity():
    aa = np.full((2, 3), 1e-8, dtype=np.float32)
    out = np.asarray(rotmat_to_axis_angle(batch_rodrigues(jnp.asarray(aa))))
    assert np.all(np.abs(out) < 1e-3)


def test_rot6d_reference_convention(rng):
    """rot6d uses the reference's interleaved (3,2)-view layout
    (`utils/geometry.py:55-61`): x[0::2] is column 1, x[1::2] column 2."""
    import torch
    import torch.nn.functional as F

    x = rng.randn(16, 6).astype(np.float32)

    xt = torch.from_numpy(x).view(-1, 3, 2)
    a1, a2 = xt[:, :, 0], xt[:, :, 1]
    b1 = F.normalize(a1)
    b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
    b3 = torch.cross(b1, b2, dim=-1)
    R_ref = torch.stack((b1, b2, b3), dim=-1).numpy()

    R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot6d_roundtrip(rng):
    R = random_rotmats(rng, 32)
    x = rotmat_to_rot6d(jnp.asarray(R))
    R2 = np.asarray(rot6d_to_rotmat(x))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_rot6d_valid_rotation(rng):
    x = rng.randn(32, 6).astype(np.float32)
    R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rotate_axis_angle(rng):
    aa = rng.randn(8, 3).astype(np.float32)
    deg = np.float32(37.0)
    out = np.asarray(rotate_axis_angle(jnp.asarray(aa), deg))
    R_aug = Rotation.from_rotvec([0, 0, -np.deg2rad(37.0)]).as_matrix()
    R_ref = R_aug @ Rotation.from_rotvec(aa).as_matrix()
    R_out = Rotation.from_rotvec(out).as_matrix()
    np.testing.assert_allclose(R_out, R_ref, atol=1e-4)
