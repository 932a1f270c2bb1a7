"""Rotation-representation conversions (axis-angle, quaternion, 6D, matrix).

Parity targets: reference `utils/geometry.py:9-61` (batch_rodrigues,
quat_to_rotmat, rot6d_to_rotmat) and the torchgeometry conversions used by
`train/fits_dict.py` / `eval.py`. All functions accept arbitrary leading batch
dimensions and are jit/vmap/grad-safe (no data-dependent branching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def batch_rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches reference `utils/geometry.py:9-23` numerically (which goes through
    a quaternion); here we convert through the half-angle quaternion as well so
    the `theta + eps` norm behaviour at theta=0 is identical.
    """
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)
    axis = aa / angle
    half = 0.5 * angle
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz)], axis=-1)
    row1 = jnp.stack([2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd-style selection: compute all four candidate
    quaternions and select the numerically best by the largest denominator
    (replaces torchgeometry's rotation_matrix_to_quaternion).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q * jnp.sign(q[..., :1] + _EPS)  # canonical w >= 0
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def rotmat_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    q = rotmat_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    axis = xyz / sin_half.clip(_EPS)
    # Near identity, fall back to the first-order expansion 2*xyz.
    small = sin_half < 1e-6
    return jnp.where(small, 2.0 * xyz, axis * angle)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation (..., 6) -> rotation matrix (..., 3, 3).

    Zhou et al. CVPR'19 continuous representation; the 6 values are read as a
    (3, 2) column pair like the reference (`utils/geometry.py:47-61`,
    `x.view(-1,3,2)`), i.e. column a1 = x[0::2], a2 = x[1::2]; the output
    stacks the orthonormal frame as matrix *columns*.
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    a2_perp = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_perp / jnp.linalg.norm(a2_perp, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D representation (..., 6) (first two
    columns, interleaved to match `rot6d_to_rotmat`'s read order)."""
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))


def rotate_axis_angle(aa: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    """Compose a global-frame Z-rotation (degrees, image convention) onto an
    axis-angle rotation — the data-augmentation update of SMPL's global orient
    (reference `datasets/base_dataset.py:186-199` / `utils/imutils.py:115-126`).

    aa: (..., 3) axis-angle; rot_deg: broadcastable scalar/batch of degrees.
    """
    rad = -jnp.deg2rad(rot_deg)
    zeros = jnp.zeros_like(rad)
    rot_aa = jnp.stack([zeros, zeros, rad], axis=-1)
    R_aug = batch_rodrigues(jnp.atleast_2d(rot_aa)).reshape(rot_aa.shape[:-1] + (3, 3))
    R = batch_rodrigues(aa)
    return rotmat_to_axis_angle(R_aug @ R)
