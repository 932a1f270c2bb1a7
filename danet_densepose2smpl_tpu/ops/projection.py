"""Camera projection and translation fitting.

Parity targets: reference `utils/geometry.py:63-157`. The per-sample numpy
`np.linalg.solve` loop of `estimate_translation` becomes one batched 3x3
solve on device — fixed shape, fully inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.constants import FOCAL_LENGTH, IMG_RES


def perspective_projection(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length,
    camera_center: jnp.ndarray,
) -> jnp.ndarray:
    """Pinhole projection of (B, N, 3) points.

    rotation: (B, 3, 3); translation: (B, 3); focal_length: scalar or (B,);
    camera_center: (B, 2). Returns (B, N, 2) pixel coordinates.
    Matches reference `utils/geometry.py:63-91`.
    """
    cam_pts = (
        jnp.einsum("bij,bnj->bni", rotation, points, precision=jax.lax.Precision.HIGHEST)
        + translation[:, None, :]
    )
    xy = cam_pts[..., :2] / cam_pts[..., 2:3]
    f = jnp.asarray(focal_length)
    f = f.reshape((-1, 1, 1)) if f.ndim else f
    return xy * f + camera_center[:, None, :]


def estimate_translation(
    joints_3d: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length: float = FOCAL_LENGTH,
    img_size: float = IMG_RES,
    use_gt_subset: bool = True,
) -> jnp.ndarray:
    """Weighted-least-squares camera translation fit, batched.

    Finds T = (tx, ty, tz) such that projecting `joints_3d` with identity
    rotation and the given focal length best matches `joints_2d[..., :2]`
    under per-joint confidence weights `joints_2d[..., 2]`.

    joints_3d: (B, J, 3); joints_2d: (B, J, 3) with confidence in channel 2.
    With `use_gt_subset` (reference `geometry.py:146-147`) only the 24 GT
    joints (25:49) of the 49-joint convention are used.

    Per joint j the projection equations are linear in T:
        f*tx - (u_j - c) * tz = (u_j - c) * z_j - f * x_j
        f*ty - (v_j - c) * tz = (v_j - c) * z_j - f * y_j
    Weighted normal equations give one (B, 3, 3) solve.
    """
    if use_gt_subset:
        joints_3d = joints_3d[:, 25:, :]
        joints_2d = joints_2d[:, 25:, :]
    conf = joints_2d[..., 2]
    uv = joints_2d[..., :2]
    center = img_size / 2.0
    f = focal_length

    x, y, z = joints_3d[..., 0], joints_3d[..., 1], joints_3d[..., 2]
    du = uv[..., 0] - center  # (B, J)
    dv = uv[..., 1] - center

    # Rows of the design matrix (2 per joint), columns (tx, ty, tz).
    # Row u: [f, 0, -du]; row v: [0, f, -dv]. RHS: du*z - f*x / dv*z - f*y.
    # Reference weights rows by sqrt(conf) before forming Q^T Q, i.e. the
    # normal equations carry weight conf.
    w = conf
    fz = jnp.full_like(du, f)

    # A^T W A (3x3), assembled termwise to stay matmul-free at this tiny size.
    a00 = jnp.sum(w * fz * fz, axis=1)
    a02 = jnp.sum(w * fz * (-du), axis=1)
    a11 = jnp.sum(w * fz * fz, axis=1)
    a12 = jnp.sum(w * fz * (-dv), axis=1)
    a22 = jnp.sum(w * (du * du + dv * dv), axis=1)
    zeros = jnp.zeros_like(a00)
    A = jnp.stack(
        [
            jnp.stack([a00, zeros, a02], axis=-1),
            jnp.stack([zeros, a11, a12], axis=-1),
            jnp.stack([a02, a12, a22], axis=-1),
        ],
        axis=-2,
    )

    ru = du * z - f * x
    rv = dv * z - f * y
    b0 = jnp.sum(w * fz * ru, axis=1)
    b1 = jnp.sum(w * fz * rv, axis=1)
    b2 = jnp.sum(w * (-du * ru - dv * rv), axis=1)
    b = jnp.stack([b0, b1, b2], axis=-1)

    # Tiny Tikhonov damping keeps the solve finite when all confidences are
    # zero (all-masked sample inside a fixed-shape jitted batch); the result
    # for such samples is ~0 and must be masked out by the caller.
    A = A + 1e-6 * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def weak_perspective_to_translation(
    cam: jnp.ndarray, focal_length: float = FOCAL_LENGTH, img_size: float = IMG_RES
) -> jnp.ndarray:
    """(s, tx, ty) weak-perspective camera -> full translation (B, 3).

    Inverse of the convention used at reference `train/trainer.py:207-212` /
    `smpl_regressor.py:207-212`: tz = 2*f/(img_size*s).
    """
    s = cam[..., 0]
    tz = 2.0 * focal_length / (img_size * s + 1e-9)
    return jnp.stack([cam[..., 1], cam[..., 2], tz], axis=-1)


def translation_to_weak_perspective(
    t: jnp.ndarray, focal_length: float = FOCAL_LENGTH, img_size: float = IMG_RES
) -> jnp.ndarray:
    """Full translation (B, 3) -> weak-perspective (s, tx, ty)."""
    s = 2.0 * focal_length / (img_size * t[..., 2] + 1e-9)
    return jnp.stack([s, t[..., 0], t[..., 1]], axis=-1)
