"""Host-side image/keypoint transforms (numpy + cv2).

Parity: reference `utils/imutils.py` (SPIN convention: bbox = center +
scale*200 square; crop to 224x224 with optional in-plane rotation) and the
augmentation-side keypoint/pose processing of `datasets/base_dataset.py`.
The crop is a single cv2.warpAffine of the full (rotation + crop + resize)
transform instead of the reference's pad/imrotate/imresize chain — same
geometry, one resampling pass.
"""

from __future__ import annotations

import numpy as np

from danet_densepose2smpl_tpu.constants import (
    IMG_RES,
    J49_FLIP_PERM,
    SMPL_POSE_FLIP_PERM,
)


def get_transform(center, scale, res, rot: float = 0.0) -> np.ndarray:
    """3x3 matrix taking original-image coords to res-crop coords
    (reference `utils/imutils.py:11-35`; h = 200*scale box convention)."""
    h = 200.0 * scale
    t = np.zeros((3, 3))
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rot_rad = -rot * np.pi / 180.0
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1.0]])
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2.0
        t_mat[1, 2] = -res[0] / 2.0
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform_point(pt, center, scale, res, invert: bool = False, rot: float = 0.0):
    """Transform one (x, y) point; int-rounded 1-based like the reference
    (`utils/imutils.py:37-44`)."""
    t = get_transform(center, scale, res, rot)
    if invert:
        t = np.linalg.inv(t)
    p = t @ np.array([pt[0] - 1.0, pt[1] - 1.0, 1.0])
    return (p[:2].astype(int) + 1).astype(np.float64)


def transform_points(coords, center, scale, res, invert: bool = False, rot: float = 0.0):
    """Vectorized (N, 2) variant with the same int-round convention."""
    t = get_transform(center, scale, res, rot)
    if invert:
        t = np.linalg.inv(t)
    homo = np.concatenate([coords - 1.0, np.ones((coords.shape[0], 1))], axis=1)
    out = homo @ t.T
    return out[:, :2].astype(int) + 1


def crop(img: np.ndarray, center, scale, res=(IMG_RES, IMG_RES), rot: float = 0.0) -> np.ndarray:
    """Affine crop to `res` with zero padding (reference `crop`,
    `utils/imutils.py:53-87`, as one warpAffine)."""
    import cv2

    t = get_transform(center, scale, res, rot)
    # The reference's transform chain works in 1-based coords with an int
    # floor; the affine map in 0-based coords is t applied to (x-? ) —
    # operate directly in 0-based: p_out = t @ [x, y, 1] (the -1/+1 in
    # transform_point cancel up to the int rounding).
    m = t[:2, :]
    return cv2.warpAffine(
        img, m.astype(np.float64), (int(res[1]), int(res[0])),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )


def uncrop(img: np.ndarray, center, scale, orig_shape) -> np.ndarray:
    """Paste a crop back into original-image coords (nearest; used by the
    LSP mask eval, reference `utils/imutils.py:89-113`)."""
    import cv2

    res = img.shape[:2]
    t = get_transform(center, scale, res, 0.0)
    m = np.linalg.inv(t)[:2, :]
    return cv2.warpAffine(
        img, m.astype(np.float64), (int(orig_shape[1]), int(orig_shape[0])),
        flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )


def flip_img(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(img[:, ::-1])


def flip_kp(kp: np.ndarray) -> np.ndarray:
    """Flip 49- or 24-joint keypoints in normalized coords (negate x)."""
    if kp.shape[0] == 49:
        kp = kp[J49_FLIP_PERM]
    else:
        from danet_densepose2smpl_tpu.constants import J24_FLIP_PERM

        kp = kp[J24_FLIP_PERM]
    kp = kp.copy()
    kp[:, 0] = -kp[:, 0]
    return kp


def flip_pose(pose: np.ndarray) -> np.ndarray:
    """Flip a 72-dim SMPL axis-angle pose (reference flip_pose)."""
    pose = pose[SMPL_POSE_FLIP_PERM].copy()
    pose[1::3] = -pose[1::3]
    pose[2::3] = -pose[2::3]
    return pose


def rot_aa_np(aa: np.ndarray, rot: float) -> np.ndarray:
    """Rotate the global-orientation axis-angle by `rot` degrees about the
    camera z axis (numpy twin of ops.rotations.rotate_axis_angle)."""
    from scipy.spatial.transform import Rotation

    R_aug = Rotation.from_euler("z", -rot, degrees=True).as_matrix()
    R = Rotation.from_rotvec(aa).as_matrix()
    return Rotation.from_matrix(R_aug @ R).as_rotvec().astype(aa.dtype)
