"""DensePose surface atlas: the re-indexed SMPL mesh with per-face patch
index + UV chart coordinates.

Parity: reference `utils/densepose_methods.py:16-29` loads
`UV_Processed.mat` with:
  All_vertices  (7829,)   1-based indices into the 6890 SMPL vertices
  FacesDensePose (13774, 3) triangles over the 7829 re-indexed vertices
  FaceIndices   (13774,)  patch id 1..24 per face
  U_norm/V_norm (7829,)   per-vertex chart UV in [0, 1]
plus `UV_symmetry_transforms.mat` for flip augmentation.

The rasterizer consumes the derived per-face flat texture
(I/24, mean U, mean V) exactly as `utils/renderer.py:243-249` builds it.
A synthetic atlas generator keeps everything runnable without the
(downloaded-at-setup) .mat assets.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from danet_densepose2smpl_tpu.ops.structure import SMPL2DP_PART
from danet_densepose2smpl_tpu.smpl.loader import SMPLModel


class DensePoseAtlas(NamedTuple):
    vert_mapping: np.ndarray   # (Nd,) int32 indices into SMPL vertices
    faces: np.ndarray          # (F, 3) int32 over the Nd re-indexed verts
    face_indices: np.ndarray   # (F,) int32 patch id 1..24
    u_norm: np.ndarray         # (Nd,) float32
    v_norm: np.ndarray         # (Nd,) float32

    @property
    def face_textures(self) -> np.ndarray:
        """(F, 3) flat texture (I/24, mean U, mean V) per face."""
        num_part = float(self.face_indices.max())
        u = self.u_norm[self.faces].mean(axis=1)
        v = self.v_norm[self.faces].mean(axis=1)
        return np.stack([self.face_indices / num_part, u, v], axis=1).astype(np.float32)


def load_densepose_atlas(mat_path: str) -> DensePoseAtlas:
    """Load the official UV_Processed.mat (requires scipy)."""
    from scipy.io import loadmat

    d = loadmat(mat_path)
    return DensePoseAtlas(
        vert_mapping=(d["All_vertices"].reshape(-1).astype(np.int64) - 1).astype(np.int32),
        faces=d["All_Faces"].astype(np.int32) - 1,
        face_indices=d["All_FaceIndices"].reshape(-1).astype(np.int32),
        u_norm=d["U_norm"].reshape(-1).astype(np.float32),
        v_norm=d["V_norm"].reshape(-1).astype(np.float32),
    )


def synthetic_densepose_atlas(model: SMPLModel, seed: int = 0) -> DensePoseAtlas:
    """Structurally valid atlas derived from an SMPL model: identity vertex
    mapping, the model's faces, patch ids from each face's dominant LBS
    joint (via SMPL2DP_PART), random chart UVs."""
    rng = np.random.RandomState(seed)
    nv = model.num_verts
    owner_joint = model.lbs_weights.argmax(axis=1)          # (V,)
    joint2patch = np.array([parts[0] for parts in SMPL2DP_PART], dtype=np.int32)
    face_owner = owner_joint[model.faces[:, 0]]
    return DensePoseAtlas(
        vert_mapping=np.arange(nv, dtype=np.int32),
        faces=model.faces.astype(np.int32),
        face_indices=joint2patch[face_owner],
        u_norm=rng.rand(nv).astype(np.float32),
        v_norm=rng.rand(nv).astype(np.float32),
    )
