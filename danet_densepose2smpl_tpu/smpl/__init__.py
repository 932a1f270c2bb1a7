"""SMPL body model: loaders and the fused batched LBS forward.

TPU-native replacement for the reference's `smplx` dependency
(`models/smpl.py:15-46` wraps `smplx.SMPL` with a 49-joint superset output).
The forward pass is a chain of batched matmuls (shape blendshapes, pose
blendshapes, joint regression, linear blend skinning) compiled into whatever
jitted computation calls it.
"""

from danet_densepose2smpl_tpu.smpl.loader import (  # noqa: F401
    SMPLModel,
    load_smpl_model,
    save_smpl_npz,
    synthetic_smpl_model,
)
from danet_densepose2smpl_tpu.smpl.model import (  # noqa: F401
    SMPLOutput,
    smpl_forward,
    smpl_forward_aa,
)
