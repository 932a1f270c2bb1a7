"""Pure-JAX numerical primitives.

Everything in this package is a pure function of arrays — jit/vmap/grad
compatible, fixed-shape, no Python-level data-dependent control flow — so it
can live inside a single compiled training step on TPU.
"""

from danet_densepose2smpl_tpu.ops.rotations import (  # noqa: F401
    batch_rodrigues,
    quat_to_rotmat,
    rotmat_to_quat,
    rotmat_to_axis_angle,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotate_axis_angle,
)
from danet_densepose2smpl_tpu.ops.projection import (  # noqa: F401
    perspective_projection,
    estimate_translation,
    weak_perspective_to_translation,
    translation_to_weak_perspective,
)
from danet_densepose2smpl_tpu.ops.iuvmap import (  # noqa: F401
    iuvmap_clean,
    iuv_img2map,
    iuv_map2img,
)
from danet_densepose2smpl_tpu.ops.keypoints import (  # noqa: F401
    soft_argmax_2d,
    gaussian_heatmaps,
)
from danet_densepose2smpl_tpu.ops.procrustes import (  # noqa: F401
    similarity_align,
    reconstruction_error,
)
from danet_densepose2smpl_tpu.ops.imwarp import (  # noqa: F401
    grid_sample_bilinear,
    affine_grid,
    affine_crop,
)
