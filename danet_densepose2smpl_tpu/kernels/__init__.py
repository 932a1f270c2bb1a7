"""TPU kernels: the mesh rasterizer (XLA + Pallas backends)."""

from danet_densepose2smpl_tpu.kernels.rasterizer import (  # noqa: F401
    IUVRenderer,
    project_weak_perspective,
    rasterize_flat,
)
