"""Native (C++) runtime components with on-demand compilation.

The reference's native surface lives in its dependencies (pycocotools C,
neural_renderer CUDA, OpenCV); the TPU compute path here is JAX/Pallas, and
the host-side native pieces are C++ compiled on demand with graceful Python
fallbacks (SURVEY.md §2.2).
"""

from danet_densepose2smpl_tpu.native.build import load_library  # noqa: F401
