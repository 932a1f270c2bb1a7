"""Device-side (jit-compiled) image preprocessing.

The BASELINE north star moves preprocessing (bbox crop, affine warp,
normalization) into a jit pipeline feeding eval loops at full device
utilization. For datasets with uniform frame sizes (H36M), the host only
decodes JPEGs into a fixed-size batch; the crop + resize + normalize runs
on device as one fused program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD, IMG_RES
from danet_densepose2smpl_tpu.ops.imwarp import affine_crop


def crop_thetas(
    centers: jnp.ndarray, scales: jnp.ndarray, src_hw, rots: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(B, 2, 3) affine thetas mapping crop coords -> source normalized
    coords for the SPIN box convention (square box of side 200*scale at
    `centers`, optional in-plane rotation in degrees)."""
    h, w = src_hw
    half = 100.0 * scales  # half box side in source pixels
    cx = 2.0 * centers[:, 0] / w - 1.0
    cy = 2.0 * centers[:, 1] / h - 1.0
    sx = 2.0 * half / w
    sy = 2.0 * half / h

    if rots is None:
        cos = jnp.ones_like(sx)
        sin = jnp.zeros_like(sx)
    else:
        rad = jnp.deg2rad(rots)
        cos, sin = jnp.cos(rad), jnp.sin(rad)

    # column-major 2x2: crop (x, y) -> source offset R @ diag(s) @ p
    r00 = cos * sx
    r01 = -sin * sy
    r10 = sin * sx
    r11 = cos * sy
    row0 = jnp.stack([r00, r01, cx], axis=-1)
    row1 = jnp.stack([r10, r11, cy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def device_preprocess(
    images: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    rots: jnp.ndarray | None = None,
    out_size: int = IMG_RES,
) -> jnp.ndarray:
    """Batched crop+resize+normalize on device.

    images: (B, H, W, 3) uint8/float RGB (uniform source size);
    centers (B, 2) px; scales (B,) SPIN convention. Returns normalized
    (B, out, out, 3) float32 crops (bilinear, zero padding — the device
    twin of data/transforms.crop + ImageNet normalization).
    """
    x = images.astype(jnp.float32) / 255.0
    theta = crop_thetas(centers, scales, images.shape[1:3], rots)
    crops = affine_crop(x, theta[:, None], out_size)[:, 0]
    mean = jnp.asarray(IMG_NORM_MEAN)
    std = jnp.asarray(IMG_NORM_STD)
    return (crops - mean) / std
