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
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    src_hw,
    rots: jnp.ndarray | None = None,
    out_size: int = IMG_RES,
) -> jnp.ndarray:
    """(B, 2, 3) affine thetas mapping crop coords -> source normalized
    coords for the SPIN box convention (square box of side 200*scale at
    `centers`, optional in-plane rotation in degrees).

    Exact device twin of the host transform: builds
    `data/transforms.get_transform` (reference utils/imutils.py:11-35)
    batched, inverts it, and converts the pixel-space affine into the
    normalized align_corners=False theta that `ops/imwarp.affine_crop`
    consumes (output pixel o samples at p = (2o+1)/S - 1; source pixel
    u = (q+1)*W/2 - 0.5). Doing the conversion exactly — rather than the
    symmetric [-1,1] box mapping — removes a ~(box/S - 1)/2-pixel offset
    that grows with in-plane rotation.
    """
    h, w = src_hw
    s = float(out_size)
    box = 200.0 * scales                                      # box side, px
    zeros = jnp.zeros_like(box)
    ones = jnp.ones_like(box)

    # t: source px -> crop px (transforms.get_transform, batched)
    t = jnp.stack(
        [
            jnp.stack([s / box, zeros, s * (-centers[:, 0] / box + 0.5)], -1),
            jnp.stack([zeros, s / box, s * (-centers[:, 1] / box + 0.5)], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    if rots is not None:
        rad = -jnp.deg2rad(rots)
        sn, cs = jnp.sin(rad), jnp.cos(rad)
        rot_mat = jnp.stack(
            [
                jnp.stack([cs, -sn, zeros], -1),
                jnp.stack([sn, cs, zeros], -1),
                jnp.stack([zeros, zeros, ones], -1),
            ],
            axis=-2,
        )
        shift = jnp.asarray([[1.0, 0.0, -s / 2.0], [0.0, 1.0, -s / 2.0], [0.0, 0.0, 1.0]])
        unshift = jnp.asarray([[1.0, 0.0, s / 2.0], [0.0, 1.0, s / 2.0], [0.0, 0.0, 1.0]])
        t = unshift @ rot_mat @ shift @ t

    m = jnp.linalg.inv(t)                                     # crop px -> source px
    a, b = m[:, :2, :2], m[:, :2, 2]

    # pixel-affine -> normalized theta: A_n = D_in^-1 A D_out^-1,
    # b_n = D_in^-1 (b + 1/2) - 1 - A_n (1/S - 1)
    d_in = jnp.asarray([2.0 / w, 2.0 / h])
    a_n = a * d_in[None, :, None] * (s / 2.0)
    b_n = d_in * (b + 0.5) - 1.0 - jnp.sum(a_n, axis=-1) * (1.0 / s - 1.0)
    return jnp.concatenate([a_n, b_n[..., None]], axis=-1)


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
    theta = crop_thetas(centers, scales, images.shape[1:3], rots, out_size=out_size)
    crops = affine_crop(x, theta[:, None], out_size)[:, 0]
    mean = jnp.asarray(IMG_NORM_MEAN)
    std = jnp.asarray(IMG_NORM_STD)
    return (crops - mean) / std


def device_preprocess_train(
    images: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    rots: jnp.ndarray,
    flips: jnp.ndarray,
    pixel_noise: jnp.ndarray,
    out_size: int = IMG_RES,
) -> jnp.ndarray:
    """Training-path device ingest: crop(+rot) + flip + channel noise +
    normalize as one fused program (the image half of
    `data/dataset.NpzDataset.__getitem__`'s host augmentation; reference
    `datasets/base_dataset.py:145-158,244-251`). Label-side augmentation
    stays on the host — it is tiny; the per-pixel work is what starves the
    chip.

    images: (B, H, W, 3) uint8 RGB full frames (uniform source size);
    rots degrees; flips (B,) in {0,1}; pixel_noise (B, 3) per-channel
    multipliers. Returns normalized (B, out, out, 3) float32 crops.
    """
    x = images.astype(jnp.float32)
    theta = crop_thetas(centers, scales, images.shape[1:3], rots, out_size=out_size)
    crops = affine_crop(x, theta[:, None], out_size)[:, 0]
    flip = flips.astype(bool)[:, None, None, None]
    crops = jnp.where(flip, crops[:, :, ::-1], crops)
    crops = jnp.clip(crops * pixel_noise[:, None, None, :], 0.0, 255.0) / 255.0
    mean = jnp.asarray(IMG_NORM_MEAN)
    std = jnp.asarray(IMG_NORM_STD)
    return (crops - mean) / std
