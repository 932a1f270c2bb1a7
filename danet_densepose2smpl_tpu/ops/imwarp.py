"""Differentiable image warping: bilinear grid-sample and affine crops.

Replaces `torch.nn.functional.affine_grid` + `grid_sample` (used per part in
the reference's STN crop loop, `models/danet/iuv_estimator.py:193-200`) with
fixed-shape gather-based sampling. The per-part Python loop becomes a single
vmapped call over the 24-part axis — one fused XLA computation.

Convention: channels-last images (..., H, W, C); grids carry normalized
coordinates in [-1, 1] with (x, y) order and `align_corners=False` semantics
(pixel centers at (2i + 1)/S - 1), matching torch's default used by the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside the image.

    image: (H, W, C); grid: (Ho, Wo, 2) normalized (x, y) in [-1, 1].
    Returns (Ho, Wo, C). Batch via vmap.
    """
    h, w, _ = image.shape
    # Normalized -> continuous pixel coords (align_corners=False).
    fx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    fy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = image[yi_c, xi_c]  # (Ho, Wo, C)
        return vals * valid[..., None].astype(image.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    tx = tx[..., None].astype(image.dtype)
    ty = ty[..., None].astype(image.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def affine_grid(theta: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Sampling grid of a 2x3 affine map over normalized coords.

    theta: (..., 2, 3) mapping output normalized coords (x, y, 1) to input
    normalized coords — torch `F.affine_grid` semantics with
    align_corners=False. Returns (..., S, S, 2).
    """
    s = out_size
    base = (2.0 * jnp.arange(s, dtype=theta.dtype) + 1.0) / s - 1.0
    gy, gx = jnp.meshgrid(base, base, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)  # (S, S, 3)
    # Tiny contraction; force fp32 so TPU's default-bf16 matmul doesn't
    # quantize sampling coordinates (visible as half-pixel crop error).
    return jnp.einsum("...ij,hwj->...hwi", theta, coords, precision=jax.lax.Precision.HIGHEST)


def affine_crop(images: jnp.ndarray, theta: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Batched multi-crop: sample K affine crops from each image.

    images: (B, H, W, C); theta: (B, K, 2, 3). Returns (B, K, S, S, C).
    This is the TPU-native replacement of the reference's 24-iteration STN
    loop: a single vmap over (batch, part).
    """
    grids = affine_grid(theta, out_size)  # (B, K, S, S, 2)
    sample_b = jax.vmap(lambda img, g: jax.vmap(grid_sample_bilinear, in_axes=(None, 0))(img, g))
    return sample_b(images, grids)


def crop_theta(center: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """2x3 affine theta cropping a square window.

    center: (..., 2) in normalized [-1, 1] coords; scale: (...,) half-size of
    the crop in normalized units. The resulting theta maps output coords g to
    input coords g*scale + center (reference `iuv_estimator.py:262-301`
    builds exactly this diagonal-plus-translation form).
    """
    zeros = jnp.zeros_like(scale)
    row0 = jnp.stack([scale, zeros, center[..., 0]], axis=-1)
    row1 = jnp.stack([zeros, scale, center[..., 1]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _axis_weights(centers, scales, src_size: int, out_size: int, dtype):
    """(..., out, src) bilinear interpolation matrix for a 1-D scale+translate
    map: out-pixel o samples normalized coord scale*((2o+1)/out - 1) + center,
    align_corners=False, zero padding outside.

    Coordinate math runs in at least f32 (bf16 pixel coordinates would shift
    samples by up to half a pixel), and in f64 when `dtype` is f64 (the
    checkpoint-parity tests demand exact agreement with the f64 torch twin);
    only the final weight matrix is cast to `dtype`, which pins the crop
    einsums' dtype under mixed precision regardless of the (possibly
    promoted) dtype of centers/scales."""
    ct = jnp.promote_types(jnp.float32, dtype)
    o = (2.0 * jnp.arange(out_size, dtype=ct) + 1.0) / out_size - 1.0
    xin = scales[..., None].astype(ct) * o + centers[..., None].astype(ct)
    u = (xin + 1.0) * (src_size / 2.0) - 0.5                    # pixel coords
    src = jnp.arange(src_size, dtype=ct)
    w = 1.0 - jnp.abs(u[..., :, None] - src)                    # (..., out, src)
    w = jnp.clip(w, 0.0, 1.0)
    # zero-pad semantics: weights for out-of-range taps fall out naturally
    # because |u - src| >= 1 for all src when u is far outside; the partial
    # edge tap (u in [-1, 0] or [S-1, S]) keeps its single-sided weight,
    # matching grid_sample's zero padding.
    return w.astype(dtype)


def separable_crop(images: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Axis-aligned (diagonal-theta) multi-crop as two matmuls per part.

    Exactly equivalent to `affine_crop(images, crop_theta(centers, scales))`
    but MXU-shaped: forward AND backward are batched matmuls instead of
    gathers/scatters (TPU scatter-add in the gather backward dominated the
    train step before this).

    images: (B, H, W, C); centers: (B, K, 2) normalized; scales: (B, K).
    Returns (B, K, S, S, C).
    """
    h, w = images.shape[1:3]
    dt = images.dtype
    wx = _axis_weights(centers[..., 0], scales, w, out_size, dt)  # (B, K, S, W)
    wy = _axis_weights(centers[..., 1], scales, h, out_size, dt)  # (B, K, S, H)
    tmp = jnp.einsum("bkoh,bhwc->bkowc", wy, images)
    return jnp.einsum("bkowc,bkpw->bkopc", tmp, wx)


def separable_crop_concat(images: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """`separable_crop` emitting the channel-concat layout (B, S, S, K*C).

    The grouped partial-IUV head consumes the K crops stacked along channels;
    asking the second einsum for `bopkc` output lets XLA fold the (K, C)
    relayout into the matmul epilogue instead of materializing a separate
    462 MB transpose of the (B, K, S, S, C) tensor (measured: the explicit
    transpose costs ~4 ms at B=64 bf16 on v5e; this form removes it).
    """
    b = images.shape[0]
    h, w = images.shape[1:3]
    dt = images.dtype
    wx = _axis_weights(centers[..., 0], scales, w, out_size, dt)
    wy = _axis_weights(centers[..., 1], scales, h, out_size, dt)
    tmp = jnp.einsum("bkoh,bhwc->bkowc", wy, images)
    crops = jnp.einsum("bkowc,bkpw->bopkc", tmp, wx)  # (B, S, S, K, C)
    return crops.reshape(b, out_size, out_size, -1)


def separable_crop_per_part(
    images: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray, out_size: int,
    precision=None,
) -> jnp.ndarray:
    """`separable_crop` variant where each part crops its own image.

    images: (B, K, H, W, C); centers (B, K, 2); scales (B, K).
    Returns (B, K, S, S, C)."""
    h, w = images.shape[2:4]
    dt = images.dtype
    wx = _axis_weights(centers[..., 0], scales, w, out_size, dt)
    wy = _axis_weights(centers[..., 1], scales, h, out_size, dt)
    tmp = jnp.einsum("bkoh,bkhwc->bkowc", wy, images, precision=precision)
    return jnp.einsum("bkowc,bkpw->bkopc", tmp, wx, precision=precision)


def separable_crop_pixel_major(
    images: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray, out_size: int,
    precision=None,
) -> jnp.ndarray:
    """`separable_crop_per_part` for pixel-major input: each part crops its
    own per-pixel slice of a (B, H, W, K, C) tensor, without a part-major
    transpose ever materializing (the layout the one-hot channel-selection
    matmul in `train/objective.py` produces).

    images: (B, H, W, K, C); centers (B, K, 2); scales (B, K).
    Returns (B, K, S, S, C) — identical to
    `separable_crop_per_part(images.transpose(0, 3, 1, 2, 4), ...)`."""
    h, w = images.shape[1:3]
    dt = images.dtype
    wx = _axis_weights(centers[..., 0], scales, w, out_size, dt)
    wy = _axis_weights(centers[..., 1], scales, h, out_size, dt)
    tmp = jnp.einsum("bkoh,bhwkc->bkowc", wy, images, precision=precision)
    return jnp.einsum("bkowc,bkpw->bkopc", tmp, wx, precision=precision)
