"""Keypoint / heatmap numerics: soft-argmax and Gaussian target heatmaps.

Parity targets: reference `utils/keypoints.py:268-394`
(`softmax_integral_tensor` — integral pose regression — and
`generate_heatmap`). Both are fully batched/vectorized here: the reference's
per-joint Python loop with dynamic bounding-box clipping becomes one
fixed-shape elementwise Gaussian evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmax_2d(heatmaps: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """Integral-pose soft-argmax over channels-last heatmaps.

    heatmaps: (B, H, W, J) logits. Returns (B, J, 2) (x, y) in pixel units
    (0..W-1 / 0..H-1), matching `softmax_integral_tensor(preds*T, ...)` at
    reference `utils/keypoints.py:372-394` (the caller scales logits by 10 at
    `iuv_estimator.py:137`, exposed here as `temperature`).
    """
    b, h, w, j = heatmaps.shape
    flat = (heatmaps * temperature).transpose(0, 3, 1, 2).reshape(b, j, h * w)
    p = jax.nn.softmax(flat, axis=-1).reshape(b, j, h, w)
    xs = jnp.arange(w, dtype=p.dtype)
    ys = jnp.arange(h, dtype=p.dtype)
    x = jnp.sum(p.sum(axis=2) * xs, axis=-1)
    y = jnp.sum(p.sum(axis=3) * ys, axis=-1)
    return jnp.stack([x, y], axis=-1)


def gaussian_heatmaps(
    joints_uv: jnp.ndarray,
    heatmap_size: int,
    sigma: float = 1.0,
    joints_valid: jnp.ndarray | None = None,
):
    """Unnormalized Gaussian heatmaps from normalized joint positions.

    joints_uv: (..., J, 2) in [0, 1] image coordinates. Returns
    (heatmaps (..., H, W, J), weights (..., J)) where a joint whose 3-sigma
    support falls fully outside the map gets weight 0 (reference
    `utils/keypoints.py:268-331` semantics, vectorized: the center is rounded
    to the nearest pixel like the reference's `int(x + 0.5)`).
    """
    hs = heatmap_size
    mu = jnp.floor(joints_uv * hs + 0.5)  # (..., J, 2) pixel-rounded centers
    r = 3.0 * sigma

    in_bounds = (
        (mu[..., 0] - r < hs) & (mu[..., 1] - r < hs)
        & (mu[..., 0] + r + 1 >= 0) & (mu[..., 1] + r + 1 >= 0)
    )
    w = in_bounds.astype(jnp.float32)
    if joints_valid is not None:
        w = w * joints_valid.astype(jnp.float32)

    xs = jnp.arange(hs, dtype=jnp.float32)
    dx = xs - mu[..., None, 0]  # (..., J, W)
    dy = xs - mu[..., None, 1]  # (..., J, H)
    g = jnp.exp(-(dy[..., :, None] ** 2 + dx[..., None, :] ** 2) / (2.0 * sigma**2))
    g = g * w[..., None, None]
    # (..., J, H, W) -> channels-last (..., H, W, J)
    g = jnp.moveaxis(g, -3, -1)
    return g, w
