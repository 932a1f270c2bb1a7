"""Fused Pallas crop+partial-head kernel vs the XLA reference path
(separable_crop -> concat -> grouped conv): identical numerics, and the
PartialIUVHead fused entry shares the same parameter tree."""

import numpy as np
import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.kernels.part_crop_head import fused_part_predict
from danet_densepose2smpl_tpu.nn.iuv_head import PartialIUVHead
from danet_densepose2smpl_tpu.ops.imwarp import _axis_weights, separable_crop


def reference_path(feats, centers, scales, kernel, bias, s):
    crops = separable_crop(feats, centers, scales, s)        # (B, K, S, S, C)
    b, k = crops.shape[:2]
    part_feats = crops.transpose(0, 2, 3, 1, 4).reshape(b, s, s, -1)
    out = jax.lax.conv_general_dilated(
        part_feats, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=k,
    ) + bias
    o = kernel.shape[-1] // k
    return out.reshape(b, s, s, k, o).transpose(0, 3, 1, 2, 4)


def test_fused_kernel_matches_reference(rng):
    b, h, w, c, k, o, s = 2, 16, 16, 8, 24, 21, 8
    feats = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    centers = jnp.asarray(rng.uniform(-0.6, 0.6, (b, k, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.2, 0.9, (b, k)).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, c, k * o).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(k * o).astype(np.float32) * 0.1)

    exp = np.asarray(reference_path(feats, centers, scales, kernel, bias, s))
    wy = _axis_weights(centers[..., 1], scales, h, s, feats.dtype)
    wx = _axis_weights(centers[..., 0], scales, w, s, feats.dtype)
    got = np.asarray(
        fused_part_predict(feats, wy, wx, kernel, bias, s, interpret=True)
    )
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_partial_head_fused_entry_shares_params(rng):
    """The fused PartialIUVHead entry produces the standard entry's output
    from the SAME parameter tree (checkpoint compatibility)."""
    b, h, w, c, k, s = 2, 16, 16, 8, 24, 8
    feats = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, (b, k, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.3, 0.8, (b, k)).astype(np.float32))

    head = PartialIUVHead()
    crops = separable_crop(feats, centers, scales, s)
    part_feats = crops.transpose(0, 2, 3, 1, 4).reshape(b, s, s, -1)
    variables = head.init(jax.random.PRNGKey(0), part_feats)
    assert "predict_partial_iuv" in variables["params"]  # tree path unchanged

    exp = np.asarray(head.apply(variables, part_feats))

    wy = _axis_weights(centers[..., 1], scales, h, s, feats.dtype)
    wx = _axis_weights(centers[..., 0], scales, w, s, feats.dtype)
    got = np.asarray(
        head.apply(variables, fused_inputs=(feats, wy, wx), interpret=True)
    )
    assert got.shape == exp.shape == (b, k, s, s, 3, 7)
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_pixel_major_crop_matches_part_major(rng):
    """separable_crop_pixel_major on (B,H,W,K,C) == separable_crop_per_part
    on the part-major transpose (the contract train/objective.py relies on)."""
    from danet_densepose2smpl_tpu.ops.imwarp import (
        separable_crop_per_part, separable_crop_pixel_major)
    b, h, w, k, c, s = 2, 12, 12, 5, 3, 8
    imgs = jnp.asarray(rng.rand(b, h, w, k, c).astype(np.float32))
    centers = jnp.asarray(rng.uniform(-0.6, 0.6, (b, k, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.2, 0.9, (b, k)).astype(np.float32))
    exp = np.asarray(separable_crop_per_part(
        imgs.transpose(0, 3, 1, 2, 4), centers, scales, s))
    got = np.asarray(separable_crop_pixel_major(imgs, centers, scales, s))
    np.testing.assert_allclose(got, exp, atol=1e-6)
