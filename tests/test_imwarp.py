import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from danet_densepose2smpl_tpu.ops import grid_sample_bilinear, affine_grid, affine_crop
from danet_densepose2smpl_tpu.ops.imwarp import crop_theta


def test_grid_sample_matches_torch(rng):
    h, w, c = 17, 23, 3
    img = rng.rand(h, w, c).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (9, 11, 2)).astype(np.float32)

    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(grid)[None]
    exp = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    exp = exp[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_affine_grid_matches_torch(rng):
    theta = rng.randn(4, 2, 3).astype(np.float32) * 0.5
    s = 8
    got = np.asarray(affine_grid(jnp.asarray(theta), s))
    exp = F.affine_grid(torch.from_numpy(theta), [4, 1, s, s], align_corners=False).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_affine_crop_identity(rng):
    b, s, c = 2, 16, 4
    img = rng.rand(b, s, s, c).astype(np.float32)
    theta = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], dtype=np.float32), (b, 1, 1, 1))
    out = np.asarray(affine_crop(jnp.asarray(img), jnp.asarray(theta), s))
    np.testing.assert_allclose(out[:, 0], img, atol=1e-5)


def test_affine_crop_multi_part_matches_torch_loop(rng):
    """The vmapped (B, K) crop equals torch's per-part grid_sample loop —
    the reference STN idiom at iuv_estimator.py:193-200."""
    b, k, s, c, out_s = 2, 5, 24, 3, 12
    img = rng.rand(b, s, s, c).astype(np.float32)
    centers = rng.uniform(-0.5, 0.5, (b, k, 2)).astype(np.float32)
    scales = rng.uniform(0.2, 0.8, (b, k)).astype(np.float32)
    theta = np.asarray(crop_theta(jnp.asarray(centers), jnp.asarray(scales)))

    got = np.asarray(affine_crop(jnp.asarray(img), jnp.asarray(theta), out_s))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    for ki in range(k):
        t_theta = torch.from_numpy(theta[:, ki])
        grid = F.affine_grid(t_theta, [b, c, out_s, out_s], align_corners=False)
        exp = F.grid_sample(t_img, grid, align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got[:, ki], exp, atol=1e-5)


def test_grad_flows_through_crop(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    theta = jnp.asarray(np.array([[[[0.5, 0, 0.1], [0, 0.5, -0.1]]]], dtype=np.float32))

    def loss(th):
        return jnp.sum(affine_crop(img, th, 4) ** 2)

    g = jax.grad(loss)(theta)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
