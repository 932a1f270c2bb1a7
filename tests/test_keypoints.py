import numpy as np
import jax.numpy as jnp

from danet_densepose2smpl_tpu.ops import soft_argmax_2d, gaussian_heatmaps


def test_soft_argmax_peak(rng):
    b, h, w, j = 2, 56, 56, 24
    hm = np.zeros((b, h, w, j), dtype=np.float32)
    targets = rng.randint(5, 50, (b, j, 2))
    for bi in range(b):
        for ji in range(j):
            x, y = targets[bi, ji]
            hm[bi, y, x, ji] = 40.0  # sharp peak; temperature sharpens further
    out = np.asarray(soft_argmax_2d(jnp.asarray(hm), temperature=10.0))
    np.testing.assert_allclose(out, targets.astype(np.float32), atol=0.05)


def test_soft_argmax_uniform_center():
    hm = np.zeros((1, 8, 8, 3), dtype=np.float32)
    out = np.asarray(soft_argmax_2d(jnp.asarray(hm)))
    np.testing.assert_allclose(out, 3.5, atol=1e-5)


def test_gaussian_heatmaps_center_and_weights(rng):
    j = 5
    uv = np.array([[[0.5, 0.5], [0.25, 0.75], [0.0, 0.0], [-2.0, 0.5], [3.0, 3.0]]], dtype=np.float32)
    hm, w = gaussian_heatmaps(jnp.asarray(uv), heatmap_size=56, sigma=1.0)
    hm, w = np.asarray(hm), np.asarray(w)
    assert hm.shape == (1, 56, 56, j)
    # In-bounds joints: center pixel value is 1.
    assert hm[0, 28, 28, 0] == 1.0
    assert hm[0, 42, 14, 1] == 1.0
    # Far out-of-bounds joints are zero-weighted.
    np.testing.assert_array_equal(w[0], [1, 1, 1, 0, 0])
    np.testing.assert_allclose(hm[0, ..., 3], 0.0)


def test_gaussian_heatmap_matches_reference_loop(rng):
    """Golden vs the per-joint loop semantics of reference keypoints.py:268-331."""
    hs, sigma = 24, 2.0
    uv = rng.rand(1, 6, 2).astype(np.float32)
    got = np.asarray(gaussian_heatmaps(jnp.asarray(uv), hs, sigma)[0])[0]
    for ji in range(6):
        mu_x = int(uv[0, ji, 0] * hs + 0.5)
        mu_y = int(uv[0, ji, 1] * hs + 0.5)
        xs = np.arange(hs)
        g = np.exp(-(((xs[None, :] - mu_x) ** 2) + ((xs[:, None] - mu_y) ** 2)) / (2 * sigma**2))
        np.testing.assert_allclose(got[..., ji], g, atol=1e-5)
