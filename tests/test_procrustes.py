import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from danet_densepose2smpl_tpu.ops import similarity_align, reconstruction_error


def numpy_procrustes(S1, S2):
    """Independent transcription of the HMR similarity transform
    (reference utils/pose_utils.py:10-58) for golden comparison."""
    S1t, S2t = S1.T, S2.T  # (3, N)
    mu1 = S1t.mean(1, keepdims=True)
    mu2 = S2t.mean(1, keepdims=True)
    X1, X2 = S1t - mu1, S2t - mu2
    var1 = (X1**2).sum()
    K = X1 @ X2.T
    U, s, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(3)
    Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
    R = V @ Z @ U.T
    scale = np.trace(R @ K) / var1
    t = mu2 - scale * (R @ mu1)
    return (scale * R @ S1t + t).T


def test_alignment_exact_under_similarity(rng):
    B, N = 4, 14
    S2 = rng.randn(B, N, 3).astype(np.float64)
    out = []
    for i in range(B):
        R = Rotation.random(random_state=rng).as_matrix()
        s = rng.uniform(0.5, 2.0)
        t = rng.randn(3)
        out.append((S2[i] @ R.T) * s + t)
    S1 = np.stack(out)
    err = np.asarray(reconstruction_error(jnp.asarray(S1), jnp.asarray(S2)))
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def test_matches_reference_numpy(rng):
    B, N = 6, 14
    S1 = rng.randn(B, N, 3)
    S2 = S1 + 0.1 * rng.randn(B, N, 3)
    got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
    expected = np.stack([numpy_procrustes(S1[i], S2[i]) for i in range(B)])
    np.testing.assert_allclose(got, expected, atol=1e-5)

    err_got = np.asarray(reconstruction_error(jnp.asarray(S1), jnp.asarray(S2)))
    err_exp = np.sqrt(((expected - S2) ** 2).sum(-1)).mean(-1)
    np.testing.assert_allclose(err_got, err_exp, atol=1e-6)
