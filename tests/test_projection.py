import numpy as np
import jax.numpy as jnp

from danet_densepose2smpl_tpu.ops import (
    perspective_projection,
    estimate_translation,
    weak_perspective_to_translation,
    translation_to_weak_perspective,
)


def test_perspective_projection_center():
    pts = jnp.asarray([[[0.0, 0.0, 5.0]]])
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))
    out = np.asarray(perspective_projection(pts, R, t, 5000.0, jnp.full((1, 2), 112.0)))
    np.testing.assert_allclose(out[0, 0], [112.0, 112.0], atol=1e-4)


def test_perspective_projection_offset():
    pts = jnp.asarray([[[0.1, -0.2, 0.0]]])
    R = jnp.eye(3)[None]
    t = jnp.asarray([[0.0, 0.0, 10.0]])
    out = np.asarray(perspective_projection(pts, R, t, 1000.0, jnp.zeros((1, 2))))
    np.testing.assert_allclose(out[0, 0], [1000.0 * 0.01, 1000.0 * -0.02], atol=1e-4)


def test_estimate_translation_recovers_gt(rng):
    """Project GT joints with a known translation; the WLS fit must recover it."""
    B, J = 4, 49
    pts = rng.randn(B, J, 3).astype(np.float32) * 0.3
    t_gt = np.stack(
        [rng.uniform(-0.3, 0.3, B), rng.uniform(-0.3, 0.3, B), rng.uniform(4.0, 8.0, B)], axis=1
    ).astype(np.float32)

    proj = np.asarray(
        perspective_projection(
            jnp.asarray(pts), jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.asarray(t_gt),
            5000.0, jnp.full((B, 2), 112.0),
        )
    )
    conf = np.ones((B, J, 1), dtype=np.float32)
    joints_2d = np.concatenate([proj, conf], axis=-1)

    t_est = np.asarray(estimate_translation(jnp.asarray(pts), jnp.asarray(joints_2d)))
    np.testing.assert_allclose(t_est, t_gt, atol=1e-2)


def test_estimate_translation_matches_reference_numpy(rng):
    """Golden test against an independent transcription of SPIN's per-sample
    numpy solver (reference utils/geometry.py:94-132)."""
    B, J = 3, 49
    S = rng.randn(B, J, 3).astype(np.float64) * 0.4
    j2d = rng.uniform(0, 224, (B, J, 2)).astype(np.float64)
    conf = rng.uniform(0.1, 1.0, (B, J)).astype(np.float64)

    def ref_solve(S, j2d, conf, f=5000.0, img=224.0):
        n = S.shape[0]
        eq_rows, rhs, wts = [], [], []
        for j in range(n):
            eq_rows.append([f, 0.0, -(j2d[j, 0] - img / 2)])
            rhs.append((j2d[j, 0] - img / 2) * S[j, 2] - f * S[j, 0])
            wts.append(np.sqrt(conf[j]))
            eq_rows.append([0.0, f, -(j2d[j, 1] - img / 2)])
            rhs.append((j2d[j, 1] - img / 2) * S[j, 2] - f * S[j, 1])
            wts.append(np.sqrt(conf[j]))
        Q = np.asarray(eq_rows) * np.asarray(wts)[:, None]
        c = np.asarray(rhs) * np.asarray(wts)
        return np.linalg.solve(Q.T @ Q, Q.T @ c)

    expected = np.stack([ref_solve(S[i, 25:], j2d[i, 25:], conf[i, 25:]) for i in range(B)])
    got = np.asarray(
        estimate_translation(
            jnp.asarray(S, dtype=jnp.float32),
            jnp.asarray(np.concatenate([j2d, conf[..., None]], axis=-1), dtype=jnp.float32),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_weak_perspective_roundtrip(rng):
    t = np.stack(
        [rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8), rng.uniform(2, 10, 8)], axis=1
    ).astype(np.float32)
    cam = translation_to_weak_perspective(jnp.asarray(t))
    t2 = np.asarray(weak_perspective_to_translation(cam))
    np.testing.assert_allclose(t2, t, rtol=1e-4, atol=1e-4)
