"""Batched Procrustes alignment and reconstruction error (PA-MPJPE).

Parity target: reference `utils/pose_utils.py:10-75`, whose per-sample numpy
SVD loop becomes one batched `jnp.linalg.svd` on device — the eval metric is
computed entirely inside jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Procrustes is an eval metric: keep every contraction in full fp32 even on
# TPU (default matmul precision is bf16 there).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def similarity_align(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Optimal similarity transform (scale, R, t) of S1 onto S2.

    S1, S2: (..., N, 3) point sets. Returns the aligned S1_hat with the same
    shape. Solves the orthogonal Procrustes problem per batch element.
    """
    mu1 = S1.mean(axis=-2, keepdims=True)
    mu2 = S2.mean(axis=-2, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2

    # Clamped so an all-identical (zero-variance) point set — e.g. a padded
    # sample in a fixed-shape batch — yields zeros instead of NaN under jit.
    var1 = jnp.sum(X1**2, axis=(-2, -1)).clip(1e-12)

    # Covariance (3, 3) per element; points are rows so K = X1^T X2.
    K = _einsum("...ni,...nj->...ij", X1, X2)
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    detsign = jnp.sign(jnp.linalg.det(_einsum("...ij,...kj->...ik", U, V)))
    Z = jnp.broadcast_to(jnp.eye(3), K.shape).copy()
    Z = Z.at[..., -1, -1].set(detsign)
    R = _einsum("...ij,...jk,...lk->...il", V, Z, U)

    scale = _einsum("...ij,...ji->...", R, K) / var1
    t = mu2 - scale[..., None, None] * _einsum("...ij,...nj->...ni", R, mu1)
    return scale[..., None, None] * _einsum("...ij,...nj->...ni", R, X1 + mu1) + t


def reconstruction_error(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Per-sample PA-MPJPE: mean joint distance after Procrustes alignment.

    S1, S2: (B, N, 3). Returns (B,).
    """
    S1_hat = similarity_align(S1, S2)
    return jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)
