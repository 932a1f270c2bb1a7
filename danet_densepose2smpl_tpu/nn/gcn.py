"""Graph convolution over the 24-joint skeleton.

Parity: reference `models/module/GCN.py` — GraphConv is `adj @ x @ W + b`;
the GCN stack interleaves BatchNorm-over-nodes + ReLU. Adjacency is passed
per call (the DaNet refinement re-normalizes a learned-edge adjacency every
step).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def normalize_undigraph(A: jnp.ndarray) -> jnp.ndarray:
    """D^-1/2 (A) D^-1/2 with zero-degree guard (reference utils/graph.py:232)."""
    deg = A.sum(axis=-2)
    dinv = jnp.where(deg > 0, deg**-0.5, 0.0)
    return dinv[..., :, None] * A * dinv[..., None, :]


def normalize_digraph_rows(A: jnp.ndarray) -> jnp.ndarray:
    """D^-1 A (row-normalized; reference normalize_digraph AD_mode=False)."""
    deg = A.sum(axis=-1)
    dinv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    return dinv[..., :, None] * A


class GraphConv(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, adj):
        # x: (B, N, F); adj: (N, N) or (B, N, N)
        y = jnp.einsum("...nm,bmf->bnf" if adj.ndim == 2 else "bnm,bmf->bnf", adj, x)
        # explicit float32: raw initializers default to f64 under x64
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (x.shape[-1], self.out_dim),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        return y @ w + b


class GCN(nn.Module):
    """Stacked GraphConv + BatchNorm(nodes) + ReLU."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    num_nodes: int = 24
    train: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, adj):
        dims = (
            [self.out_dim]
            if self.num_layers == 1
            else [self.hidden_dim] * (self.num_layers - 1) + [self.out_dim]
        )
        for i, d in enumerate(dims):
            x = GraphConv(d, name=f"gc{i}")(x, adj)
            # torch BatchNorm1d(num_nodes) on (B, N, F): per-node stats over
            # (batch, feature) — flax BatchNorm with feature axis 1.
            x = nn.BatchNorm(
                use_running_average=not self.train,
                momentum=0.9,
                axis=1,
                axis_name=self.axis_name,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x
