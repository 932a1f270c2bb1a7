"""Mesh construction + sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays with the batch axis sharded.

    Every leaf must have a leading batch dimension divisible by the mesh
    size. Scalars/flags without a batch axis should not be in `batch`.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def cast_float_tree(tree, dtype):
    """Cast float leaves of a pytree (params/batch_stats) to `dtype`.

    flax.linen infers compute dtype from inputs/params, so casting the
    variables + inputs runs the whole network in bf16 (serving mode; fp32
    stays the training/parity default). Non-float leaves pass through.
    """
    import jax.numpy as jnp

    def cast(x):
        return x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x

    import jax

    return jax.tree.map(cast, tree)
