"""Device mesh and sharding utilities (data parallelism over ICI).

The reference is single-process single-GPU (SURVEY.md §2.3); the TPU-native
scaling axis is the batch, sharded over a 1-D `jax.sharding.Mesh` ('data').
Parameters and optimizer state stay replicated; XLA inserts the psum for
gradient reduction and the cross-device means inside BatchNorm automatically
(sync-BN semantics for free). The mesh abstraction keeps a slot for a
'model' axis should larger backbones ever need it.
"""

from danet_densepose2smpl_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
