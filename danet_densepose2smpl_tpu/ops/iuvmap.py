"""IUV representation codec — fully vectorized, channels-last.

The DensePose-style IUV representation: a body pixel carries a patch index
I in 1..24 (0 = background) and continuous surface coordinates (U, V) in
[0, 1]. Two array forms are used:

  * "img"  — (B, H, W, 3) float image with channels (I/24, U, V)
  * "maps" — per-channel stacks (B, H, W, 25) for U/V/Index plus a 15-channel
             coarse part ("ann") stack

Parity targets: reference `utils/iuvmap.py` (`iuvmap_clean`, `iuv_img2map`,
`iuv_map2img`), whose per-batch/per-channel Python loops and threshold tricks
reduce to one-hot/argmax gathers here. TPU notes: everything is elementwise +
tiny gathers over the channel axis, fusing into neighbouring convs under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.constants import (
    ANN_CHANNELS,
    IUV_CHANNELS,
    NUM_DP_PATCHES,
    index2ann_matrix,
)


def iuvmap_clean(u_map, v_map, index_map, ann_map=None):
    """One-hot-ify predicted logit stacks (reference `utils/iuvmap.py:6-38`).

    Inputs are channels-last (B, H, W, 25) (ann: (..., 15)). The reference's
    stacked-threshold construction is exactly `one_hot(argmax)`; U/V maps are
    masked to the winning channel.
    """
    index_oh = jax.nn.one_hot(jnp.argmax(index_map, axis=-1), index_map.shape[-1], dtype=u_map.dtype)
    ann_oh = None
    if ann_map is not None:
        ann_oh = jax.nn.one_hot(jnp.argmax(ann_map, axis=-1), ann_map.shape[-1], dtype=u_map.dtype)
    return index_oh * u_map, index_oh * v_map, index_oh, ann_oh


def iuv_img2map(uv_images: jnp.ndarray):
    """IUV image (B, H, W, 3) -> (U, V, Index, Ann) stacks.

    Channel 0 holds I/24; `round(I*24)` recovers the integer patch id
    (reference `utils/iuvmap.py:103-148`). The 15-channel ann stack merges
    patch channels by the fixed part grouping (a (25,15) 0/1 matmul instead
    of the reference's per-group Python loop).
    """
    part_id = jnp.round(uv_images[..., 0] * NUM_DP_PATCHES).astype(jnp.int32)
    index_oh = jax.nn.one_hot(part_id, IUV_CHANNELS, dtype=uv_images.dtype)
    u = index_oh * uv_images[..., 1:2]
    v = index_oh * uv_images[..., 2:3]
    ann = index_oh @ jnp.asarray(index2ann_matrix(), dtype=uv_images.dtype)
    return u, v, index_oh, ann


def iuv_map2img(u_map, v_map, index_map, ann_map=None, ind_mapping=None):
    """(U, V, Index[, Ann]) stacks -> IUV image (B, H, W, 3).

    Inverse of `iuv_img2map` (reference `utils/iuvmap.py:41-100`): the winning
    index channel becomes I/(K-1) (or a custom per-channel id map
    `ind_mapping`, used by the 7-channel partial part stacks), and U/V are
    gathered from the winning channel. If `ann_map` is given, pixels whose
    ann argmax is background are forced to background.
    """
    k = index_map.shape[-1]
    winner = jnp.argmax(index_map, axis=-1)  # (B, H, W)
    if ann_map is not None:
        winner = winner * (jnp.argmax(ann_map, axis=-1) > 0).astype(winner.dtype)

    if ind_mapping is None:
        i_chan = winner.astype(u_map.dtype) / float(k - 1)
    else:
        lut = jnp.asarray(ind_mapping, dtype=u_map.dtype) / float(NUM_DP_PATCHES)
        i_chan = lut[winner]

    winner_oh = jax.nn.one_hot(winner, k, dtype=u_map.dtype)
    # Background (channel 0) contributes no UV.
    fg = winner_oh.at[..., 0].set(0.0)
    u_chan = jnp.sum(fg * u_map, axis=-1)
    v_chan = jnp.sum(fg * v_map, axis=-1)
    return jnp.stack([i_chan, u_chan, v_chan], axis=-1)
