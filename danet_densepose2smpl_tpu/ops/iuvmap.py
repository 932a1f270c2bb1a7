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


def _roi_aspect_sizes(uv_rois: jnp.ndarray, size: int):
    """Per-sample aspect-fit extents for the roi codec variants.

    `uv_rois` is (B, 5) rows of [batch_ind, x1, y1, x2, y2] (reference
    `utils/iuvmap.py:75-83,164-172`). Returns int32 (new_h, new_w), each (B,):
    the shorter roi axis shrinks to `max(int(size * aspect), 1)` pixels while
    the longer stays at `size` — `int()` = floor for the positive aspect. The
    aspect is computed in f32 (the reference computes it in python f64); a
    floor can differ only when size*aspect sits exactly on an integer, which
    measure-zero rois hit.
    """
    w = uv_rois[:, 3] - uv_rois[:, 1]
    h = uv_rois[:, 4] - uv_rois[:, 2]
    aspect = w.astype(jnp.float32) / h.astype(jnp.float32)
    squish_w = aspect < 1.0
    shrunk_w = jnp.maximum(jnp.floor(size * aspect), 1.0).astype(jnp.int32)
    shrunk_h = jnp.maximum(jnp.floor(size / aspect), 1.0).astype(jnp.int32)
    new_w = jnp.where(squish_w, shrunk_w, size)
    new_h = jnp.where(squish_w, size, shrunk_h)
    return new_h, new_w


def _nearest_src_index(dst: jnp.ndarray, in_size, out_size):
    """Nearest-resize source index floor(dst * in/out), exact in integers.

    `dst` is (1, out) int32, `in_size` a per-sample (B, 1) int32 (or python
    int), `out_size` likewise. The reference's `F.interpolate(mode='nearest')`
    evaluates the same rule with an f64 `in/out` scale, which can land one
    pixel low when `dst*in` is an exact multiple of `out` but the f64
    quotient rounds down (e.g. 56/20 = 2.8, 5*2.8 -> 13.999.. -> 13 where
    the exact rule gives 14). Integer arithmetic has no such boundary
    artifact; the divergence class is pinned by tests/test_iuvmap_roi.py.
    """
    return (dst * in_size) // out_size


def _roi_gather(img: jnp.ndarray, y_src, x_src, y_valid=None, x_valid=None):
    """Separable batched nearest gather: out[b,y,x] = img[b, ys[b,y], xs[b,x]],
    zeroed where a validity mask is False. img is (B, H, W, C)."""
    h, w = img.shape[1], img.shape[2]
    rows = jnp.take_along_axis(
        img, jnp.clip(y_src, 0, h - 1)[:, :, None, None], axis=1)
    out = jnp.take_along_axis(
        rows, jnp.clip(x_src, 0, w - 1)[:, None, :, None], axis=2)
    if y_valid is not None or x_valid is not None:
        mask_y = y_valid[:, :, None] if y_valid is not None else True
        mask_x = x_valid[:, None, :] if x_valid is not None else True
        out = out * (mask_y & mask_x)[..., None].astype(img.dtype)
    return out


def iuv_img2map(uv_images: jnp.ndarray, uv_rois: jnp.ndarray | None = None,
                new_size: int | None = None):
    """IUV image (B, H, W, 3) -> (U, V, Index, Ann) stacks.

    Channel 0 holds I/24; `round(I*24)` recovers the integer patch id
    (reference `utils/iuvmap.py:103-148`). The 15-channel ann stack merges
    patch channels by the fixed part grouping (a (25,15) 0/1 matmul instead
    of the reference's per-group Python loop).

    With `uv_rois` (B, 5 = [ind, x1, y1, x2, y2]), each sample's aspect-fit
    center region is cropped back out and nearest-upsampled to
    `new_size` x `new_size` (default: the input size) — the inverse of
    `iuv_map2img`'s roi squish (reference `utils/iuvmap.py:150-209`, a
    per-sample slice + `F.interpolate` loop; here one batched separable
    gather with static shapes).
    """
    part_id = jnp.round(uv_images[..., 0] * NUM_DP_PATCHES).astype(jnp.int32)
    index_oh = jax.nn.one_hot(part_id, IUV_CHANNELS, dtype=uv_images.dtype)
    u = index_oh * uv_images[..., 1:2]
    v = index_oh * uv_images[..., 2:3]
    ann = index_oh @ jnp.asarray(index2ann_matrix(), dtype=uv_images.dtype)
    if uv_rois is None:
        return u, v, index_oh, ann

    size = uv_images.shape[1]
    out = int(new_size) if new_size is not None else size
    new_h, new_w = _roi_aspect_sizes(uv_rois, size)
    # Crop margin of the aspect-fit region (int((size-new)/2) == //2, both
    # operands non-negative), then nearest-resize the crop up to (out, out).
    y_margin = (size - new_h) // 2
    x_margin = (size - new_w) // 2
    dst = jnp.arange(out, dtype=jnp.int32)[None, :]
    y_src = y_margin[:, None] + _nearest_src_index(dst, new_h[:, None], out)
    x_src = x_margin[:, None] + _nearest_src_index(dst, new_w[:, None], out)
    stacked = jnp.concatenate([u, v, index_oh, ann], axis=-1)
    resized = _roi_gather(stacked, y_src, x_src)
    k = IUV_CHANNELS
    return (resized[..., :k], resized[..., k:2 * k],
            resized[..., 2 * k:3 * k], resized[..., 3 * k:])


def iuv_map2img(u_map, v_map, index_map, ann_map=None, ind_mapping=None,
                uv_rois=None):
    """(U, V, Index[, Ann]) stacks -> IUV image (B, H, W, 3).

    Inverse of `iuv_img2map` (reference `utils/iuvmap.py:41-100`): the winning
    index channel becomes I/(K-1) (or a custom per-channel id map
    `ind_mapping`, used by the 7-channel partial part stacks), and U/V are
    gathered from the winning channel. If `ann_map` is given, pixels whose
    ann argmax is background are forced to background.

    With `uv_rois` (B, 5 = [ind, x1, y1, x2, y2]), each sample's image is
    nearest-squished along its shorter roi axis to the roi aspect ratio and
    zero-padded back to square, centered (reference `utils/iuvmap.py:72-99`,
    a per-sample `F.interpolate` + `F.pad` loop; here one batched separable
    gather with static shapes).
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
    img = jnp.stack([i_chan, u_chan, v_chan], axis=-1)
    if uv_rois is None:
        return img

    size = img.shape[1]
    new_h, new_w = _roi_aspect_sizes(uv_rois, size)
    pad_t = (size - new_h) // 2  # int(0.5*(size-new)) == //2 for ints >= 0
    pad_l = (size - new_w) // 2
    dst = jnp.arange(size, dtype=jnp.int32)[None, :]
    y_rel = dst - pad_t[:, None]
    x_rel = dst - pad_l[:, None]
    y_src = _nearest_src_index(y_rel, size, new_h[:, None])
    x_src = _nearest_src_index(x_rel, size, new_w[:, None])
    y_valid = (y_rel >= 0) & (y_rel < new_h[:, None])
    x_valid = (x_rel >= 0) & (x_rel < new_w[:, None])
    return _roi_gather(img, y_src, x_src, y_valid, x_valid)
