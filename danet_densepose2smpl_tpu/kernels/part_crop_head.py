"""Fused STN-crop + partial-IUV-head Pallas kernel.

The reference materializes 24 per-part feature crops (F.grid_sample per part,
`iuv_estimator.py:193-200`) and runs a groups=24 conv over their channel
concatenation (`res_module.py:334-342`). Done literally on TPU that writes a
(B, 24, S, S, C) crop tensor (~230 MB at the serving batch) to HBM only for
the grouped conv to read it straight back — measured at ~18 ms/batch-64 of
the 57 ms inference step (PERF.md).

This kernel fuses the whole subgraph per (image, part) grid cell in VMEM:

    y-interp matmul -> x-interp matmul -> zero-pad -> 9-tap im2col ->
    one (S*S, 9C) x (9C, O) MXU matmul + bias

so the crop intermediates never leave VMEM and the conv contraction runs at
depth 9C instead of 9 narrow C-deep taps. Numerics match
`separable_crop` + the grouped conv exactly (same 2-tap bilinear weights,
zero padding, f32 accumulation); validated in tests/test_part_crop_head.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(feats_ref, wy_ref, wx_ref, k_ref, b_ref, out_ref):
    h, w, c = feats_ref.shape[1:]
    s = wy_ref.shape[2]
    o = k_ref.shape[4]
    f32 = jnp.float32

    f = feats_ref[0]                                   # (H, W, C)
    wy = wy_ref[0, 0]                                  # (S, H)
    wx = wx_ref[0, 0]                                  # (S, W)

    # y-interp: (S, H) @ (H, W*C) -> (S, W*C)
    tmp = jnp.dot(wy, f.reshape(h, w * c), preferred_element_type=f32)
    tmp = tmp.astype(f.dtype)
    # x-interp: (S, W) @ (W, S*C) -> crop in (x, y, c) layout
    t2 = tmp.reshape(s, w, c).transpose(1, 0, 2).reshape(w, s * c)
    crop = jnp.dot(wx, t2, preferred_element_type=f32).astype(f.dtype)
    crop = crop.reshape(s, s, c)                       # (x, y, C)

    padded = jnp.pad(crop, ((1, 1), (1, 1), (0, 0)))
    # 9-tap im2col in (dy, dx, c) order to match the conv kernel layout
    # (3, 3, C, O). Axis 0 is x, axis 1 is y, so dx shifts axis 0.
    cols = jnp.concatenate(
        [padded[dx:dx + s, dy:dy + s, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )                                                   # (x, y, 9C)
    acc = jnp.dot(
        cols.reshape(s * s, 9 * c),
        k_ref[0].reshape(9 * c, o).astype(f.dtype),
        preferred_element_type=f32,
    ) + b_ref[pl.program_id(1)].astype(f32)
    out_ref[0, 0] = acc.reshape(s, s, o).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def fused_part_predict(
    feats: jnp.ndarray,
    wy: jnp.ndarray,
    wx: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    out_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Crop 24 parts from `feats` and apply the grouped 3x3 head, fused.

    feats: (B, H, W, C); wy: (B, K, S, H), wx: (B, K, S, W) bilinear
    interpolation weights (`ops.imwarp._axis_weights`); kernel:
    (3, 3, C, K*O) grouped-conv weights (flax HWIO layout, K groups);
    bias: (K*O,). Returns (B, K, S, S, O) — identical to
    `separable_crop` -> concat -> grouped conv -> regroup.
    """
    b, h, w, c = feats.shape
    k = wy.shape[1]
    s = out_size
    o = kernel.shape[-1] // k
    kern = kernel.reshape(3, 3, c, k, o).transpose(3, 0, 1, 2, 4)  # (K,3,3,C,O)
    bias_k = bias.reshape(k, o)

    grid = (b, k)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # k is the minor grid axis: the feats block index is unchanged
            # across the 24 parts of one image, so Pallas skips its re-DMA
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, s, h), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 3, 3, c, o), lambda i, j: (j, 0, 0, 0, 0)),
            # full (K, O) bias table: a (1, O) block would violate the TPU
            # (8, 128)-tile rule on the second-to-last dim; it's tiny, keep
            # it whole in VMEM and index by the part grid id in-kernel
            pl.BlockSpec((k, o), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, s, o), lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, s, s, o), feats.dtype),
        interpret=interpret,
    )(feats, wy, wx, kern, bias_k)
    # kernel emits (x, y, o) spatial order; flip to (y, x, o)
    return out.transpose(0, 1, 3, 2, 4)
