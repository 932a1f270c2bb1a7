"""Pallas TPU rasterizer backend.

Same math as `rasterizer.rasterize_flat`, reorganized for the TPU memory
hierarchy: per batch element, all per-face quantities (edge-function
coefficients, z-interpolation coefficients, inverse areas, flat textures)
are precomputed in XLA and handed to the kernel in VMEM; the kernel keeps
the (z-buffer, texture) state in VMEM scratch and sweeps the mesh in
128-face chunks. Edge functions for all pixels x faces evaluate as
(P, 3) @ (3, K) matmuls (MXU), the winner-take-all z-test is VPU selects,
and the winning texture is fetched with a one-hot matmul instead of a
gather.

Pixel layout: the S*S pixel axis is padded to a sublane multiple; face
chunks are 128 wide (lane dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _face_setup(verts_px, faces, face_tex, out_size, orig_size):
    """Precompute per-face rasterization coefficients (XLA side).

    Returns (e (B, 9, Fp), zc (B, 3, Fp), meta (B, 2, Fp) = [inv_area,
    valid], tex (Fp, C)); Fp padded to the chunk size. The 9 edge rows are
    the (x, y, 1) coefficients of the three sign-normalized edge functions;
    zc gives z*area as an affine function of the pixel.
    """
    s = out_size
    scale = s / orig_size
    tri = verts_px[:, faces, :]                       # (B, F, 3, 3)
    xy = tri[..., :2] * scale
    z = tri[..., 2]

    v0, v1, v2 = xy[:, :, 0], xy[:, :, 1], xy[:, :, 2]

    def edge_coeffs(a, b):
        # cross(b - a, p - a) as coeffs of (p.x, p.y, 1)
        ex = b[..., 0] - a[..., 0]
        ey = b[..., 1] - a[..., 1]
        c = -(ex * a[..., 1]) + ey * a[..., 0]
        return jnp.stack([-ey, ex, c], axis=-1)       # (B, F, 3)

    e0 = edge_coeffs(v1, v2)
    e1 = edge_coeffs(v2, v0)
    e2 = edge_coeffs(v0, v1)

    area = (
        (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1])
        - (v1[..., 1] - v0[..., 1]) * (v2[..., 0] - v0[..., 0])
    )
    sgn = jnp.sign(area)[..., None]
    e = jnp.concatenate([e0 * sgn, e1 * sgn, e2 * sgn], axis=-1)       # (B, F, 9)

    zc = jnp.einsum("bfec,bfe->bfc", jnp.stack([e0, e1, e2], axis=2), z)  # (B, F, 3)

    valid = ((jnp.abs(area) > 1e-12) & (z > 0).all(-1)).astype(jnp.float32)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    meta = jnp.stack([inv_area, valid], axis=-1)                        # (B, F, 2)

    f = faces.shape[0]
    fp = _round_up(f, _CHUNK)
    pad = fp - f
    if pad:
        e = jnp.pad(e, ((0, 0), (0, pad), (0, 0)))
        zc = jnp.pad(zc, ((0, 0), (0, pad), (0, 0)))
        meta = jnp.pad(meta, ((0, 0), (0, pad), (0, 0)))
        face_tex = jnp.pad(face_tex, ((0, pad), (0, 0)))

    # face axis last (lanes)
    return (
        e.transpose(0, 2, 1),      # (B, 9, Fp)
        zc.transpose(0, 2, 1),     # (B, 3, Fp)
        meta.transpose(0, 2, 1),   # (B, 2, Fp)
        face_tex,
    )


def _raster_kernel(pmat_ref, e_ref, zc_ref, meta_ref, tex_ref, out_ref, zbuf, texacc):
    """One batch element. Block shapes:
    pmat (P, 3); e (1, 9, Fp); zc (1, 3, Fp); meta (1, 2, Fp); tex (Fp, C);
    out (1, P, C); scratch zbuf (P, 1), texacc (P, C).
    """
    p = pmat_ref.shape[0]
    fp = e_ref.shape[-1]
    c = tex_ref.shape[-1]
    n_chunks = fp // _CHUNK

    zbuf[:] = jnp.full((p, 1), _BIG, jnp.float32)
    texacc[:] = jnp.zeros((p, c), jnp.float32)

    pmat = pmat_ref[:]                                   # (P, 3)

    def body(k, _):
        sl = pl.ds(k * _CHUNK, _CHUNK)
        # precision=HIGHEST: the MXU truncates f32 inputs to bf16 by
        # default, which flips inside/outside tests near triangle edges
        # (observed 18% pixel mismatch on TPU before pinning this)
        hi = jax.lax.Precision.HIGHEST
        w0 = jnp.dot(pmat, e_ref[0, 0:3, sl], precision=hi, preferred_element_type=jnp.float32)
        w1 = jnp.dot(pmat, e_ref[0, 3:6, sl], precision=hi, preferred_element_type=jnp.float32)
        w2 = jnp.dot(pmat, e_ref[0, 6:9, sl], precision=hi, preferred_element_type=jnp.float32)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)       # (P, K)

        za = jnp.dot(pmat, zc_ref[0, :, sl], precision=hi, preferred_element_type=jnp.float32)
        inv_a = meta_ref[0, 0:1, sl]                     # (1, K)
        val = meta_ref[0, 1:2, sl]                       # (1, K)
        zpix = za * inv_a

        ok = inside & (val > 0) & (zpix > 1e-6)
        zmask = jnp.where(ok, zpix, _BIG)                # (P, K)

        zmin = jnp.min(zmask, axis=1, keepdims=True)     # (P, 1)
        kidx = jnp.argmin(zmask, axis=1)                 # (P,)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (p, _CHUNK), 1) == kidx[:, None]
        ).astype(jnp.float32)
        texc = jnp.dot(onehot, tex_ref[sl], precision=hi, preferred_element_type=jnp.float32)  # (P, C)

        better = zmin < zbuf[:]
        zbuf[:] = jnp.where(better, zmin, zbuf[:])
        texacc[:] = jnp.where(better, texc, texacc[:])
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0] = texacc[:]


@functools.partial(jax.jit, static_argnames=("out_size", "orig_size", "interpret"))
def rasterize_flat_pallas(
    verts_px: jnp.ndarray,
    faces: jnp.ndarray,
    face_tex: jnp.ndarray,
    out_size: int,
    orig_size: float = 224.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas backend of `rasterize_flat` (same contract)."""
    b = verts_px.shape[0]
    s = out_size
    c = face_tex.shape[-1]

    e, zc, meta, tex = _face_setup(verts_px, faces, face_tex, s, orig_size)
    fp = e.shape[-1]

    p = _round_up(s * s, 8)
    px = jnp.arange(s, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(px, px, indexing="ij")
    pmat = jnp.stack([gx.reshape(-1), gy.reshape(-1), jnp.ones(s * s)], axis=-1)
    pmat = jnp.pad(pmat, ((0, p - s * s), (0, 0)))

    out = pl.pallas_call(
        _raster_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((p, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pmat, e, zc, meta, tex)

    return out[:, : s * s, :].reshape(b, s, s, c)


# ---------------------------------------------------------------------------
# Banded variant: y-sorted faces + per-band chunk skipping
# ---------------------------------------------------------------------------

_BAND_ROWS = 8


def backface_mask(verts: jnp.ndarray, cam: jnp.ndarray, faces: jnp.ndarray,
                  orig_size: float = 224.0, focal_length: float = 5000.0) -> jnp.ndarray:
    """(B, F) bool — True for faces whose outward normal points away from
    the camera (n . p > 0 with the camera at the origin of camera space).

    On a closed orientable mesh with consistent outward winding (see
    `smpl.densepose_atlas.orient_faces`) such faces can never be the first
    hit along any view ray, so the rasterizer may skip them exactly.
    `verts` are SMPL-space vertices, `cam` the weak-perspective (s, tx, ty)
    — the same camera model as `project_weak_perspective` (shared via
    `rasterizer.camera_space`)."""
    from danet_densepose2smpl_tpu.kernels.rasterizer import camera_space

    p = camera_space(verts, cam, orig_size, focal_length)
    tri = p[:, faces, :]                                       # (B, F, 3, 3)
    n = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    centroid = tri.mean(axis=2)
    return jnp.einsum("bfc,bfc->bf", n, centroid) > 0


def _band_setup(verts_px, faces, face_tex, out_size, orig_size, cull_mask=None):
    """Face data sorted by bbox y-center + conservative (band, chunk) touch
    flags. Sorting concentrates each 128-face chunk into a narrow y band, so
    most of the (band, chunk) grid is skipped. `cull_mask` (B, F) marks faces
    to skip entirely: they sort to the end (right before padding) and
    contribute to no band's extent, so with the band-range variant they are
    never even visited."""
    s = out_size
    scale = s / orig_size
    tri_y = verts_px[:, faces, 1] * scale                      # (B, F, 3)
    y_center = tri_y.mean(-1)
    if cull_mask is not None:
        y_center = jnp.where(cull_mask, jnp.inf, y_center)
    order = jnp.argsort(y_center, axis=1)                      # (B, F)

    e, zc, meta, tex = _face_setup(verts_px, faces, face_tex, s, orig_size)
    fp = e.shape[-1]
    f = faces.shape[0]
    if cull_mask is not None:
        # belt and braces: a chunk can mix culled and live faces, and the
        # contiguous [lo, hi) ranges are conservative supersets — invalidate
        # culled faces so they lose every z-test they do reach
        live = 1.0 - cull_mask.astype(meta.dtype)              # (B, F)
        meta = meta.at[:, 1, :f].multiply(live)
    # apply the per-batch sort to the face axis (padding stays at the end)
    pad_ids = jnp.broadcast_to(jnp.arange(f, fp), (e.shape[0], fp - f))
    order_p = jnp.concatenate([order, pad_ids], axis=1)        # (B, Fp)
    e = jnp.take_along_axis(e, order_p[:, None, :], axis=2)
    zc = jnp.take_along_axis(zc, order_p[:, None, :], axis=2)
    meta = jnp.take_along_axis(meta, order_p[:, None, :], axis=2)
    # textures become per-batch after sorting
    tex_b = tex[order_p]                                       # (B, Fp, C)

    # chunk y-extent -> band touch flags
    y_sorted = jnp.take_along_axis(tri_y, order[..., None], axis=1)
    y_min = jnp.floor(y_sorted.min(-1)) - 0.5
    y_max = jnp.ceil(y_sorted.max(-1)) + 0.5
    if cull_mask is not None:
        culled_sorted = jnp.take_along_axis(cull_mask, order, axis=1)
        y_min = jnp.where(culled_sorted, 1e9, y_min)
        y_max = jnp.where(culled_sorted, -1e9, y_max)
    y_min = jnp.concatenate([y_min, jnp.full_like(pad_ids, 1e9, dtype=y_min.dtype)], axis=1)
    y_max = jnp.concatenate([y_max, jnp.full_like(pad_ids, -1e9, dtype=y_max.dtype)], axis=1)
    n_chunks = fp // _CHUNK
    cy_min = y_min.reshape(-1, n_chunks, _CHUNK).min(-1)       # (B, NC)
    cy_max = y_max.reshape(-1, n_chunks, _CHUNK).max(-1)
    n_bands = (s + _BAND_ROWS - 1) // _BAND_ROWS
    band_lo = jnp.arange(n_bands)[None, :, None] * _BAND_ROWS
    band_hi = band_lo + _BAND_ROWS
    touch = (cy_max[:, None, :] >= band_lo) & (cy_min[:, None, :] <= band_hi)
    return e, zc, meta, tex_b, touch.astype(jnp.int32)         # touch (B, NB, NC)


def _banded_kernel(touch_ref, e_ref, zc_ref, meta_ref, tex_ref, out_ref, zbuf, texacc, *, out_size):
    """Grid (B, band, chunk). Blocks: touch (1, NB, NC) SMEM; e (1, 9, Fp);
    zc (1, 3, Fp); meta (1, 2, Fp); tex (1, Fp, C); out (1, 1, P_band, C).
    Scratch zbuf (P_band, 1), texacc (P_band, C) persist across chunks."""
    band = pl.program_id(1)
    chunk = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    c = tex_ref.shape[-1]
    p = zbuf.shape[0]

    @pl.when(chunk == 0)
    def _():
        zbuf[:] = jnp.full((p, 1), _BIG, jnp.float32)
        texacc[:] = jnp.zeros((p, c), jnp.float32)

    @pl.when(touch_ref[0, band, chunk] > 0)
    def _():
        s = out_size
        flat = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
        col = (flat % s).astype(jnp.float32) + 0.5
        row = (flat // s + band * _BAND_ROWS).astype(jnp.float32) + 0.5
        pmat = jnp.stack([col, row, jnp.ones_like(col)], axis=1)  # (P, 3)

        sl = pl.ds(chunk * _CHUNK, _CHUNK)
        hi = jax.lax.Precision.HIGHEST
        w0 = jnp.dot(pmat, e_ref[0, 0:3, sl], precision=hi, preferred_element_type=jnp.float32)
        w1 = jnp.dot(pmat, e_ref[0, 3:6, sl], precision=hi, preferred_element_type=jnp.float32)
        w2 = jnp.dot(pmat, e_ref[0, 6:9, sl], precision=hi, preferred_element_type=jnp.float32)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

        za = jnp.dot(pmat, zc_ref[0, :, sl], precision=hi, preferred_element_type=jnp.float32)
        inv_a = meta_ref[0, 0:1, sl]
        val = meta_ref[0, 1:2, sl]
        zpix = za * inv_a

        ok = inside & (val > 0) & (zpix > 1e-6)
        zmask = jnp.where(ok, zpix, _BIG)

        zmin = jnp.min(zmask, axis=1, keepdims=True)
        kidx = jnp.argmin(zmask, axis=1)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (p, _CHUNK), 1) == kidx[:, None]
        ).astype(jnp.float32)
        texc = jnp.dot(onehot, tex_ref[0, sl], precision=hi, preferred_element_type=jnp.float32)

        better = zmin < zbuf[:]
        zbuf[:] = jnp.where(better, zmin, zbuf[:])
        texacc[:] = jnp.where(better, texc, texacc[:])

    @pl.when(chunk == n_chunks - 1)
    def _():
        out_ref[0, 0] = texacc[:]


@functools.partial(jax.jit, static_argnames=("out_size", "orig_size", "interpret"))
def rasterize_flat_pallas_banded(
    verts_px: jnp.ndarray,
    faces: jnp.ndarray,
    face_tex: jnp.ndarray,
    out_size: int,
    orig_size: float = 224.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded Pallas backend (same contract as rasterize_flat)."""
    b = verts_px.shape[0]
    s = out_size
    c = face_tex.shape[-1]
    e, zc, meta, tex_b, touch = _band_setup(verts_px, faces, face_tex, s, orig_size)
    fp = e.shape[-1]
    n_chunks = fp // _CHUNK
    n_bands = (s + _BAND_ROWS - 1) // _BAND_ROWS
    p_band = _round_up(_BAND_ROWS * s, 8)

    out = pl.pallas_call(
        functools.partial(_banded_kernel, out_size=s),
        grid=(b, n_bands, n_chunks),
        in_specs=[
            pl.BlockSpec((1, n_bands, n_chunks), lambda i, j, k: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, fp), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, fp), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, fp), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fp, c), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, p_band, c), lambda i, j, k: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_bands, p_band, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((p_band, 1), jnp.float32),
            pltpu.VMEM((p_band, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(touch, e, zc, meta, tex_b)

    out = out[:, :, : _BAND_ROWS * s, :].reshape(b, n_bands * _BAND_ROWS, s, c)
    return out[:, :s]


# ---------------------------------------------------------------------------
# Band-range variant: y-sorted faces + ONE program per (batch, band) with a
# dynamic contiguous chunk range
# ---------------------------------------------------------------------------
#
# The (B, band, chunk) grid above pays Mosaic grid-step overhead on every
# (band, chunk) cell, including the ~80% it skips, and re-touches the output
# block every step; measured slower than the plain kernel at 56x56. This
# variant exploits that after the y-center sort the chunks touching a band
# form (a superset of) a CONTIGUOUS range: one program per (batch, band)
# sweeps only chunks [lo, hi) with a dynamic-bound fori_loop. Work drops by
# ~n_bands / (mean touched bands per chunk) with only B*n_bands grid cells.


def _band_range_setup(verts_px, faces, face_tex, out_size, orig_size, cull_mask=None):
    """_band_setup + per-(batch, band) contiguous chunk ranges [lo, hi)."""
    e, zc, meta, tex_b, touch = _band_setup(
        verts_px, faces, face_tex, out_size, orig_size, cull_mask)
    nc = touch.shape[-1]
    t = touch > 0                                               # (B, NB, NC)
    any_t = t.any(-1)
    lo = jnp.argmax(t, axis=-1)                                 # first touching chunk
    hi = nc - jnp.argmax(t[..., ::-1], axis=-1)                 # one past the last
    lo = jnp.where(any_t, lo, 0).astype(jnp.int32)
    hi = jnp.where(any_t, hi, 0).astype(jnp.int32)
    # (B, 1, NB): Mosaic requires a block's last two dims to be (8, 128)-
    # divisible OR equal to the array dims; a (1, NB) block of a (B, NB)
    # array violates that (1 != B), a (1, 1, NB) block of (B, 1, NB) does not
    return e, zc, meta, tex_b, lo[:, None, :], hi[:, None, :]


def _band_range_kernel(lo_ref, hi_ref, e_ref, zc_ref, meta_ref, tex_ref, out_ref,
                       *, out_size):
    """Grid (B, band). Blocks: lo/hi (1, 1, NB) SMEM; e (1, 9, Fp);
    zc (1, 3, Fp); meta (1, 2, Fp); tex (1, Fp, C); out (1, 1, P_band, C)."""
    band = pl.program_id(1)
    c = tex_ref.shape[-1]
    p = out_ref.shape[2]

    s = out_size
    flat = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    col = (flat % s).astype(jnp.float32) + 0.5
    row = (flat // s + band * _BAND_ROWS).astype(jnp.float32) + 0.5
    pmat = jnp.stack([col, row, jnp.ones_like(col)], axis=1)    # (P, 3)

    def body(k, carry):
        zbuf, texacc = carry
        sl = pl.ds(k * _CHUNK, _CHUNK)
        hi_p = jax.lax.Precision.HIGHEST
        w0 = jnp.dot(pmat, e_ref[0, 0:3, sl], precision=hi_p, preferred_element_type=jnp.float32)
        w1 = jnp.dot(pmat, e_ref[0, 3:6, sl], precision=hi_p, preferred_element_type=jnp.float32)
        w2 = jnp.dot(pmat, e_ref[0, 6:9, sl], precision=hi_p, preferred_element_type=jnp.float32)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

        za = jnp.dot(pmat, zc_ref[0, :, sl], precision=hi_p, preferred_element_type=jnp.float32)
        inv_a = meta_ref[0, 0:1, sl]
        val = meta_ref[0, 1:2, sl]
        zpix = za * inv_a

        ok = inside & (val > 0) & (zpix > 1e-6)
        zmask = jnp.where(ok, zpix, _BIG)

        zmin = jnp.min(zmask, axis=1, keepdims=True)
        kidx = jnp.argmin(zmask, axis=1)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (p, _CHUNK), 1) == kidx[:, None]
        ).astype(jnp.float32)
        texc = jnp.dot(onehot, tex_ref[0, sl], precision=hi_p, preferred_element_type=jnp.float32)

        better = zmin < zbuf
        return (jnp.where(better, zmin, zbuf), jnp.where(better, texc, texacc))

    zbuf0 = jnp.full((p, 1), _BIG, jnp.float32)
    tex0 = jnp.zeros((p, c), jnp.float32)
    _, texacc = jax.lax.fori_loop(
        lo_ref[0, 0, band], hi_ref[0, 0, band], body, (zbuf0, tex0)
    )
    out_ref[0, 0] = texacc


@functools.partial(jax.jit, static_argnames=("out_size", "orig_size", "interpret"))
def rasterize_flat_pallas_bandrange(
    verts_px: jnp.ndarray,
    faces: jnp.ndarray,
    face_tex: jnp.ndarray,
    out_size: int,
    orig_size: float = 224.0,
    interpret: bool = False,
    cull_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Band-range Pallas backend (same contract as rasterize_flat).
    `cull_mask` (B, F) bool: faces to skip exactly (see `backface_mask`)."""
    b = verts_px.shape[0]
    s = out_size
    c = face_tex.shape[-1]
    e, zc, meta, tex_b, lo, hi = _band_range_setup(
        verts_px, faces, face_tex, s, orig_size, cull_mask)
    fp = e.shape[-1]
    n_bands = (s + _BAND_ROWS - 1) // _BAND_ROWS
    p_band = _round_up(_BAND_ROWS * s, 8)

    out = pl.pallas_call(
        functools.partial(_band_range_kernel, out_size=s),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, n_bands), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_bands), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, fp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, fp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, fp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, p_band, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_bands, p_band, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lo, hi, e, zc, meta, tex_b)

    out = out[:, :, : _BAND_ROWS * s, :].reshape(b, n_bands * _BAND_ROWS, s, c)
    return out[:, :s]
