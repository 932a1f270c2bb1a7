"""On-chip probe: is the XLA rasterizer's per-chunk argmin/take_along/gather
the same TPU-gather pathology probe_partial_loss.py exposed in the CE loss?

Times rasterize_flat (production) against a rewrite whose winner selection is
min + one-hot-contraction (no take_along_axis, no ctex[best] row gather),
checking pixel-exactness, at the training shape (13,776 faces, 56x56).

  python -m scripts.probe_raster_gather [--batch 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import bench


def _timed(fn, fetch, iters):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--size", type=int, default=56)
    args = p.parse_args(argv)

    bench._require_backend()
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.kernels.rasterizer import (
        _BIG,
        _face_corners,
        project_weak_perspective,
    )
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model, smpl_forward
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import synthetic_densepose_atlas

    smpl = synthetic_smpl_model()
    atlas = synthetic_densepose_atlas(smpl)
    B, S = args.batch, args.size
    key = jax.random.PRNGKey(0)
    pose = jax.random.normal(key, (B, 24, 3)) * 0.2
    from danet_densepose2smpl_tpu.ops.rotations import batch_rodrigues

    rotmat = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, 24, 3, 3)
    betas = jax.random.normal(jax.random.fold_in(key, 1), (B, 10)) * 0.5
    verts = smpl_forward(smpl, betas, rotmat).vertices
    cam = jnp.tile(jnp.asarray([0.9, 0.0, 0.1]), (B, 1))
    dp_verts = verts[:, jnp.asarray(atlas.vert_mapping), :]
    verts_px = jax.block_until_ready(project_weak_perspective(dp_verts, cam, 224.0))
    faces = jnp.asarray(atlas.faces)
    face_tex = jnp.asarray(atlas.face_textures)

    def emit(name, dt, extra=None):
        row = {"metric": f"probe_raster_{name}", "ms": round(dt * 1e3, 2),
               "batch": B, "size": S}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    def make_raster(select: str, chunk: int = 1024):
        """rasterize_flat with a pluggable winner-selection strategy."""

        def raster(vpx):
            b = vpx.shape[0]
            s = S
            f_total = faces.shape[0]
            c = face_tex.shape[-1]
            scale = s / 224.0
            xy, z = _face_corners(vpx, faces, scale)
            pad = (-f_total) % chunk
            ftex = face_tex
            if pad:
                xy = jnp.pad(xy, ((0, 0), (0, pad), (0, 0), (0, 0)))
                z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
                ftex = jnp.pad(ftex, ((0, pad), (0, 0)))
            n_chunks = (f_total + pad) // chunk
            xy = xy.reshape(b, n_chunks, chunk, 3, 2)
            z = z.reshape(b, n_chunks, chunk, 3)
            tex = ftex.reshape(n_chunks, chunk, c)

            px = jnp.arange(s, dtype=vpx.dtype) + 0.5
            gy, gx = jnp.meshgrid(px, px, indexing="ij")
            pxy = jnp.stack([gx, gy], axis=-1).reshape(1, s * s, 1, 2)

            def chunk_step(carry, inp):
                zbuf, out = carry[0], carry[1]
                cxy, cz, ctex = inp
                v0, v1, v2 = cxy[:, :, 0], cxy[:, :, 1], cxy[:, :, 2]
                area = (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) - (
                    v1[..., 1] - v0[..., 1]) * (v2[..., 0] - v0[..., 0])

                def edge(a, bb):
                    ex = bb[..., 0] - a[..., 0]
                    ey = bb[..., 1] - a[..., 1]
                    return (ex[:, None, :] * (pxy[..., 1] - a[:, None, :, 1])
                            - ey[:, None, :] * (pxy[..., 0] - a[:, None, :, 0]))

                w0, w1, w2 = edge(v1, v2), edge(v2, v0), edge(v0, v1)
                sgn = jnp.sign(area)[:, None, :]
                inside = (w0 * sgn >= 0) & (w1 * sgn >= 0) & (w2 * sgn >= 0)
                denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)[:, None, :]
                zpix = (w0 / denom) * cz[:, None, :, 0] + (w1 / denom) * cz[:, None, :, 1] + (w2 / denom) * cz[:, None, :, 2]
                valid = inside & (jnp.abs(area)[:, None, :] > 1e-12) & (zpix > 1e-6) & (cz > 0).all(-1)[:, None, :]
                zmask = jnp.where(valid, zpix, _BIG)

                if select == "bestid_carry":
                    zbuf, bestid, offs = carry[0], carry[1], carry[2]
                    best = jnp.argmin(zmask, axis=-1)
                    zbest = jnp.min(zmask, axis=-1)
                    better = zbest < zbuf
                    new_zbuf = jnp.where(better, zbest, zbuf)
                    new_best = jnp.where(better, offs + best, bestid)
                    return (new_zbuf, new_best, offs + zmask.shape[-1]), None

                if select == "argmin_gather":  # production
                    best = jnp.argmin(zmask, axis=-1)
                    zbest = jnp.take_along_axis(zmask, best[..., None], axis=-1)[..., 0]
                    tex_best = ctex[best]
                elif select == "min_onehot":
                    best = jnp.argmin(zmask, axis=-1)
                    zbest = jnp.min(zmask, axis=-1)
                    oh = jax.nn.one_hot(best, zmask.shape[-1], dtype=ctex.dtype)
                    tex_best = jnp.einsum("bpk,kc->bpc", oh, ctex)
                elif select == "min_onehot_exact":
                    best = jnp.argmin(zmask, axis=-1)
                    zbest = jnp.min(zmask, axis=-1)
                    oh = jax.nn.one_hot(best, zmask.shape[-1], dtype=ctex.dtype)
                    tex_best = jnp.einsum("bpk,kc->bpc", oh, ctex,
                                          precision=jax.lax.Precision.HIGHEST)
                elif select == "min_firstmask":
                    zbest = jnp.min(zmask, axis=-1)
                    ismin = zmask <= zbest[..., None]
                    # first-minimum mask without argmin: strictly-before cumsum
                    first = ismin & (jnp.cumsum(ismin, axis=-1) == 1)
                    tex_best = jnp.einsum("bpk,kc->bpc", first.astype(ctex.dtype), ctex)
                else:
                    raise ValueError(select)

                better = zbest < zbuf
                new_zbuf = jnp.where(better, zbest, zbuf)
                new_out = jnp.where(better[..., None], tex_best, out)
                return (new_zbuf, new_out), None

            zbuf0 = jnp.full((b, s * s), _BIG, dtype=vpx.dtype)
            if select == "bestid_carry":
                # carry the winning global face id; ONE texture gather at the
                # end instead of one per chunk (plus a padded bg row at id -1
                # -> last row of a zero-padded table)
                best0 = jnp.full((b, s * s), n_chunks * chunk, jnp.int32)
                (zbuf, bestid, _), _ = jax.lax.scan(
                    chunk_step, (zbuf0, best0, jnp.int32(0)),
                    (xy.transpose(1, 0, 2, 3, 4), z.transpose(1, 0, 2, 3), tex))
                table = jnp.concatenate([ftex, jnp.zeros((1, c), ftex.dtype)], axis=0)
                out = table[bestid]
                return out.reshape(b, s, s, c)
            out0 = jnp.zeros((b, s * s, c), dtype=ftex.dtype)
            (zbuf, out), _ = jax.lax.scan(
                chunk_step, (zbuf0, out0),
                (xy.transpose(1, 0, 2, 3, 4), z.transpose(1, 0, 2, 3), tex))
            return out.reshape(b, s, s, c)

        return jax.jit(raster)

    fetch = lambda o: float(jnp.sum(o))
    base = make_raster("argmin_gather")
    dt = _timed(lambda: base(verts_px), fetch, args.iters)
    emit("baseline_argmin_gather", dt)
    ref = jax.block_until_ready(base(verts_px))

    for name in ("min_onehot_exact", "bestid_carry"):
        f = make_raster(name)
        dt = _timed(lambda: f(verts_px), fetch, args.iters)
        got = f(verts_px)
        mism = float(jnp.mean(jnp.any(got != ref, axis=-1)))
        emit(name, dt, {"pixel_mismatch_frac": round(mism, 6)})


if __name__ == "__main__":
    main()
