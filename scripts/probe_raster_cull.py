"""Decompose the bandrange loss at 56px and prototype XLA-scan culling.

Questions (r5, after the closed-mesh cull race):
  1. How much of rasterize_flat_pallas_bandrange's time is the XLA-side
     setup (per-batch argsort + take_along_axis + per-batch texture gather)
     vs the kernel itself?
  2. Does a compacted-prefix XLA scan — argsort the cull mask, gather live
     faces to the front, scan only ceil(live_budget) chunks — beat the plain
     scan at the training shape? (The scan is pair-efficient; culling halves
     pairs on a closed mesh.)

Run: python -m scripts.probe_raster_cull
"""

from __future__ import annotations

import json
import time

import bench


def main():
    bench._require_backend()
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from danet_densepose2smpl_tpu.kernels.rasterizer import (
        project_weak_perspective,
        rasterize_flat,
    )
    from danet_densepose2smpl_tpu.kernels.rasterizer_pallas import (
        _band_range_setup,
        backface_mask,
    )
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import closed_test_mesh, orient_faces

    cverts, cfaces = closed_test_mesh(6890)
    cfaces, conflicts = orient_faces(cfaces, cverts)
    assert conflicts == 0
    rng = np.random.RandomState(0)

    def timed(fn, *a, iters=20):
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.perf_counter() - t0) / iters * 1e3

    for B, S in [(64, 56), (128, 56)]:
        vb = jnp.asarray(np.stack([
            cverts * (1 + 0.08 * rng.randn()) + rng.randn(3) * 0.04 for _ in range(B)
        ]).astype(np.float32))
        cb = jnp.asarray(np.tile([0.9, 0.0, 0.0], (B, 1)).astype(np.float32))
        vpx = project_weak_perspective(vb, cb, 224.0)
        fj = jnp.asarray(cfaces)
        tex = jnp.asarray(rng.rand(len(cfaces), 3).astype(np.float32))

        # 1. setup-only cost of the bandrange path
        setup = jax.jit(lambda v: _band_range_setup(v, fj, tex, S, 224.0)[0])
        ms = timed(setup, vpx)
        print(json.dumps({"metric": f"bandrange_setup_only_b{B}_s{S}", "ms": round(ms, 3)}), flush=True)

        # 2. plain scan
        plain = jax.jit(lambda v: rasterize_flat(v, fj, tex, S, 224.0, 1024))
        ms_plain = timed(plain, vpx)
        print(json.dumps({"metric": f"xla_scan_b{B}_s{S}", "ms": round(ms_plain, 3)}), flush=True)
        ref = np.asarray(plain(vpx))

        # 3. compacted-prefix culled scan: live faces to the front, scan a
        # static 60% budget of chunks (closed mesh culls ~50%); z-ties
        # between live faces keep their relative order (stable argsort)
        f = fj.shape[0]
        chunk = 1024
        budget_faces = int(np.ceil(0.6 * f / chunk)) * chunk

        def culled(v, vb3):
            mask = backface_mask(vb3, cb, fj, 224.0)           # (B, F) True=cull
            order = jnp.argsort(mask, axis=1, stable=True)     # live first
            n_live = (~mask).sum(axis=1).max()                 # correctness guard
            xyz = v[:, fj, :]                                  # (B, F, 3, 3)
            xyz = jnp.take_along_axis(xyz, order[:, :, None, None], axis=1)
            xyz = xyz[:, :budget_faces]
            # winner ids are positions in the SORTED order; remap once at the
            # end through `order`, then fetch from the GLOBAL texture table
            # (the r4-fast pattern — per-batch texture tables re-create the
            # per-chunk gather pathology)
            out = _scan_sorted(xyz, order, S, chunk)
            return out, n_live

        def _scan_sorted(tri, order, s, chunk):
            b = tri.shape[0]
            f_total = tri.shape[1]
            c = tex.shape[-1]
            scale = s / 224.0
            xy = tri[..., :2] * scale
            z = tri[..., 2]
            n_chunks = f_total // chunk
            xy = xy.reshape(b, n_chunks, chunk, 3, 2)
            z = z.reshape(b, n_chunks, chunk, 3)
            px = jnp.arange(s, dtype=tri.dtype) + 0.5
            gy, gx = jnp.meshgrid(px, px, indexing="ij")
            pxy = jnp.stack([gx, gy], axis=-1).reshape(1, s * s, 1, 2)

            def chunk_step(carry, inp):
                zbuf, bestid, offs = carry
                cxy, cz = inp
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
                zmask = jnp.where(valid, zpix, 1e9)
                best = jnp.argmin(zmask, axis=-1).astype(jnp.int32)
                zbest = jnp.min(zmask, axis=-1)
                better = zbest < zbuf
                new_zbuf = jnp.where(better, zbest, zbuf)
                new_best = jnp.where(better, offs + best, bestid)
                return (new_zbuf, new_best, offs + chunk), None

            zbuf0 = jnp.full((b, s * s), 1e9, dtype=tri.dtype)
            best0 = jnp.full((b, s * s), f_total, dtype=jnp.int32)
            (zbuf, bestid, _), _ = jax.lax.scan(
                chunk_step, (zbuf0, best0, jnp.int32(0)),
                (xy.transpose(1, 0, 2, 3, 4), z.transpose(1, 0, 2, 3)))
            # sorted position -> original face id; background (bestid ==
            # f_total, the scan's sentinel) -> global F sentinel row
            f_all = fj.shape[0]
            looked = jnp.take_along_axis(
                order, jnp.minimum(bestid, order.shape[1] - 1), axis=1)
            orig = jnp.where(bestid >= f_total, f_all, looked)
            table = jnp.concatenate([tex, jnp.zeros((1, c), tex.dtype)], axis=0)
            return table[orig].reshape(b, s, s, c)

        culled_j = jax.jit(culled)
        out, n_live = culled_j(vpx, vb)
        print(json.dumps({"metric": f"culled_scan_live_faces_b{B}",
                          "value": int(n_live), "budget": budget_faces}), flush=True)
        ms_cull = timed(lambda v, w: culled_j(v, w)[0], vpx, vb)
        got = np.asarray(culled_j(vpx, vb)[0])
        mm = float((np.abs(got - ref).max(-1) > 1e-5).mean())
        print(json.dumps({"metric": f"culled_scan_b{B}_s{S}", "ms": round(ms_cull, 3),
                          "pixel_mismatch_frac": round(mm, 6),
                          "speedup_vs_plain": round(ms_plain / ms_cull, 3)}), flush=True)


if __name__ == "__main__":
    main()
