"""Prototype: y-banded culled XLA scan — skip (pixel, face) pairs by row.

PERF.md's raster verdict: both the scan and the Pallas kernels are bound
by pair volume (every pixel tests every live face); the algorithmic lever
is skipping pairs. The bandrange Pallas kernel tried (pixel-band ->
contiguous face range) and lost on per-program granularity. This probe
transplants the idea into the XLA scan where granularity is free:

  * compact LIVE faces to a static budget prefix (as rasterize_flat_culled)
    but sorted by y-center, so each scan chunk covers a narrow row band;
  * per (batch, chunk): a dynamic row window [lo, lo+HB) computed from the
    chunk's min corner row; pixel centers for the window are COMPUTED from
    lo (no gather); inside/z tests run on (HB*56, C) pairs instead of
    (56*56, C);
  * each chunk emits (lo, z, id) for its window (scan ys, no carry
    scatter); a final merge folds the NC windows into the full image with
    one (HB -> 56) take_along_axis per chunk — tiny tensors.

Exactness: requires every chunk face's full y-extent inside its window.
With faces ~1-3 px tall at 56px and ~8 rows of y-center spread per chunk,
HB=16/24 should hold; the probe REPORTS the violation count (faces whose
extent escapes the window) and the pixel mismatch vs the plain scan. A
production version would route violators to one residual full-window
chunk; if the probe shows zero violations over articulated poses, the
residual only defends pathological geometry.

Run: python -m scripts.probe_raster_yband [--hb 16] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hb", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--budget_frac", type=float, default=0.6)
    args = ap.parse_args()

    import bench

    bench._require_backend()
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from danet_densepose2smpl_tpu.kernels.rasterizer import (
        _BIG,
        _pixel_centers,
        project_weak_perspective,
        rasterize_flat,
        rasterize_flat_culled,
    )
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import closed_test_mesh, orient_faces

    S = 56
    ORIG = 224.0
    HB = args.hb
    chunk = args.chunk

    cverts, cfaces = closed_test_mesh(6890)
    cfaces, conflicts = orient_faces(cfaces, cverts)
    assert conflicts == 0
    rng = np.random.RandomState(0)
    B = args.batch
    f_total = cfaces.shape[0]
    budget = int(-(-int(args.budget_frac * f_total) // chunk)) * chunk
    n_chunks = budget // chunk

    vb = jnp.asarray(np.stack([
        cverts * (1 + 0.08 * rng.randn()) + rng.randn(3) * 0.04 for _ in range(B)
    ]).astype(np.float32))
    cb = jnp.asarray(np.tile([0.9, 0.0, 0.0], (B, 1)).astype(np.float32))
    vpx = project_weak_perspective(vb, cb, ORIG)
    fj = jnp.asarray(cfaces)
    tex = jnp.asarray(rng.rand(f_total, 3).astype(np.float32))

    def yband(verts_px):
        scale = S / ORIG
        tri = verts_px[:, fj, :]                       # (B, F, 3, 3)
        v0, v1, v2 = tri[:, :, 0, :2], tri[:, :, 1, :2], tri[:, :, 2, :2]
        area = (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) - (
            v1[..., 1] - v0[..., 1]) * (v2[..., 0] - v0[..., 0])
        z_ok = (tri[..., 2] > 0).all(-1)
        dead = (area >= 0) | ~z_ok                     # (B, F) True = cull
        ycen = tri[..., 1].mean(-1) * scale            # (B, F) rows
        key = jnp.where(dead, jnp.float32(1e6), ycen)  # live first, y-sorted
        order = jnp.argsort(key, axis=1)               # (B, F)
        tri = jnp.take_along_axis(tri, order[:, :budget, None, None], axis=1)

        xy = (tri[..., :2] * scale).reshape(B, n_chunks, chunk, 3, 2)
        z = tri[..., 2].reshape(B, n_chunks, chunk, 3)

        # per-chunk dynamic row window
        rowc = xy[..., 1]                              # (B, NC, chunk, 3)
        # dead-padded rows sit at huge y; exclude them from the window via
        # validity (z <= 0 rows are never tested anyway, but their coords
        # would wreck the window): mark pad faces by z<=0
        pad = ~(z > 0).all(-1)                         # (B, NC, chunk)
        rmin = jnp.where(pad[..., None], jnp.inf, rowc).min((2, 3))   # (B, NC)
        rmax = jnp.where(pad[..., None], -jnp.inf, rowc).max((2, 3))  # (B, NC)
        lo = jnp.clip(jnp.floor(rmin - 0.5).astype(jnp.int32), 0, S - HB)
        # violation: extent escapes [lo, lo+HB)
        viol = ((jnp.ceil(rmax - 0.5) >= lo + HB) & jnp.isfinite(rmax)).sum()

        cols = jnp.arange(S, dtype=verts_px.dtype) + 0.5

        def chunk_step(_, inp):
            cxy, cz, clo = inp                         # (B,chunk,3,2),(B,chunk,3),(B,)
            rows = clo[:, None].astype(verts_px.dtype) + jnp.arange(HB, dtype=verts_px.dtype)[None] + 0.5
            gy = jnp.repeat(rows, S, axis=1)           # (B, HB*S)
            gx = jnp.tile(cols, HB)[None]              # (1, HB*S)
            va, vb_, vc = cxy[:, :, 0], cxy[:, :, 1], cxy[:, :, 2]
            careas = (vb_[..., 0] - va[..., 0]) * (vc[..., 1] - va[..., 1]) - (
                vb_[..., 1] - va[..., 1]) * (vc[..., 0] - va[..., 0])

            def edge(a, bb):
                ex = bb[..., 0] - a[..., 0]
                ey = bb[..., 1] - a[..., 1]
                return (ex[:, None, :] * (gy[..., None] - a[:, None, :, 1])
                        - ey[:, None, :] * (gx[..., None] - a[:, None, :, 0]))

            w0, w1, w2 = edge(vb_, vc), edge(vc, va), edge(va, vb_)
            sgn = jnp.sign(careas)[:, None, :]
            inside = (w0 * sgn >= 0) & (w1 * sgn >= 0) & (w2 * sgn >= 0)
            denom = jnp.where(jnp.abs(careas) > 1e-12, careas, 1.0)[:, None, :]
            zpix = ((w0 / denom) * cz[:, None, :, 0] + (w1 / denom) * cz[:, None, :, 1]
                    + (w2 / denom) * cz[:, None, :, 2])
            valid = inside & (jnp.abs(careas)[:, None, :] > 1e-12) & (zpix > 1e-6) & (cz > 0).all(-1)[:, None, :]
            zmask = jnp.where(valid, zpix, _BIG)
            best = jnp.argmin(zmask, axis=-1).astype(jnp.int32)   # (B, HB*S)
            zbest = jnp.min(zmask, axis=-1)
            return 0, (zbest, best)

        _, (zw, bw) = jax.lax.scan(
            chunk_step, 0,
            (xy.transpose(1, 0, 2, 3, 4), z.transpose(1, 0, 2, 3), lo.T),
        )
        # merge NC windows: for output row r, chunk i contributes window row
        # r - lo_i when 0 <= r - lo_i < HB
        zw = zw.transpose(1, 0, 2).reshape(B, n_chunks, HB, S)      # (B,NC,HB,S)
        bw = bw.transpose(1, 0, 2).reshape(B, n_chunks, HB, S)
        r = jnp.arange(S)[None, None, :]                            # (1,1,S)
        rel = r - lo[:, :, None]                                    # (B,NC,S)
        inwin = (rel >= 0) & (rel < HB)
        relc = jnp.clip(rel, 0, HB - 1)
        zfull = jnp.take_along_axis(zw, relc[:, :, :, None], axis=2)  # (B,NC,S,S)
        bfull = jnp.take_along_axis(bw, relc[:, :, :, None], axis=2)
        zfull = jnp.where(inwin[:, :, :, None], zfull, _BIG)
        # winner across chunks; earlier chunk wins ties (argmin first-index)
        win = jnp.argmin(zfull, axis=1)                              # (B,S,S)
        zmin = jnp.min(zfull, axis=1)
        bsel = jnp.take_along_axis(bfull, win[:, None, :, :], axis=1)[:, 0]
        gid = win * chunk + bsel                                     # compacted id
        gid = jnp.where(zmin >= _BIG, budget, gid)
        looked = jnp.take_along_axis(order, jnp.minimum(gid, f_total - 1).reshape(B, -1), axis=1)
        orig = jnp.where(gid.reshape(B, -1) >= budget, f_total, looked)
        table = jnp.concatenate([tex, jnp.zeros((1, 3), tex.dtype)], axis=0)
        return table[orig].reshape(B, S, S, 3), viol

    def timed(fn, *a, iters=20):
        out = fn(*a)
        jax.tree.map(lambda x: float(jnp.sum(x)), out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.tree.map(lambda x: float(jnp.sum(x)), out)
        return (time.perf_counter() - t0) / iters * 1e3

    plain = jax.jit(lambda v: rasterize_flat(v, fj, tex, S, ORIG, chunk))
    culled = jax.jit(lambda v: rasterize_flat_culled(v, fj, tex, S, ORIG, chunk, args.budget_frac))
    banded = jax.jit(yband)

    ref = np.asarray(plain(vpx))
    ms_plain = timed(plain, vpx)
    ms_cull = timed(culled, vpx)
    out, viol = banded(vpx)
    got = np.asarray(out)
    mm = float((np.abs(got - ref).max(-1) > 1e-5).mean())
    ms_band = timed(lambda v: banded(v)[0], vpx)
    print(json.dumps({
        "metric": f"yband_raster_b{B}_hb{HB}",
        "plain_ms": round(ms_plain, 2),
        "culled_ms": round(ms_cull, 2),
        "yband_ms": round(ms_band, 2),
        "speedup_vs_culled": round(ms_cull / ms_band, 3),
        "window_violations": int(viol),
        "pixel_mismatch_frac": round(mm, 6),
    }), flush=True)


if __name__ == "__main__":
    main()
