"""Race scan chunk sizes for the production XLA rasterizer (r5).

The scan chunk has been 1024 since r1, chosen ad hoc. Chunk size moves
three costs against each other at fixed pair volume:
  * scan trip count (per-iteration fixed overhead),
  * the culled path's budget rounding (budget = ceil(0.55F/chunk)*chunk:
    512 gives 7680 faces = 0.557F where 1024/2048 give 8192 = 0.595F),
  * the fused inside-test's working-set tile shape.

Races plain + culled at the training shape (B=128 @56px, closed
13,776-face mesh, articulated per-sample vertices) and the LSP part-render
shape (B=16 @224px). Exactness vs the chunk=1024 production output is
asserted per variant (identical winner set; z-tie order within a chunk is
chunk-size-invariant because ties resolve by global compacted order).

Run: python -m scripts.probe_raster_chunk
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
        rasterize_flat_culled,
    )
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import (
        closed_test_mesh,
        orient_faces,
    )

    cverts, cfaces = closed_test_mesh(6890)
    cfaces, conflicts = orient_faces(cfaces, cverts)
    assert conflicts == 0
    rng = np.random.RandomState(0)
    fj = jnp.asarray(cfaces)
    tex = jnp.asarray(rng.rand(len(cfaces), 3).astype(np.float32))

    def timed(fn, *a, iters=20):
        out = fn(*a)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters * 1e3

    for B, S in [(128, 56), (16, 224)]:
        vb = jnp.asarray(np.stack([
            cverts * (1 + 0.08 * rng.randn()) + rng.randn(3) * 0.04
            for _ in range(B)
        ]).astype(np.float32))
        cb = jnp.asarray(np.tile([0.9, 0.0, 0.0], (B, 1)).astype(np.float32))
        vpx = project_weak_perspective(vb, cb, 224.0)

        for kind, fn in (("plain", rasterize_flat), ("culled", rasterize_flat_culled)):
            ref = None
            for chunk in (1024, 64, 128, 256, 512, 2048):  # baseline first
                j = jax.jit(lambda v, _c=chunk, _f=fn: _f(v, fj, tex, S, 224.0, _c))
                ms = timed(j, vpx)
                got = np.asarray(j(vpx))
                if ref is None:
                    ref = got
                mm = float((np.abs(got - ref).max(-1) > 1e-5).mean())
                print(json.dumps({
                    "metric": f"raster_{kind}_b{B}_s{S}_chunk{chunk}",
                    "ms": round(ms, 2),
                    "pixel_mismatch_vs_1024": round(mm, 6),
                }), flush=True)


if __name__ == "__main__":
    main()
