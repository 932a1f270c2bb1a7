"""Measure the backface-cull live-face fraction over articulated poses.

`rasterize_flat_culled` scans a static budget of compacted front-facing
faces; a batch item whose live fraction exceeds the effective budget
silently loses faces (reference renders everything:
/root/reference/utils/renderer.py:251-298 — the cull must be invisible).
The shipped budget_frac=0.6 rounds UP to 9 chunks = 0.669F at the
13,776-face atlas. One fewer chunk (8 = 0.595F) is ~11% less raster work;
this probe measures whether articulated-pose live fractions leave that
margin: SMPL forward on random axis-angle poses (at 1x and a stressed 2x
the synthetic-training pose scale) -> backface_mask over realistic
weak-perspective cameras. (prepare_targets was deliberately skipped: its
full GT graph takes minutes of cold remote compile and adds nothing to a
front/back area-balance statistic.)

Run: python -m scripts.probe_live_fraction [--batches 40] [--batch 128]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.kernels.rasterizer_pallas import backface_mask
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import closed_synthetic_atlas
    from danet_densepose2smpl_tpu.smpl.model import smpl_forward_aa

    smpl = synthetic_smpl_model()
    atlas, cull_verts = closed_synthetic_atlas(smpl.num_verts)
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import orient_faces

    faces, conflicts = orient_faces(atlas.faces, cull_verts[atlas.vert_mapping])
    assert conflicts == 0
    fj = jnp.asarray(faces)
    vmap_idx = jnp.asarray(atlas.vert_mapping)

    @jax.jit
    def live_frac(pose, betas, cam):
        out = smpl_forward_aa(smpl, betas, pose)
        dp_verts = out.vertices[:, vmap_idx, :]
        mask = backface_mask(dp_verts, cam, fj, 224.0)
        return 1.0 - mask.mean(axis=-1)

    f_total = int(faces.shape[0])
    for label, pose_scale in [("train_like", 1.0), ("stress_2x", 2.0)]:
        fracs = []
        for seed in range(args.batches):
            rng = np.random.RandomState(seed)
            pose = jnp.asarray((rng.randn(args.batch, 72) * 0.3 * pose_scale).astype(np.float32))
            betas = jnp.asarray((rng.randn(args.batch, 10) * 0.5).astype(np.float32))
            # weak-perspective cams over the trainer's realistic range
            cam = jnp.asarray(np.stack([
                rng.uniform(0.6, 1.2, args.batch),
                rng.uniform(-0.2, 0.2, args.batch),
                rng.uniform(-0.2, 0.2, args.batch),
            ], axis=-1).astype(np.float32))
            fracs.append(np.asarray(live_frac(pose, betas, cam)))
        fr = np.concatenate(fracs)
        print(json.dumps({
            "metric": f"live_fraction_{label}",
            "n": int(fr.size),
            "mean": round(float(fr.mean()), 4),
            "p99": round(float(np.percentile(fr, 99)), 4),
            "max": round(float(fr.max()), 4),
            "max_faces": int(round(float(fr.max()) * f_total)),
            "budget_8_chunks": 8 * 1024,
            "budget_9_chunks": 9 * 1024,
        }), flush=True)


if __name__ == "__main__":
    main()
