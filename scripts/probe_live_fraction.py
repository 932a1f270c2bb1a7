"""Measure the backface-cull live-face fraction over articulated poses.

`rasterize_flat_culled` scans a static budget of compacted front-facing
faces; a batch item whose live fraction exceeds the effective budget
silently loses faces (reference renders everything:
/root/reference/utils/renderer.py:251-298 — the cull must be invisible).
The shipped budget_frac=0.6 rounds UP to 9 chunks = 0.669F at the
13,776-face atlas. One fewer chunk (8 = 0.595F) is ~11% less raster work;
this probe measures whether articulated-pose live fractions leave that
margin, via the exact training path (prepare_targets: pseudo-fit merge ->
SMPL forward -> WLS camera -> live_fraction on target_verts/target_cam).

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
    import jax.tree_util as jtu

    from danet_densepose2smpl_tpu.core.config import Config
    from danet_densepose2smpl_tpu.data.synthetic import synthetic_raw_batch
    from danet_densepose2smpl_tpu.kernels.rasterizer import IUVRenderer
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import closed_synthetic_atlas
    from danet_densepose2smpl_tpu.train.prepare import prepare_targets

    cfg = Config()
    smpl = synthetic_smpl_model()
    atlas, cull_verts = closed_synthetic_atlas(smpl.num_verts)
    renderer = IUVRenderer(atlas, orig_size=cfg.danet.img_size,
                           cull_verts=cull_verts)
    assert renderer.cull

    @jax.jit
    def live_frac(batch):
        prepared = prepare_targets(cfg, smpl, batch)
        return renderer.live_fraction(prepared["target_verts"],
                                      prepared["target_cam"])

    f_total = int(atlas.faces.shape[0])
    for label, pose_scale in [("train_like", 1.0), ("stress_2x", 2.0)]:
        fracs = []
        for seed in range(args.batches):
            raw = synthetic_raw_batch(cfg, args.batch, seed=seed)
            if pose_scale != 1.0:
                raw["pose"] = (raw["pose"] * pose_scale).astype(np.float32)
                raw["opt_pose"] = (raw["opt_pose"] * pose_scale).astype(np.float32)
            batch = jtu.tree_map(jnp.asarray, raw)
            fracs.append(np.asarray(live_frac(batch)))
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
