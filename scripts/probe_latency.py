"""Serving LATENCY per batch size (r5) — the number a deployment engineer
asks for next after throughput.

Measures per-request wall latency of the full flagship inference program
(DaNet HRNet-W48 + decomposed GCN regressor + SMPL LBS to 6890 verts, bf16
serving config, the same graph bench.py's throughput rows time) at small
batches, SEQUENTIALLY: one batch in flight at a time, each iteration ends
with a forced scalar D2H fetch (block_until_ready does not wait on the
tunneled axon platform — bench.py:26-29). Reports p50/p90 over n_iters.

Note the tunnel adds a host->chip round trip to every sequential call that
an on-host serving process would not pay; the p50s here are therefore an
UPPER bound on real v5e latency. Throughput rows pipeline and are immune.

Run: python -m scripts.probe_latency
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
    import jax.tree_util as jtu
    import numpy as np

    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree
    from danet_densepose2smpl_tpu.smpl import smpl_forward, synthetic_smpl_model

    cfg = DaNetConfig()
    model = DaNet(cfg, train=False)
    smpl = synthetic_smpl_model()
    rng = np.random.RandomState(0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32)))
    smpl_arrays = jtu.tree_map(jnp.asarray, smpl)
    variables = cast_float_tree(variables, jnp.bfloat16)

    @jax.jit
    def forward(variables, smpl_arrays, img):
        out = model.apply(variables, img)
        smpl_out = smpl_forward(smpl_arrays, out["pred_shape"], out["pred_rotmat"])
        return (jnp.sum(smpl_out.vertices) + jnp.sum(smpl_out.joints)
                + jnp.sum(out["pred_cam"]))

    for B in (1, 4, 16, 64):
        img = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)).astype(jnp.bfloat16)
        float(forward(variables, smpl_arrays, img))  # compile + warm
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            float(forward(variables, smpl_arrays, img))  # sequential: fetch per call
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        print(json.dumps({
            "metric": f"serving_latency_b{B}_ms",
            "p50": round(lat[len(lat) // 2], 2),
            "p90": round(lat[int(len(lat) * 0.9)], 2),
            "imgs_per_sec_sequential": round(B / (lat[len(lat) // 2] / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
