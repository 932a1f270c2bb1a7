"""End-to-end inference benchmark: image -> IUV -> SMPL params -> vertices.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: imgs/sec/chip through the full flagship pipeline (DaNet HRNet-W48 +
decomposed GCN regressor + SMPL LBS to 6890 vertices), batch 256, bf16
params/activations (the serving configuration; parameter outputs deviate
<=0.0015 from fp32, the SMPL head runs fp32). Batch sweep on v5e: 64 ->
1135, 128 -> 1350, 256 -> 1447 imgs/s (small-channel HRNet convs want many
rows to fill the MXU), 512 -> OOM; 256 is the serving operating point.
Training defaults to fp32 (see PERF.md for the bf16+remat training mode).

Baseline (BASELINE.md north star): >=10x PyTorch-CPU imgs/sec. The PyTorch
reference cannot run in this container (its CUDA/smplx deps are absent), so
the recorded stand-in baseline is this same pipeline on one CPU process
(JAX CPU, measured in this container: 0.171 imgs/sec at B=16); the 10x bar
is then vs_baseline >= 10.

Timing note: on the tunneled axon TPU platform `block_until_ready` does not
actually wait, so the loop pipelines N batches and then forces a scalar
device-to-host fetch (which cannot complete before the compute has) —
sustained-throughput timing that is honest on every backend.
"""

from __future__ import annotations

import json
import time

CPU_BASELINE_IMGS_PER_SEC = 0.171  # measured: this pipeline, JAX CPU, B=16


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.smpl import smpl_forward, synthetic_smpl_model

    B = 256
    cfg = DaNetConfig()
    model = DaNet(cfg, train=False)
    smpl = synthetic_smpl_model()  # full 6890-vertex body

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, image[:1])

    import jax.tree_util as jtu

    from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree

    smpl_arrays = jtu.tree_map(jnp.asarray, smpl)
    variables = cast_float_tree(variables, jnp.bfloat16)
    image = image.astype(jnp.bfloat16)

    # params/model arrays as arguments (closure constants overflow the
    # remote-compile payload limit and trigger slow constant folding)
    @jax.jit
    def forward(variables, smpl_arrays, img):
        out = model.apply(variables, img)
        smpl_out = smpl_forward(smpl_arrays, out["pred_shape"], out["pred_rotmat"])
        # scalar checksum: defeats dead-code elimination and makes the final
        # host fetch depend on the whole computation
        return jnp.sum(smpl_out.vertices) + jnp.sum(smpl_out.joints) + jnp.sum(out["pred_cam"])

    # warmup / compile (forced host fetch)
    float(forward(variables, smpl_arrays, image))

    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, smpl_arrays, image)
    float(out)  # D2H fetch: completes only after all queued batches ran
    dt = time.perf_counter() - t0

    imgs_per_sec = B * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "danet_e2e_inference_imgs_per_sec",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / CPU_BASELINE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
