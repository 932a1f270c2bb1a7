"""End-to-end benchmark: serving inference + flagship training throughput.

Prints one labeled JSON line per metric; the LAST line is always the
serving-inference metric {"metric", "value", "unit", "vs_baseline"} the
driver parses. Earlier lines record flagship train-step throughput —
fp32 B=16 (the reference's batch size), bf16+remat at B=64 (the r2/r3
cross-round anchor), the r5 operating point bf16 no-remat +
part_head_chunks=3 at B=128, and the TRUE full trainer step at B=128
(raw batch, in-jit GT prep + raster) in both the r4-anchor remat config
and the r5 config — so the training numbers are driver-captured, not
just self-reported. A piped serving row (real input pipeline: disk ->
decode -> H2D -> device preprocess -> forward) runs before the headline
compute-ceiling row so ingest regressions are driver-visible too.

Inference metric: imgs/sec/chip through the full flagship pipeline (DaNet
HRNet-W48 + decomposed GCN regressor + SMPL LBS to 6890 vertices), batch
256, bf16 params/activations (the serving configuration; parameter outputs
deviate <=0.0015 from fp32, the SMPL head runs fp32). Batch sweep on v5e:
64 -> 1135, 128 -> 1350, 256 -> 1447 imgs/s (small-channel HRNet convs want
many rows to fill the MXU), 512 -> OOM; 256 is the serving operating point.
This is a COMPUTE-CEILING number: the batch is pre-staged on device (no
H2D, no input pipeline) — see PERF.md's ingest section for the measured
end-to-end pipeline rates.

Baseline (BASELINE.md north star): >=10x PyTorch-CPU imgs/sec. The PyTorch
reference cannot run in this container (its CUDA/smplx deps are absent), so
the recorded stand-in baseline is this same pipeline on one CPU process
(JAX CPU, measured in this container: 0.171 imgs/sec at B=16); the 10x bar
is then vs_baseline >= 10.

Timing note: on the tunneled axon TPU platform `block_until_ready` does not
actually wait, so the loops pipeline N batches and then force a scalar
device-to-host fetch (which cannot complete before the compute has) —
sustained-throughput timing that is honest on every backend.
"""

from __future__ import annotations

import json
import os
import time
import traceback

CPU_BASELINE_IMGS_PER_SEC = 0.171  # measured: this pipeline, JAX CPU, B=16


def bench_train(modes=None):
    """Flagship train-step throughput: one JSON line per mode.

    `modes`: list of (name, batch_size, danet_cfg_overrides[, full]) —
    default the headline configurations; scripts/bench_sweep.py passes
    others. `full=True` benches the TRUE trainer step: a raw batch (GT
    pose/betas + fits-lookup results, no precomputed targets) so the in-jit
    target preparation — pseudo-fit merge, two SMPL GT forwards, WLS camera
    fits, keypoint projection, 13.8k-face GT IUV raster — runs inside the
    timed program, exactly like cli/train.py. The non-full modes time the
    prepared-batch step (forward+losses+backward+Adam only) and are kept
    for cross-round comparability."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from danet_densepose2smpl_tpu.core.config import Config, DaNetConfig, replace
    from danet_densepose2smpl_tpu.data import synthetic_batch
    from danet_densepose2smpl_tpu.data.synthetic import synthetic_raw_batch
    from danet_densepose2smpl_tpu.kernels.rasterizer import IUVRenderer
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import synthetic_densepose_atlas

    from danet_densepose2smpl_tpu.train import create_train_state, make_train_step

    smpl = synthetic_smpl_model()  # full 6890-vertex body
    if modes is None:
        modes = [
            ("train_fp32_b16", 16, {}),
            ("train_bf16_remat_b64", 64, {"compute_dtype": "bfloat16", "remat_backbone": True}),
            # B=128 bf16 is the high-throughput operating point. r5's best
            # config is NO remat + part-chunked crop+head (chunks=3): the
            # chunked crop halves the peak-HBM (B,S,S,24C) temps, which is
            # what lets the no-remat graph fit — measured on the v5e:
            # remat 332.0 -> noremat+chunks3 359.0 prepared imgs/s,
            # full (in-jit GT prep + 13.8k-face raster) 271.7 -> 288.7.
            # The remat full row stays as the r3/r4 cross-round anchor.
            ("train_bf16_noremat_chunks3_b128", 128,
             {"compute_dtype": "bfloat16", "part_head_chunks": 3}),
            ("train_full_bf16_remat_b128", 128,
             {"compute_dtype": "bfloat16", "remat_backbone": True}, True),
            ("train_full_bf16_noremat_chunks3_b128", 128,
             {"compute_dtype": "bfloat16", "part_head_chunks": 3}, True),
            # + backface-culled GT raster (exact on closed meshes; the real
            # SMPL mesh is watertight, so this row uses the closed synthetic
            # atlas — same 6890/13776 vert/face counts — instead of the
            # culling-invalid random-soup atlas the other full rows keep for
            # cross-round comparability)
            ("train_full_bf16_noremat_chunks3_cull_b128", 128,
             {"compute_dtype": "bfloat16", "part_head_chunks": 3,
              "raster_cull": True}, True),
        ]
    for name, batch_size, danet_kw, *rest in modes:
        full = bool(rest and rest[0])
        danet_kw = dict(danet_kw or {})
        raster_cull = danet_kw.pop("raster_cull", False)
        cull_budget_frac = danet_kw.pop("cull_budget_frac", 0.55)
        cfg = Config(danet=replace(DaNetConfig(), **danet_kw)) if danet_kw else Config()
        model = DaNet(cfg.danet, train=True)
        if full:
            batch = jtu.tree_map(jnp.asarray, synthetic_raw_batch(cfg, batch_size))
            if raster_cull:
                from danet_densepose2smpl_tpu.smpl.densepose_atlas import closed_synthetic_atlas

                atlas, cull_verts = closed_synthetic_atlas(smpl.num_verts)
            else:
                atlas, cull_verts = synthetic_densepose_atlas(smpl), None
            renderer = IUVRenderer(
                atlas, orig_size=cfg.danet.img_size,
                out_size=cfg.danet.heatmap_size, cull_verts=cull_verts,
                cull_budget_frac=cull_budget_frac,
            )
        else:
            batch = jtu.tree_map(jnp.asarray, synthetic_batch(cfg, batch_size, num_verts=6890))
            renderer = None
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
        )
        step = make_train_step(model, smpl, cfg, donate=True, renderer=renderer)
        rng = jax.random.PRNGKey(1)
        state, metrics = step(state, batch, rng)  # warmup/compile
        float(metrics["loss_total"])              # forced host fetch

        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch, rng)
        float(metrics["loss_total"])  # D2H fetch: completes after all steps
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"danet_{name}_imgs_per_sec",
                    "value": round(batch_size * n_iters / dt, 2),
                    "unit": "imgs/sec/chip",
                }
            ),
            flush=True,
        )
        del state, step, batch  # release HBM before the next mode


def bench_inference(B=256, n_iters=16, danet_kw=None):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree
    from danet_densepose2smpl_tpu.smpl import smpl_forward, synthetic_smpl_model

    cfg = DaNetConfig(**(danet_kw or {}))
    model = DaNet(cfg, train=False)
    smpl = synthetic_smpl_model()  # full 6890-vertex body

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, image[:1])

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

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, smpl_arrays, image)
    float(out)  # D2H fetch: completes only after all queued batches ran
    dt = time.perf_counter() - t0

    imgs_per_sec = B * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "danet_e2e_inference_imgs_per_sec"
                          + ("" if B == 256 else f"_b{B}")
                          + (f"_chunks{danet_kw['part_head_chunks']}"
                             if danet_kw and "part_head_chunks" in danet_kw else ""),
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / CPU_BASELINE_IMGS_PER_SEC, 2),
            }
        ),
        flush=True,
    )


def bench_inference_piped(B=256, n_batches=6, img_size=320):
    """Serving throughput fed by the REAL input pipeline (VERDICT r4 next-#6):
    JPEG files on disk -> host decode threads (PrefetchLoader) -> uint8 full
    frames H2D -> in-jit device crop/normalize (data/pipeline.
    device_preprocess) -> bf16 flagship forward + SMPL. Unlike the headline
    compute-ceiling metric (pre-staged batch), this number moves when ingest
    regresses. On a 1-core host it is decode-bound (PERF.md ingest section);
    on a real multi-core TPU host it approaches the compute ceiling."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import PrefetchLoader, ResumableLoader
    from danet_densepose2smpl_tpu.data.pipeline import device_preprocess
    from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree
    from danet_densepose2smpl_tpu.smpl import smpl_forward, synthetic_smpl_model

    cfg = DaNetConfig()
    model = DaNet(cfg, train=False)
    smpl = synthetic_smpl_model()

    tmp = tempfile.mkdtemp(prefix="danet_piped_bench_")
    npz, img_dir = write_synthetic_dataset(tmp, n=2 * B, img_size=img_size)
    ds = NpzDataset(npz, img_dir, name="bench", is_train=False,
                    heatmap_size=cfg.heatmap_size, return_raw=True)
    loader = PrefetchLoader(ResumableLoader(ds, B, shuffle=False, drop_last=True))

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))
    variables = cast_float_tree(variables, jnp.bfloat16)
    smpl_arrays = jtu.tree_map(jnp.asarray, smpl)

    @jax.jit
    def forward(variables, smpl_arrays, raw, centers, scales):
        img = device_preprocess(raw, centers, scales, out_size=cfg.img_size)
        out = model.apply(variables, img.astype(jnp.bfloat16))
        smpl_out = smpl_forward(smpl_arrays, out["pred_shape"], out["pred_rotmat"])
        return jnp.sum(smpl_out.vertices) + jnp.sum(out["pred_cam"])

    def batches():
        epoch = 0
        while True:
            for _, b in loader.epoch(epoch):
                yield b
            epoch += 1

    it = batches()
    b0 = next(it)
    args0 = (jnp.asarray(b0["raw_img"]), jnp.asarray(b0["center"]),
             jnp.asarray(b0["scale"]))
    float(forward(variables, smpl_arrays, *args0))  # compile + fetch

    t0 = time.perf_counter()
    out = None
    for _ in range(n_batches):
        b = next(it)
        out = forward(variables, smpl_arrays, jnp.asarray(b["raw_img"]),
                      jnp.asarray(b["center"]), jnp.asarray(b["scale"]))
    float(out)
    dt = time.perf_counter() - t0
    imgs_per_sec = B * n_batches / dt
    print(json.dumps({
        "metric": "danet_e2e_inference_piped_imgs_per_sec",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "note": "disk->decode->H2D->device-preprocess->bf16 forward; "
                "decode-bound on few-core hosts",
    }), flush=True)


def _require_backend(timeout_s: float = 240.0):
    """Fail fast (with a parseable JSON line) if the accelerator backend
    cannot initialize — the tunneled TPU goes down for hours at a time and
    jax.devices() then blocks forever, which would turn the whole bench into
    an opaque driver timeout."""
    import threading

    devs = []
    def probe():
        import jax

        devs.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not devs:
        print(
            json.dumps(
                {
                    "metric": "danet_e2e_inference_imgs_per_sec",
                    "value": 0.0,
                    "unit": "imgs/sec/chip",
                    "error": f"jax backend init did not complete in {timeout_s:.0f}s "
                             "(TPU tunnel down?) — no benchmark ran",
                }
            ),
            flush=True,
        )
        os._exit(0)


def _enable_compile_cache():
    """Persistent compile cache (same dir the multichip dryrun uses): the
    flagship train graphs take ~10 min each to compile cold through the
    tunneled remote compiler; a repeat bench run (e.g. the driver's, after
    this repo's own verification run) skips straight to timing."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:
        # a silently-disabled cache makes repeat runs mysteriously slow;
        # leave a visible breadcrumb in driver logs
        print(json.dumps({"metric": "danet_compile_cache_disabled",
                          "value": f"{type(e).__name__}: {e}"}), flush=True)


def main():
    _require_backend()
    _enable_compile_cache()
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            bench_train()
        except Exception:
            # never let the training bench take down the headline metric
            print(json.dumps({"metric": "danet_train_bench_error",
                              "value": traceback.format_exc().strip().splitlines()[-1]}),
                  flush=True)
    if os.environ.get("BENCH_PIPED", "1") != "0":
        try:
            bench_inference_piped()
        except Exception:
            print(json.dumps({"metric": "danet_piped_bench_error",
                              "value": traceback.format_exc().strip().splitlines()[-1]}),
                  flush=True)
    bench_inference()


if __name__ == "__main__":
    main()
