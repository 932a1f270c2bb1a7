"""Component profile of the TRAINING step on the real chip (r3 VERDICT #1).

The serving path has a component table in PERF.md; this produces the same
for training: the shares of GT preparation (pseudo-fit merge + 2 SMPL
forwards + WLS camera fits), the 13.8k-face GT IUV raster, forward, backward
(and remat overhead), and the Adam update — each timed as its own jitted
graph with the forced-fetch protocol, at the production configurations.

Also exposes the honesty gap the r3 bench had: bench.py's train bench feeds
a PREPARED batch (opt_rotmat + uv_image_gt present), so prepare_targets and
the raster never ran in the driver-captured number; `step_full` here is the
true trainer step on a raw batch with the renderer wired in.

Remote compiles through the tunnel are slow — run one phase at a time and
let the persistent compile cache accumulate:

  python -m scripts.profile_train --mode fp32_b16 --phase steps
  python -m scripts.profile_train --mode bf16_remat_b64 --phase parts
  ...

Phases: steps (step_prepared, step_full), prep (prepare with/without
raster), parts (fwd, fwd+bwd, adam). Modes: fp32_b16, bf16_b16,
bf16_remat_b16, bf16_remat_b64, bf16_remat_b128.
"""

from __future__ import annotations

import argparse
import json
import time

import bench

MODES = {
    "fp32_b16": (16, {}),
    "bf16_b16": (16, {"compute_dtype": "bfloat16"}),
    "bf16_remat_b16": (16, {"compute_dtype": "bfloat16", "remat_backbone": True}),
    # no-remat probes: remat exists to fit HBM; if these compile and run,
    # the re-forward FLOPs are pure overhead at that batch
    "bf16_b64": (64, {"compute_dtype": "bfloat16"}),
    "bf16_b128": (128, {"compute_dtype": "bfloat16"}),
    "bf16_remat_b64": (64, {"compute_dtype": "bfloat16", "remat_backbone": True}),
    "bf16_remat_b128": (128, {"compute_dtype": "bfloat16", "remat_backbone": True}),
    "bf16_remat_b192": (192, {"compute_dtype": "bfloat16", "remat_backbone": True}),
    # NOTE: part_head_chunks is an inference-only knob (the chunked STN path
    # gates on `not self.train`), so the batch-scaling probe past 192 is the
    # plain configuration
    "bf16_remat_b256": (256, {"compute_dtype": "bfloat16", "remat_backbone": True}),
    "bf16_rematmod_b64": (64, {"compute_dtype": "bfloat16", "remat_backbone": True,
                               "remat_scope": "modules"}),
    "bf16_rematmod_b128": (128, {"compute_dtype": "bfloat16", "remat_backbone": True,
                                 "remat_scope": "modules"}),
    "bf16_rematmod_b192": (192, {"compute_dtype": "bfloat16", "remat_backbone": True,
                                 "remat_scope": "modules"}),
}


def _emit(name: str, mode: str, batch: int, dt: float, extra=None):
    row = {"metric": f"train_profile_{name}_{mode}", "ms": round(dt * 1e3, 2),
           "imgs_per_sec": round(batch / dt, 1)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def _timed(fn, fetch, iters):
    out = fn()
    fetch(out)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)  # D2H completes only after all iters ran
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="fp32_b16", choices=sorted(MODES))
    p.add_argument("--phase", default="steps",
                   choices=["steps", "prep", "parts", "fwdsplit", "losssplit"])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    bench._require_backend()
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import optax

    from danet_densepose2smpl_tpu.core.config import Config, DaNetConfig, replace
    from danet_densepose2smpl_tpu.data.synthetic import synthetic_batch, synthetic_raw_batch
    from danet_densepose2smpl_tpu.kernels.rasterizer import IUVRenderer
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import synthetic_densepose_atlas
    from danet_densepose2smpl_tpu.train.prepare import prepare_targets
    from danet_densepose2smpl_tpu.train.step import (
        create_train_state,
        make_loss_fn,
        make_optimizer,
        make_train_step,
    )

    B, danet_kw = MODES[args.mode]
    cfg = Config(danet=replace(DaNetConfig(), **danet_kw)) if danet_kw else Config()
    model = DaNet(cfg.danet, train=True)
    smpl = synthetic_smpl_model()  # full 6890-vertex body
    atlas = synthetic_densepose_atlas(smpl)
    renderer = IUVRenderer(atlas, orig_size=cfg.danet.img_size,
                           out_size=cfg.danet.heatmap_size)
    print(json.dumps({"meta": "profile_train", "mode": args.mode, "batch": B,
                      "num_faces": int(atlas.faces.shape[0]),
                      "backend": jax.default_backend()}), flush=True)

    raw = jtu.tree_map(jnp.asarray, synthetic_raw_batch(cfg, B))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3)))
    rng = jax.random.PRNGKey(1)

    if args.phase == "steps":
        prepared = jtu.tree_map(jnp.asarray, synthetic_batch(cfg, B, num_verts=6890))
        # bench.py's configuration: prepared batch, no renderer
        step_pre = make_train_step(model, smpl, cfg, donate=True)
        s = state
        s, m = step_pre(s, prepared, rng)
        float(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = step_pre(s, prepared, rng)
        float(m["loss_total"])
        _emit("step_prepared", args.mode, B, (time.perf_counter() - t0) / args.iters)
        del s, step_pre, prepared

        # the TRUE trainer step: raw batch -> in-jit prepare + raster + step.
        # Fresh state: the original was DONATED to step_prepared's first call.
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3)))
        step_full = make_train_step(model, smpl, cfg, donate=True, renderer=renderer)
        s = state
        s, m = step_full(s, raw, rng)
        float(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = step_full(s, raw, rng)
        float(m["loss_total"])
        _emit("step_full", args.mode, B, (time.perf_counter() - t0) / args.iters)

    elif args.phase == "prep":
        def prep_with(r):
            f = jax.jit(lambda b: prepare_targets(cfg, smpl, b, renderer=r))
            return _timed(lambda: f(raw),
                          lambda o: float(jnp.sum(o["target_smpl_kps"]) +
                                          (jnp.sum(o["uv_image_gt"]) if r else 0.0)),
                          args.iters)

        dt_full = prep_with(renderer)
        _emit("prepare_with_raster", args.mode, B, dt_full)
        dt_norast = prep_with(None)
        _emit("prepare_no_raster", args.mode, B, dt_norast)
        _emit("raster_share", args.mode, B, dt_full - dt_norast)

    elif args.phase == "fwdsplit":
        # attribute the train-mode forward_loss cost: model.apply alone
        # (train graph: BN batch stats, STN jitter, PartDrop) vs + losses
        prepared = jtu.tree_map(jnp.asarray, synthetic_batch(cfg, B, num_verts=6890))
        from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree

        mp = cfg.danet.compute_dtype == "bfloat16"
        fwd_params = cast_float_tree(state.params, jnp.bfloat16) if mp else state.params
        img = prepared["img"].astype(jnp.bfloat16) if mp else prepared["img"]
        r1, r2 = jax.random.split(rng)

        def apply_only(p, bs, im):
            out, _ = model.apply({"params": p, "batch_stats": bs}, im,
                                 mutable=["batch_stats"],
                                 rngs={"jitter": r1, "partdrop": r2})
            return sum(jnp.sum(v.astype(jnp.float32)) for v in
                       (out["para"], out["iuv_raw"]["u"], out["part_iuv_clean"]))

        f = jax.jit(apply_only)
        dt = _timed(lambda: f(fwd_params, state.batch_stats, img),
                    lambda o: float(o), args.iters)
        _emit("apply_train_mode", args.mode, B, dt)

        loss_core = make_loss_fn(model, smpl, cfg)
        g = jax.jit(lambda p, bs, b: loss_core(p, bs, b, r1, r2)[0])
        dt = _timed(lambda: g(state.params, state.batch_stats, prepared),
                    lambda o: float(o), args.iters)
        _emit("forward_loss", args.mode, B, dt)

        # eval-mode forward at the same batch for the train/serve fwd gap
        emodel = DaNet(cfg.danet, train=False)
        h = jax.jit(lambda p, bs, im: jnp.sum(
            emodel.apply({"params": p, "batch_stats": bs}, im)["para"].astype(jnp.float32)))
        dt = _timed(lambda: h(fwd_params, state.batch_stats, img),
                    lambda o: float(o), args.iters)
        _emit("apply_eval_mode", args.mode, B, dt)

    elif args.phase == "losssplit":
        # attribute the loss-side cost (fwdsplit showed forward_loss -
        # apply_train_mode = ~133 ms at bf16 B=64): each loss block timed as
        # its own jitted graph on the REAL model outputs (captured once)
        prepared = jtu.tree_map(jnp.asarray, synthetic_batch(cfg, B, num_verts=6890))
        from danet_densepose2smpl_tpu.models import losses as L
        from danet_densepose2smpl_tpu.ops.iuvmap import iuv_img2map
        from danet_densepose2smpl_tpu.smpl import smpl_forward
        from danet_densepose2smpl_tpu.train.objective import (
            compute_losses,
            part_iuv_gt_crops,
        )

        r1, r2 = jax.random.split(rng)
        mp = cfg.danet.compute_dtype == "bfloat16"
        if mp:
            from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree
            fwd_params = cast_float_tree(state.params, jnp.bfloat16)
            img = prepared["img"].astype(jnp.bfloat16)
        else:
            fwd_params, img = state.params, prepared["img"]
        out, _ = jax.jit(lambda p, bs, im: model.apply(
            {"params": p, "batch_stats": bs}, im, mutable=["batch_stats"],
            rngs={"jitter": r1, "partdrop": r2}))(fwd_params, state.batch_stats, img)
        out = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
        out = jax.block_until_ready(out)
        raw = out["iuv_raw"]
        fetch = lambda o: float(o)

        full = jax.jit(lambda o, b: compute_losses(
            cfg.danet, smpl, o, b,
            openpose_weight=cfg.train.openpose_train_weight,
            gt_weight=cfg.train.gt_train_weight)[0])
        dt = _timed(lambda: full(out, prepared), fetch, args.iters)
        _emit("losses_all", args.mode, B, dt)

        def body_uv(o, b):
            u_g, v_g, i_g, a_g = iuv_img2map(b["uv_image_gt"])
            r = o["iuv_raw"]
            lu, lv, li, la = L.body_uv_losses(
                r["u"], r["v"], r["index"], r["ann"],
                u_g, v_g, i_g, a_g, b["has_iuv"], cfg.danet)
            return lu + lv + li + la
        dt = _timed(lambda: jax.jit(body_uv)(out, prepared), fetch, args.iters)
        _emit("loss_body_uv", args.mode, B, dt)

        def gt_crops(o, b):
            u_g, v_g, i_g, _ = iuv_img2map(b["uv_image_gt"])
            return jnp.sum(part_iuv_gt_crops(u_g, v_g, i_g, o["iuv_raw"]["stn_theta"]))
        dt = _timed(lambda: jax.jit(gt_crops)(out, prepared), fetch, args.iters)
        _emit("loss_part_gt_crops", args.mode, B, dt)

        u_g, v_g, i_g, _ = jax.jit(lambda b: iuv_img2map(b["uv_image_gt"]))(prepared)
        part_gt = jax.block_until_ready(
            jax.jit(lambda u, v, i, t: part_iuv_gt_crops(u, v, i, t))(
                u_g, v_g, i_g, raw["stn_theta"]))

        def partial_uv(o, pg, b):
            lu, lv, li = L.partial_uv_losses(
                o["iuv_raw"]["part_iuv"], pg, b["has_iuv"], cfg.danet)
            return lu + lv + li
        dt = _timed(lambda: jax.jit(partial_uv)(out, part_gt, prepared), fetch, args.iters)
        _emit("loss_partial_uv", args.mode, B, dt)

        if "dp_dict" in prepared:
            def dp(o, b):
                r = o["iuv_raw"]
                a, bb, cc, dd = L.dp_uvia_losses(
                    r["u"], r["v"], r["index"], r["ann"],
                    b["dp_dict"], b["has_dp"], cfg.danet)
                return a + bb + cc + dd
            dt = _timed(lambda: jax.jit(dp)(out, prepared), fetch, args.iters)
            _emit("loss_dp", args.mode, B, dt)

        def smpl_side(o, b):
            s_out = smpl_forward(smpl, o["pred_shape"], o["pred_rotmat"])
            kp2d = L.reproject(s_out.joints, o["pred_cam"], float(cfg.danet.img_size))
            l = L.keypoint_2d_loss(kp2d, b["keypoints"], 0.0, 1.0)
            l += L.keypoint_3d_loss(s_out.joints, b["pose_3d"], b["has_pose_3d"])
            gt_joints = smpl_forward(smpl, b["opt_betas"], b["opt_rotmat"]).smpl_joints
            return l + jnp.sum(gt_joints * 0) + jnp.sum(s_out.vertices * 0)
        dt = _timed(lambda: jax.jit(smpl_side)(out, prepared), fetch, args.iters)
        _emit("loss_smpl_side", args.mode, B, dt)

        if "heatmaps" in raw:
            def stnhm(o, b):
                return L.stn_heatmap_loss(
                    o["iuv_raw"]["heatmaps"], b["target_smpl_kps"], cfg.danet)
            dt = _timed(lambda: jax.jit(stnhm)(out, prepared), fetch, args.iters)
            _emit("loss_stn_heatmap", args.mode, B, dt)

    elif args.phase == "parts":
        prepared = jtu.tree_map(jnp.asarray, synthetic_batch(cfg, B, num_verts=6890))
        loss_core = make_loss_fn(model, smpl, cfg)
        r1, r2 = jax.random.split(rng)

        fwd = jax.jit(lambda p, bs, b: loss_core(p, bs, b, r1, r2)[0])
        dt = _timed(lambda: fwd(state.params, state.batch_stats, prepared),
                    lambda o: float(o), args.iters)
        _emit("forward_loss", args.mode, B, dt)

        def _fwdbwd(p, bs, b):
            (total, _), grads = jax.value_and_grad(
                lambda q: loss_core(q, bs, b, r1, r2), has_aux=True)(p)
            return total + optax.global_norm(grads), grads

        fwdbwd = jax.jit(_fwdbwd)
        dt = _timed(lambda: fwdbwd(state.params, state.batch_stats, prepared),
                    lambda o: float(o[0]), args.iters)
        _emit("forward_backward", args.mode, B, dt)
        _, grads = fwdbwd(state.params, state.batch_stats, prepared)

        opt = make_optimizer(cfg)

        def _adam(g, o, p):
            updates, new_o = opt.update(g, o, p)
            new_p = optax.apply_updates(p, updates)
            return optax.global_norm(new_p), new_o

        adam = jax.jit(_adam)
        dt = _timed(lambda: adam(grads, state.opt_state, state.params),
                    lambda o: float(o[0]), args.iters)
        _emit("adam_update", args.mode, B, dt)


if __name__ == "__main__":
    main()
