"""3D pose / segmentation evaluation.

Parity: reference `eval.py` — datasets h36m-p1/p2, 3dpw, mpi-inf-3dhp
(MPJPE + PA-MPJPE, mm; H36M-P2 per-action table) and lsp (mask/part
accuracy + F1 via the part renderer).

Usage:
  python -m danet_densepose2smpl_tpu.cli.eval --dataset h36m-p2 \
      --npz labels.npz --img_dir images/ [--checkpoint ckpt]
  # fixture smoke run:
  python -m danet_densepose2smpl_tpu.cli.eval --dataset h36m-p2 --synthetic-data
"""

from __future__ import annotations

import argparse

import numpy as np

from danet_densepose2smpl_tpu.cli.common import add_common_args, build_model_and_params, load_assets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--dataset", default="h36m-p2",
                   choices=["h36m-p1", "h36m-p2", "3dpw", "mpi-inf-3dhp", "lsp"])
    p.add_argument("--npz", default=None, help="SPIN-format labels npz")
    p.add_argument("--img_dir", default=None)
    p.add_argument("--synthetic-data", action="store_true", help="run on a generated fixture dataset")
    p.add_argument("--num_samples", type=int, default=32, help="fixture dataset size")
    p.add_argument("--result_file", default=None, help="npz dump of predictions")
    p.add_argument("--log_freq", type=int, default=10)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.core.config import load_config
    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import ResumableLoader
    from danet_densepose2smpl_tpu.eval import run_pose_eval

    cfg = load_config(args.cfg)
    if args.synthetic_data:
        args.synthetic_assets = True
    smpl, atlas, jreg, _, smpl_male, smpl_female = load_assets(args)
    model, variables = build_model_and_params(args, cfg, train=False)

    if args.synthetic_data:
        import tempfile

        from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset

        tmp = tempfile.mkdtemp(prefix="danet_eval_")
        args.npz, args.img_dir = write_synthetic_dataset(
            tmp, n=args.num_samples, gendered=args.dataset == "3dpw"
        )
        print(f"fixture dataset at {tmp}")
    if args.npz is None:
        raise SystemExit("--npz required (or --synthetic-data)")

    ds = NpzDataset(args.npz, args.img_dir, name=args.dataset, is_train=False,
                    heatmap_size=cfg.danet.heatmap_size)
    loader = ResumableLoader(ds, args.batch_size, shuffle=False, drop_last=False)

    if args.regressor == "hmr":
        from danet_densepose2smpl_tpu.models.smpl_regressor import default_mean_params

        mp = default_mean_params()

        def infer_fn(img):
            rotmat, betas, cam = model.apply(
                variables, img,
                jnp.asarray(mp.pose6d)[None], jnp.asarray(mp.shape)[None], jnp.asarray(mp.cam)[None],
            )
            b = img.shape[0]
            return jnp.concatenate([cam, betas, rotmat.reshape(b, 216)], axis=1)
    else:
        if args.bf16:
            import jax.numpy as jnp

            from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree

            variables_c = cast_float_tree(variables, jnp.bfloat16)

            def infer_fn(img):
                return model.apply(variables_c, img.astype(jnp.bfloat16))["para"].astype(jnp.float32)
        else:
            def infer_fn(img):
                return model.apply(variables, img)["para"]

    if args.dataset == "lsp":
        run_lsp_eval(args, cfg, model, infer_fn, smpl, ds, loader)
        return

    result = run_pose_eval(
        infer_fn, loader.epoch(0), args.dataset, smpl, jreg,
        smpl_male=smpl_male, smpl_female=smpl_female,
        imgnames=ds.imgname, log_every=args.log_freq,
    )
    print(result.summary(args.dataset))

    if args.result_file:
        np.savez(args.result_file, mpjpe=result.mpjpe, pa_mpjpe=result.pa_mpjpe)
        print(f"saved {args.result_file}")


def run_lsp_eval(args, cfg, model, infer_fn, smpl, ds, loader):
    """LSP silhouette/part segmentation accuracy + F1
    (reference eval.py:218-266). GT masks come from maskname/partname
    columns; without them, reports against the rendered GT-SMPL masks."""
    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.data.transforms import uncrop
    from danet_densepose2smpl_tpu.eval.metrics import SegmentationScores
    from danet_densepose2smpl_tpu.kernels.part_renderer import PartRenderer
    from danet_densepose2smpl_tpu.smpl import smpl_forward, smpl_forward_aa

    renderer = PartRenderer(smpl, img_size=cfg.danet.img_size)
    mask_scores = SegmentationScores(2)
    part_scores = SegmentationScores(7)

    @jax.jit
    def step(img, gt_pose, gt_betas):
        para = infer_fn(img)
        out = smpl_forward(smpl, para[:, 3:13], para[:, 13:].reshape(-1, 24, 3, 3))
        mask, parts = renderer(out.vertices, para[:, :3])
        gt_out = smpl_forward_aa(smpl, gt_betas, gt_pose)
        gt_mask, gt_parts = renderer(gt_out.vertices, para[:, :3])
        return mask, parts, gt_mask, gt_parts

    for b, batch in loader.epoch(0):
        mask, parts, gt_mask, gt_parts = step(
            jnp.asarray(batch["img"]), jnp.asarray(batch["pose"]), jnp.asarray(batch["betas"])
        )
        for i in range(np.asarray(mask).shape[0]):
            center, scale = batch["center"][i], float(batch["scale"][i])
            orig = batch["orig_shape"][i]
            pm = uncrop(np.asarray(mask[i]).astype(np.uint8), center, scale, tuple(orig)) > 0
            gm = uncrop(np.asarray(gt_mask[i]).astype(np.uint8), center, scale, tuple(orig)) > 0
            pp = uncrop(np.asarray(parts[i]).astype(np.uint8), center, scale, tuple(orig))
            gp = uncrop(np.asarray(gt_parts[i]).astype(np.uint8), center, scale, tuple(orig))
            mask_scores.update(pm.astype(int), gm.astype(int))
            part_scores.update(pp, gp)

    print(f"mask accuracy: {mask_scores.accuracy:.4f}  F1: {mask_scores.f1.mean():.4f}")
    print(f"parts accuracy: {part_scores.accuracy:.4f}  F1(fg): {part_scores.f1[1:].mean():.4f}")


if __name__ == "__main__":
    main()
