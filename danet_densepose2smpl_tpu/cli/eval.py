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
    p.add_argument("--device_preprocess", action="store_true",
                   help="decode-only host path: raw frames go to the device "
                        "and crop+resize+normalize fuses into the jitted "
                        "eval step (uniform frame sizes required)")
    p.add_argument("--prefetch", type=int, default=0, metavar="N",
                   help="decode batches with N threads ahead of the device "
                        "(PrefetchLoader double-buffering; 0 = synchronous)")
    p.add_argument("--annot_dir", default=None,
                   help="upi-s1h annotation root with the maskname/partname "
                        "GT PNGs for the LSP protocol (reference "
                        "path_config.DATASET_FOLDERS['upi-s1h'])")
    p.add_argument("--vertex_texture", default=None,
                   help="SPIN vertex_texture.npy (per-face render colors)")
    p.add_argument("--cube_parts", default=None,
                   help="SPIN cube_parts.npy (color->part lookup cube)")
    args = p.parse_args(argv)
    from danet_densepose2smpl_tpu.cli.common import apply_platform
    apply_platform(args)

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
        if args.dataset == "lsp":
            args.npz, args.img_dir, args.annot_dir = write_synthetic_dataset(
                tmp, n=args.num_samples, with_lsp_masks=True
            )
        else:
            args.npz, args.img_dir = write_synthetic_dataset(
                tmp, n=args.num_samples, gendered=args.dataset == "3dpw"
            )
        print(f"fixture dataset at {tmp}")
    if args.npz is None:
        raise SystemExit("--npz required (or --synthetic-data)")

    ds = NpzDataset(args.npz, args.img_dir, name=args.dataset, is_train=False,
                    heatmap_size=cfg.danet.heatmap_size,
                    return_raw=args.device_preprocess)
    loader = ResumableLoader(ds, args.batch_size, shuffle=False, drop_last=False)
    if args.prefetch > 0:
        from danet_densepose2smpl_tpu.data.loader import PrefetchLoader

        loader = PrefetchLoader(loader, workers=args.prefetch)

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
        device_preprocess=args.device_preprocess,
    )
    print(result.summary(args.dataset))

    if args.result_file:
        np.savez(args.result_file, mpjpe=result.mpjpe, pa_mpjpe=result.pa_mpjpe)
        print(f"saved {args.result_file}")


def run_lsp_eval(args, cfg, model, infer_fn, smpl, ds, loader):
    """LSP silhouette/part segmentation accuracy + F1
    (reference eval.py:218-266, UP-3D protocol).

    GT comes from the upi-s1h annotation PNGs named by the dataset's
    maskname/partname columns under --annot_dir (reference reads
    `cv2.imread(annot_path/maskname, 0)`; parts use label 255 as ignore).
    Without the archives it falls back — loudly — to scoring against
    rendered GT-SMPL masks, which is a different (easier) metric.
    """
    import os

    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.data.transforms import uncrop
    from danet_densepose2smpl_tpu.kernels.part_renderer import (
        PartRenderer,
        face_parts_from_assets,
    )
    from danet_densepose2smpl_tpu.smpl import smpl_forward, smpl_forward_aa

    face_parts = None
    if getattr(args, "vertex_texture", None) and getattr(args, "cube_parts", None):
        face_parts = face_parts_from_assets(args.vertex_texture, args.cube_parts)
        print("part labels: original cube_parts lookup")
    else:
        print("WARNING: --vertex_texture/--cube_parts not given; using "
              "LBS-argmax part labels (part boundaries differ from the "
              "reference's cube_parts.npy lookup)")
    renderer = PartRenderer(smpl, img_size=cfg.danet.img_size, face_parts=face_parts)

    annot_dir = getattr(args, "annot_dir", None)
    have_gt_masks = (
        annot_dir is not None
        and ds.maskname is not None
        and ds.partname is not None
    )
    if not have_gt_masks:
        print("WARNING: no --annot_dir / maskname+partname columns — falling "
              "back to rendered GT-SMPL masks. This is NOT the reference's "
              "LSP protocol; numbers are not comparable to eval.py.")

    # reference accumulators (eval.py:101-112)
    accuracy = 0.0
    pixel_count = 0
    tp = np.zeros((2, 1))
    fp = np.zeros((2, 1))
    fn = np.zeros((2, 1))
    parts_accuracy = 0.0
    parts_pixel_count = 0
    parts_tp = np.zeros((7, 1))
    parts_fp = np.zeros((7, 1))
    parts_fn = np.zeros((7, 1))

    @jax.jit
    def step(img):
        para = infer_fn(img)
        out = smpl_forward(smpl, para[:, 3:13], para[:, 13:].reshape(-1, 24, 3, 3))
        mask, parts = renderer(out.vertices, para[:, :3])
        return mask, parts

    @jax.jit
    def gt_render_step(img, gt_pose, gt_betas, cam):
        gt_out = smpl_forward_aa(smpl, gt_betas, gt_pose)
        return renderer(gt_out.vertices, cam)

    def load_gray(path):
        import cv2

        img = cv2.imread(path, 0)
        if img is None:
            raise FileNotFoundError(path)
        return img

    for b, batch in loader.epoch(0):
        mask, parts = step(jnp.asarray(batch["img"]))
        if not have_gt_masks:
            para = np.asarray(infer_fn(jnp.asarray(batch["img"])))
            gt_mask_r, gt_parts_r = gt_render_step(
                jnp.asarray(batch["img"]), jnp.asarray(batch["pose"]),
                jnp.asarray(batch["betas"]), jnp.asarray(para[:, :3]),
            )
        for i in range(np.asarray(mask).shape[0]):
            center, scale = batch["center"][i], float(batch["scale"][i])
            orig = tuple(batch["orig_shape"][i])
            pred_mask = uncrop(np.asarray(mask[i]).astype(np.uint8), center, scale, orig) > 0
            pred_parts = uncrop(np.asarray(parts[i]).astype(np.uint8), center, scale, orig)

            if have_gt_masks:
                gt_mask = load_gray(os.path.join(annot_dir, batch["maskname"][i])) > 0
                gt_parts = load_gray(os.path.join(annot_dir, batch["partname"][i]))
            else:
                gt_mask = uncrop(np.asarray(gt_mask_r[i]).astype(np.uint8), center, scale, orig) > 0
                gt_parts = uncrop(np.asarray(gt_parts_r[i]).astype(np.uint8), center, scale, orig)

            # mask eval (reference eval.py:232-243), UP-3D-consistent
            accuracy += (gt_mask == pred_mask).sum()
            pixel_count += np.prod(np.array(gt_mask.shape))
            for c in range(2):
                cgt = gt_mask == c
                cpred = pred_mask == c
                tp[c] += (cgt & cpred).sum()
                fp[c] += (~cgt & cpred).sum()
                fn[c] += (cgt & ~cpred).sum()

            # parts eval with 255-ignore (reference eval.py:252-266)
            gt_parts = gt_parts.copy()
            pred_parts = pred_parts.copy()
            for c in range(7):
                cgt = gt_parts == c
                cpred = pred_parts == c
                cpred[gt_parts == 255] = 0
                parts_tp[c] += (cgt & cpred).sum()
                parts_fp[c] += (~cgt & cpred).sum()
                parts_fn[c] += (cgt & ~cpred).sum()
            gt_parts[gt_parts == 255] = 0
            pred_parts[pred_parts == 255] = 0
            parts_accuracy += (gt_parts == pred_parts).sum()
            parts_pixel_count += np.prod(np.array(gt_parts.shape))

        if args.log_freq and b % args.log_freq == args.log_freq - 1:
            f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
            print(f"batch {b}: accuracy {accuracy / max(pixel_count, 1):.4f}  F1 {f1.mean():.4f}")

    f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
    parts_f1 = 2 * parts_tp / np.maximum(2 * parts_tp + parts_fp + parts_fn, 1)
    print("*** Final Results ***")
    print(f"Accuracy: {accuracy / max(pixel_count, 1):.6f}")
    print(f"F1: {f1.mean():.6f}")
    print(f"Parts Accuracy: {parts_accuracy / max(parts_pixel_count, 1):.6f}")
    print(f"Parts F1 (BG): {parts_f1.mean():.6f}")


if __name__ == "__main__":
    main()
