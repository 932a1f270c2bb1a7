"""COCO keypoint OKS AP evaluation.

Parity: reference `eval_coco.py` — SMPL joints -> COCO-17 -> perspective
projection -> inverse crop transform -> OKS AP table.

Usage:
  python -m danet_densepose2smpl_tpu.cli.eval_coco --npz coco_labels.npz \
      --img_dir images/ [--checkpoint ckpt]
  python -m danet_densepose2smpl_tpu.cli.eval_coco --synthetic-data
"""

from __future__ import annotations

import argparse

import numpy as np

from danet_densepose2smpl_tpu.cli.common import add_common_args, build_model_and_params, load_assets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--npz", default=None)
    p.add_argument("--img_dir", default=None)
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--num_samples", type=int, default=32)
    p.add_argument("--result_file", default=None)
    p.add_argument("--coco_gt_json", default=None,
                   help="person_keypoints_*.json; when given, AP is scored "
                        "against the full COCO GT (crowds + all persons) "
                        "exactly as pycocotools COCOeval would")
    args = p.parse_args(argv)
    from danet_densepose2smpl_tpu.cli.common import apply_platform
    apply_platform(args)

    from danet_densepose2smpl_tpu.core.config import load_config
    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import ResumableLoader
    from danet_densepose2smpl_tpu.eval.coco_harness import run_coco_eval

    cfg = load_config(args.cfg)
    if args.synthetic_data:
        args.synthetic_assets = True
    smpl, _, _, _, _, _ = load_assets(args)
    model, variables = build_model_and_params(args, cfg, train=False)

    if args.synthetic_data:
        import tempfile

        from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset

        tmp = tempfile.mkdtemp(prefix="danet_coco_")
        args.npz, args.img_dir = write_synthetic_dataset(tmp, n=args.num_samples)
    if args.npz is None:
        raise SystemExit("--npz required (or --synthetic-data)")

    ds = NpzDataset(args.npz, args.img_dir, name="coco", is_train=False,
                    heatmap_size=cfg.danet.heatmap_size)
    loader = ResumableLoader(ds, args.batch_size, shuffle=False, drop_last=False)

    import jax

    def infer_fn(img):
        out = model.apply(variables, img)
        # per-keypoint confidence source: predicted foreground probability
        # (1 - P(background) of the 25-ch part-index softmax)
        fg_prob = 1.0 - jax.nn.softmax(out["iuv_raw"]["index"], axis=-1)[..., 0]
        return out["para"], fg_prob

    ap, preds = run_coco_eval(
        infer_fn, loader.epoch(0), smpl, img_res=cfg.danet.img_size,
        imgnames=ds.imgname, gt_json=args.coco_gt_json, fg_conf=True,
    )

    # markdown table in the reference's _print_name_value layout
    # (eval_coco.py:178-194)
    names = ("AP", "AP50", "AP75", "APm", "APl", "AR", "AR50", "AR75", "ARm", "ARl")
    print("| Arch " + " ".join(f"| {n}" for n in names) + " |")
    print("|---" * (len(names) + 1) + "|")
    print("| " + args.regressor + " " + " ".join(f"| {ap[n]:.3f}" for n in names) + " |")

    if args.result_file:
        np.savez(args.result_file, preds=preds, **ap)
        print(f"saved {args.result_file}")


if __name__ == "__main__":
    main()
