"""Single-image inference demo.

Parity: reference `demo.py` — per image: crop -> DaNet inference -> composite
PNG with input, predicted global IUV, 24-part partial IUV grid, and the IUV
render of the predicted SMPL mesh.

Usage:
  python -m danet_densepose2smpl_tpu.cli.demo --img path.jpg [--imglist dir]
      [--checkpoint ckpt_dir] [--synthetic-assets] --out_dir results/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from danet_densepose2smpl_tpu.cli.common import add_common_args, build_model_and_params, load_assets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--img", default=None, help="single input image")
    p.add_argument("--imglist", default=None, help="directory of images")
    p.add_argument("--out_dir", default="demo_results")
    p.add_argument("--use_opendr", action="store_true", help="(compat flag; shaded mesh panel not rendered)")
    args = p.parse_args(argv)
    from danet_densepose2smpl_tpu.cli.common import apply_platform
    apply_platform(args)

    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD, IMG_RES
    from danet_densepose2smpl_tpu.core.config import load_config
    from danet_densepose2smpl_tpu.kernels import IUVRenderer
    from danet_densepose2smpl_tpu.ops.iuvmap import iuv_map2img
    from danet_densepose2smpl_tpu.smpl import smpl_forward
    from danet_densepose2smpl_tpu.utils import vis

    cfg = load_config(args.cfg)
    smpl, atlas, _, _, _, _ = load_assets(args)
    model, variables = build_model_and_params(args, cfg, train=False)
    renderer = IUVRenderer(atlas, orig_size=cfg.danet.img_size, out_size=cfg.danet.heatmap_size)

    paths = [args.img] if args.img else sorted(glob.glob(os.path.join(args.imglist or "examples", "*")))
    paths = [q for q in paths if q and q.lower().endswith((".jpg", ".jpeg", ".png"))]
    if not paths:
        raise SystemExit("no input images (use --img or --imglist)")
    os.makedirs(args.out_dir, exist_ok=True)

    from danet_densepose2smpl_tpu.kernels.rasterizer import render_shaded

    faces = jnp.asarray(smpl.faces)

    @jax.jit
    def infer(variables, img):
        out = model.apply(variables, img)
        u, v, i, a = out["iuv_clean"]
        iuv_img = iuv_map2img(u, v, i, a)
        para = out["para"]
        smpl_out = smpl_forward(smpl, para[:, 3:13], para[:, 13:].reshape(-1, 24, 3, 3))
        rendered = renderer(smpl_out.vertices, para[:, :3])
        shaded = render_shaded(smpl_out.vertices, faces, para[:, :3])
        shaded_side = render_shaded(smpl_out.vertices, faces, para[:, :3], yaw_deg=90.0)
        return iuv_img, out["part_iuv_clean"], rendered, para, shaded, shaded_side

    import cv2

    for path in paths:
        img = cv2.imread(path)[:, :, ::-1].astype(np.float32)
        h, w = img.shape[:2]
        side = max(h, w)
        img_sq = cv2.copyMakeBorder(img, 0, side - h, 0, side - w, cv2.BORDER_CONSTANT)
        rgb = cv2.resize(img_sq, (IMG_RES, IMG_RES)) / 255.0
        norm = ((rgb - IMG_NORM_MEAN) / IMG_NORM_STD).astype(np.float32)[None]

        iuv_img, part_iuv, rendered, para, shaded, shaded_side = infer(variables, jnp.asarray(norm))

        # per-part IUV images with the global patch-id remapping
        part_imgs = vis.partial_iuv_images(np.asarray(part_iuv[0]))

        out_path = os.path.join(args.out_dir, os.path.splitext(os.path.basename(path))[0] + "_danet.png")
        vis.demo_composite(
            norm[0], np.asarray(iuv_img[0]), part_imgs, np.asarray(rendered[0]), out_path,
            shaded_front=np.asarray(shaded[0]), shaded_side=np.asarray(shaded_side[0]),
        )
        print(f"{path} -> {out_path}  cam={np.round(np.asarray(para[0, :3]), 3)}")


if __name__ == "__main__":
    main()
