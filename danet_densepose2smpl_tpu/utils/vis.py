"""Visualization helpers for the demo and training summaries.

Parity targets: the composite demo output of reference `demo.py:100-178`
(input, global IUV, 24-part partial grid, rendered IUV) and the joint
overlay panels of `utils/vis.py`.
"""

from __future__ import annotations

import numpy as np

from danet_densepose2smpl_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD
from danet_densepose2smpl_tpu.ops.structure import SMPL_EDGES


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization -> [0, 1] RGB."""
    return np.clip(np.asarray(img) * IMG_NORM_STD + IMG_NORM_MEAN, 0, 1)


def iuv_to_rgb(iuv_img: np.ndarray) -> np.ndarray:
    """(H, W, 3) IUV image -> displayable RGB: patch index as hue-ish ramp,
    U/V as the other channels (matches the reference's direct imshow of the
    3-channel IUV image)."""
    return np.clip(np.asarray(iuv_img), 0, 1)


def part_grid(part_iuv: np.ndarray, cols: int = 6) -> np.ndarray:
    """(24, S, S, 3) partial IUV stack -> one tiled (4S x 6S, 3) image."""
    parts = np.asarray(part_iuv)
    k, s = parts.shape[0], parts.shape[1]
    rows = int(np.ceil(k / cols))
    canvas = np.zeros((rows * s, cols * s, 3), parts.dtype)
    for i in range(k):
        r, c = divmod(i, cols)
        canvas[r * s : (r + 1) * s, c * s : (c + 1) * s] = parts[i]
    return np.clip(canvas, 0, 1)


def draw_skeleton(img: np.ndarray, joints_px: np.ndarray, color=(0, 1.0, 0)) -> np.ndarray:
    """Overlay the 24-joint SMPL skeleton on an RGB [0,1] image.

    joints_px: (24, 2) pixel coords (x, y)."""
    import cv2

    out = (np.asarray(img) * 255).astype(np.uint8).copy()
    c = tuple(int(255 * v) for v in color)
    for p, ch in SMPL_EDGES:
        a = tuple(np.round(joints_px[p]).astype(int))
        b = tuple(np.round(joints_px[ch]).astype(int))
        cv2.line(out, a, b, c, 1)
    for j in joints_px:
        cv2.circle(out, tuple(np.round(j).astype(int)), 2, c, -1)
    return out.astype(np.float32) / 255.0


def draw_points(img: np.ndarray, pts_px: np.ndarray, color=(1.0, 0.2, 0.2), radius: int = 3) -> np.ndarray:
    """Overlay point markers (e.g. STN crop centers, reference
    trainer.py:269-275) on an RGB [0,1] image. pts_px: (N, 2) (x, y)."""
    import cv2

    out = (np.asarray(img) * 255).astype(np.uint8).copy()
    c = tuple(int(255 * v) for v in color)
    h, w = out.shape[:2]
    for q in np.asarray(pts_px):
        x, y = int(round(float(q[0]))), int(round(float(q[1])))
        if 0 <= x < w and 0 <= y < h:
            cv2.drawMarker(out, (x, y), c, cv2.MARKER_CROSS, 2 * radius, 1)
    return out.astype(np.float32) / 255.0


def heatmap_grid(heatmaps: np.ndarray, cols: int = 6) -> np.ndarray:
    """(S, S, 24) joint heatmaps -> one tiled grayscale-as-RGB grid image
    (the reference's TensorBoard heatmap panels, trainer.py:276-282)."""
    hm = np.moveaxis(np.asarray(heatmaps), -1, 0)  # (24, S, S)
    k, s = hm.shape[0], hm.shape[1]
    rows = int(np.ceil(k / cols))
    canvas = np.zeros((rows * s, cols * s), np.float32)
    for i in range(k):
        r, c = divmod(i, cols)
        tile = hm[i]
        rng = tile.max() - tile.min()
        canvas[r * s : (r + 1) * s, c * s : (c + 1) * s] = (
            (tile - tile.min()) / rng if rng > 1e-9 else 0.0
        )
    return np.repeat(canvas[..., None], 3, axis=-1)


def partial_iuv_images(part_iuv: np.ndarray) -> np.ndarray:
    """(24, S, S, 3, 7) cleaned partial IUV stacks -> (24, S, S, 3)
    displayable per-part IUV images, remapping each part's 7 local channels
    to global patch ids (the demo's part-grid conversion, reference
    demo.py:125-150)."""
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.ops.iuvmap import iuv_map2img
    from danet_densepose2smpl_tpu.ops.structure import DP2SMPL_MAPPING

    pi = np.asarray(part_iuv)
    imgs = []
    for k in range(pi.shape[0]):
        mapping = [0] + list(DP2SMPL_MAPPING[k])
        img_k = iuv_map2img(
            jnp.asarray(pi[k, None, ..., 0, :]), jnp.asarray(pi[k, None, ..., 1, :]),
            jnp.asarray(pi[k, None, ..., 2, :]), ind_mapping=mapping,
        )
        imgs.append(np.asarray(img_k[0]))
    return np.stack(imgs)


def demo_composite(
    image: np.ndarray,
    iuv_pred_img: np.ndarray,
    part_iuv_imgs: np.ndarray | None,
    rendered_iuv: np.ndarray | None,
    out_path: str,
    shaded_front: np.ndarray | None = None,
    shaded_side: np.ndarray | None = None,
):
    """Assemble and save the demo panel (reference demo.py:125-178)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [("input", denormalize_image(image)), ("predicted IUV", iuv_to_rgb(iuv_pred_img))]
    if rendered_iuv is not None:
        panels.append(("rendered IUV (pred SMPL)", iuv_to_rgb(rendered_iuv)))
    if part_iuv_imgs is not None:
        panels.append(("24 partial IUV", part_grid(part_iuv_imgs)))
    if shaded_front is not None:
        panels.append(("pred mesh", np.repeat(np.asarray(shaded_front)[..., None], 3, -1)))
    if shaded_side is not None:
        panels.append(("pred mesh (side)", np.repeat(np.asarray(shaded_side)[..., None], 3, -1)))

    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, im) in zip(axes, panels):
        ax.imshow(im)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
