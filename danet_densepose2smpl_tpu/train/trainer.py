"""Training loop: two-stage schedule, checkpoint/resume, metric logging.

Parity: reference `train/base_trainer.py` + `train/trainer.py` — epoch loop
with mid-epoch resume, `pretrain_mode = step <= pretr_step` two-stage
schedule (IUV-only pretrain then joint training), periodic checkpointing and
scalar summaries, and a wall-clock budget that checkpoints and exits cleanly
for requeue environments (`--time_to_run`).

TPU-native: the loop body is two compiled programs (pretrain / full) over
the data-parallel mesh; the host only runs the input pipeline and the fits
lookup.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.core.checkpoint import CheckpointManager, MetricLogger, ResumePoint
from danet_densepose2smpl_tpu.core.config import Config
from danet_densepose2smpl_tpu.data.loader import ResumableLoader
from danet_densepose2smpl_tpu.models.danet import DaNet
from danet_densepose2smpl_tpu.parallel import make_mesh, shard_batch
from danet_densepose2smpl_tpu.smpl import SMPLModel
from danet_densepose2smpl_tpu.train.fits_dict import FitsDict
from danet_densepose2smpl_tpu.train.step import TrainState, create_train_state, make_train_step


class Trainer:
    def __init__(
        self,
        cfg: Config,
        dataset,                      # MixedDataset or NpzDataset
        smpl: SMPLModel,
        renderer,                     # IUVRenderer or None
        fits: FitsDict,
        workdir: str,
        mesh=None,
        time_to_run: float | None = None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.smpl = smpl
        self.renderer = renderer
        self.fits = fits
        self.workdir = workdir
        self.mesh = mesh
        self.time_to_run = time_to_run
        self.start_time = time.time()

        self.loader = ResumableLoader(dataset, cfg.train.batch_size, seed=cfg.train.seed)
        if cfg.train.prefetch_workers != 0:
            from danet_densepose2smpl_tpu.data.loader import PrefetchLoader

            workers = None if cfg.train.prefetch_workers < 0 else cfg.train.prefetch_workers
            self.loader = PrefetchLoader(self.loader, workers=workers)
        self.model = DaNet(cfg.danet, train=True)
        is_itw = cfg.train.train_data == "h36m_coco_itw"

        self.state = create_train_state(
            self.model, cfg, jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros((1, cfg.danet.img_size, cfg.danet.img_size, 3)),
        )
        common = dict(mesh=mesh, renderer=renderer, is_itw=is_itw)
        self.step_pretrain = make_train_step(self.model, smpl, cfg, pretrain_mode=True, **common)
        self.step_full = make_train_step(self.model, smpl, cfg, pretrain_mode=False, **common)

        self.ckpt = CheckpointManager(f"{workdir}/checkpoints")
        self.logger = MetricLogger(f"{workdir}/metrics.jsonl")
        self.resume = ResumePoint(0, 0, 0)

        restored = self.ckpt.restore(self.state)
        if restored is not None:
            self.state, self.resume = restored
            print(f"resumed from step {self.resume.step} (epoch {self.resume.epoch}, batch {self.resume.batch_idx})")

    def _out_of_time(self) -> bool:
        return self.time_to_run is not None and (time.time() - self.start_time) > self.time_to_run

    def _device_batch(self, batch: dict) -> dict:
        names = batch.pop("dataset_name", ["" for _ in range(len(batch["sample_index"]))])
        if isinstance(names, str):
            names = [names]
        batch.pop("imgname", None)
        batch.pop("maskname", None)
        batch.pop("partname", None)

        opt_pose, opt_betas, opt_valid = self.fits.lookup(
            names, batch["sample_index"], batch["rot_angle"], batch["is_flipped"]
        )
        batch["opt_pose"] = opt_pose
        batch["opt_betas"] = opt_betas
        batch["opt_valid"] = opt_valid
        batch["is_dp_dataset"] = np.array([n == "dp_coco" for n in names], np.float32)

        batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def train(self, num_epochs: int | None = None) -> TrainState:
        cfg = self.cfg
        epochs = num_epochs if num_epochs is not None else cfg.train.num_epochs
        rng = jax.random.PRNGKey(cfg.train.seed + 1)
        step_count = self.resume.step
        start_epoch, start_batch = self.resume.epoch, self.resume.batch_idx

        # steps dispatch asynchronously; wall time is measured per summary
        # window (block only there) so timing never serializes the pipeline
        window_start = time.time()
        window_steps = 0
        for epoch in range(start_epoch, epochs):
            for b_idx, batch in self.loader.epoch(epoch, start_batch if epoch == start_epoch else 0):
                pretrain = step_count < cfg.train.pretr_step
                step_fn = self.step_pretrain if pretrain else self.step_full
                batch = self._device_batch(batch)
                self.state, metrics = step_fn(self.state, batch, rng)
                step_count += 1
                window_steps += 1

                if step_count % cfg.train.summary_steps == 0:
                    # Forced scalar D2H fetch BEFORE reading the clock: on the
                    # tunneled TPU platform `block_until_ready` does not
                    # actually wait (bench.py timing note), so the fetch is
                    # what guarantees every queued step in this window has
                    # executed. Fetching after computing dt would charge the
                    # drained compute to no window and overstate imgs_per_sec.
                    loss_val = float(metrics["loss_total"])
                    dt = (time.time() - window_start) / max(window_steps, 1)
                    metrics = dict(metrics)
                    metrics["step_time_s"] = dt
                    metrics["imgs_per_sec"] = cfg.train.batch_size / max(dt, 1e-9)
                    self.logger.log(step_count, metrics)
                    print(f"e{epoch} b{b_idx} step {step_count} "
                          f"loss {loss_val:.3f} ({dt * 1e3:.0f} ms/step)"
                          + (" [pretrain]" if pretrain else ""))
                    window_start = time.time()
                    window_steps = 0

                if step_count % cfg.train.checkpoint_steps == 0:
                    self.ckpt.save(self.state, ResumePoint(epoch, b_idx + 1, step_count))

                if cfg.train.vis_interval and step_count % cfg.train.vis_interval == 0:
                    try:
                        self._save_vis(batch, step_count)
                    except Exception as e:  # vis must never kill training
                        print(f"vis failed at step {step_count}: {e}")

                if self._out_of_time():
                    print("time budget exceeded; checkpointing and exiting")
                    self.ckpt.save(self.state, ResumePoint(epoch, b_idx + 1, step_count), wait=True)
                    return self.state

        self.ckpt.save(self.state, ResumePoint(epochs, 0, step_count), wait=True)
        return self.state

    def _save_vis(self, device_batch: dict, step_count: int) -> None:
        """Periodic training visualization at reference parity (the
        TensorBoard image summaries of reference trainer.py:250-305):
        per-sample rows — input with GT keypoints + STN crop centers, pred
        IUV, GT IUV, pred-SMPL rendered IUV, shaded pred-mesh overlay — plus
        a sample-0 sheet with the 24-part partial-IUV grid and the 24 joint
        heatmaps. Written as PNGs under <workdir>/vis/."""
        import os

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from danet_densepose2smpl_tpu.models.danet import DaNet
        from danet_densepose2smpl_tpu.ops.iuvmap import iuv_map2img
        from danet_densepose2smpl_tpu.smpl import smpl_forward
        from danet_densepose2smpl_tpu.utils.vis import (
            denormalize_image,
            draw_points,
            draw_skeleton,
            heatmap_grid,
            partial_iuv_images,
        )

        if "img" in device_batch:
            imgs = device_batch["img"][:4]
        else:
            # raw-ingest batches (--device_preprocess): replay the device
            # augmentation for the panel
            from danet_densepose2smpl_tpu.data.pipeline import device_preprocess_train

            imgs = device_preprocess_train(
                device_batch["raw_img"][:4], device_batch["center"][:4],
                device_batch["scale"][:4], device_batch["rot_angle"][:4],
                device_batch["is_flipped"][:4], device_batch["pixel_noise"][:4],
                out_size=self.cfg.danet.img_size,
            )
        eval_model = DaNet(self.cfg.danet, train=False)
        out = eval_model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            imgs,
        )
        u, v, i, a = out["iuv_clean"]
        pred_iuv = np.asarray(iuv_map2img(u, v, i, a))
        n = pred_iuv.shape[0]
        res = float(self.cfg.danet.img_size)

        # input overlays: GT SMPL 2D keypoints (skeleton) + STN crop centers
        est = out.get("iuv_raw", {})
        centers = np.asarray(est["stn_centers"]) if "stn_centers" in est else None
        gt_kps = (
            np.asarray(device_batch["smpl_2dkps"][:n])
            if "smpl_2dkps" in device_batch
            else (np.asarray(device_batch["target_smpl_kps"][:n])
                  if "target_smpl_kps" in device_batch else None)
        )
        inputs = []
        for k in range(n):
            panel = denormalize_image(np.asarray(imgs[k]))
            if gt_kps is not None:
                panel = draw_skeleton(panel, 0.5 * res * (gt_kps[k, :, :2] + 1.0))
            if centers is not None:
                panel = draw_points(panel, 0.5 * res * (centers[k] + 1.0))
            inputs.append(panel)

        # pred-SMPL renders (rendered IUV + shaded overlay), reference
        # trainer.py:284-305 renders the predicted mesh each vis step
        rendered = shaded = None
        if self.renderer is not None and "pred_cam" in out:
            try:
                from danet_densepose2smpl_tpu.kernels.rasterizer import render_shaded

                smpl_out = smpl_forward(self.smpl, out["pred_shape"], out["pred_rotmat"])
                rendered = np.asarray(self.renderer(smpl_out.vertices, out["pred_cam"]))
                sh = np.asarray(render_shaded(
                    smpl_out.vertices, jnp.asarray(self.smpl.faces), out["pred_cam"],
                    out_size=int(res),
                ))
                shaded = [
                    np.where(sh[k][..., None] > 0,
                             0.35 * denormalize_image(np.asarray(imgs[k]))
                             + 0.65 * sh[k][..., None],
                             denormalize_image(np.asarray(imgs[k])))
                    for k in range(n)
                ]
            except Exception as e:  # renders must never kill the vis pass
                print(f"mesh render vis skipped: {e}")

        row_defs = [("input / GT kps / STN", inputs),
                    ("pred IUV", [np.clip(pred_iuv[k], 0, 1) for k in range(n)])]
        if "uv_image_gt" in device_batch:
            row_defs.append(("GT IUV", [np.clip(np.asarray(device_batch["uv_image_gt"][k]), 0, 1)
                                        for k in range(n)]))
        if rendered is not None:
            row_defs.append(("rendered IUV (pred)", [np.clip(rendered[k], 0, 1) for k in range(n)]))
        if shaded is not None:
            row_defs.append(("pred mesh overlay", shaded))

        rows = len(row_defs)
        fig, axes = plt.subplots(rows, n, figsize=(3 * n, 3 * rows), squeeze=False)
        for r, (title, row_imgs) in enumerate(row_defs):
            for k in range(n):
                axes[r][k].imshow(row_imgs[k])
                axes[r][k].axis("off")
            axes[r][0].set_title(title)
        vis_dir = os.path.join(self.workdir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        fig.tight_layout()
        fig.savefig(os.path.join(vis_dir, f"step_{step_count:07d}.png"), dpi=90)
        plt.close(fig)

        # sample-0 sheet: 24-part partial IUV grid + joint heatmap grid
        # (reference trainer.py:269-283 part crops + heatmap panels)
        sheets = []
        if "part_iuv_clean" in out:
            sheets.append(("24-part partial IUV (pred)",
                           partial_iuv_images(np.asarray(out["part_iuv_clean"][0]))))
        if "heatmaps" in est:
            sheets.append(("24 joint heatmaps",
                           heatmap_grid(np.asarray(est["heatmaps"][0]))))
        if sheets:
            from danet_densepose2smpl_tpu.utils.vis import part_grid

            fig, axes = plt.subplots(1, len(sheets), figsize=(6 * len(sheets), 5),
                                     squeeze=False)
            for k, (title, sheet) in enumerate(sheets):
                img = part_grid(sheet) if sheet.ndim == 4 else sheet
                axes[0][k].imshow(np.clip(img, 0, 1))
                axes[0][k].set_title(title)
                axes[0][k].axis("off")
            fig.tight_layout()
            fig.savefig(os.path.join(vis_dir, f"step_{step_count:07d}_parts.png"), dpi=90)
            plt.close(fig)
