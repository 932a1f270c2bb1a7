"""Gradient-correctness: overfitting a tiny fixture must actually reduce the
loss (the cheapest end-to-end check that the whole train step — GT prep,
rasterized supervision, losses, grads, Adam — optimizes what it claims to)."""

import json

import numpy as np
import pytest

from danet_densepose2smpl_tpu.core.config import Config, DaNetConfig, SolverConfig, TrainConfig
from danet_densepose2smpl_tpu.data.dataset import NpzDataset
from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset
from danet_densepose2smpl_tpu.kernels import IUVRenderer
from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
from danet_densepose2smpl_tpu.smpl.densepose_atlas import synthetic_densepose_atlas
from danet_densepose2smpl_tpu.train import FitsDict, Trainer


class Resized:
    """Emit cfg-size images (the dataset's crop target is 224-fixed)."""

    def __init__(self, ds, size):
        self.ds = ds
        self.size = size
        self.pose = ds.pose
        self.betas = ds.betas
        self.has_smpl = ds.has_smpl

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i, rng=None):
        import cv2

        item = self.ds.__getitem__(i, rng=rng)
        item["img"] = cv2.resize(item["img"], (self.size, self.size))
        return item


@pytest.mark.slow
def test_overfit_fixture_loss_drops(tmp_path):
    npz, img_dir = write_synthetic_dataset(str(tmp_path), n=8, with_dp=True)
    cfg = Config(
        danet=DaNetConfig(
            iuv_regressor="resnet", msres_num_layers=18, img_size=64, heatmap_size=16,
            # deterministic overfit: no augmentation jitter / partdrop noise
            stn_center_jitter=0.0, stn_scale_jitter=0.0, partdrop_rate=0.0,
        ),
        solver=SolverConfig(base_lr=3e-4),
        train=TrainConfig(batch_size=8, pretr_step=0, summary_steps=1,
                          checkpoint_steps=10_000, vis_interval=10_000),
    )
    ds = Resized(
        NpzDataset(npz, img_dir, name="synth", is_train=True, heatmap_size=16), 64
    )
    smpl = synthetic_smpl_model(num_verts=300, seed=0)
    atlas = synthetic_densepose_atlas(smpl, seed=0)
    renderer = IUVRenderer(atlas, orig_size=64, out_size=16, chunk=256)
    fits = FitsDict.from_datasets({"synth": ds})

    workdir = str(tmp_path / "overfit")
    trainer = Trainer(cfg, ds, smpl, renderer, fits, workdir)
    # 8 samples / batch 8 = 1 step per epoch
    trainer.train(num_epochs=40)

    rows = [json.loads(l) for l in open(f"{workdir}/metrics.jsonl")]
    assert len(rows) == 40
    losses = np.array([r["loss_total"] for r in rows])
    assert np.isfinite(losses).all()
    first = losses[:3].mean()
    last = losses[-3:].mean()
    # bar 0.55: the r2 dtype-pinning + dtype-aware STN coordinate math
    # (commit b6d7d6d) shifted the deterministic 40-step trajectory from
    # just-under-halving to 0.542 (219.5 -> 118.9, measured r3); the loss
    # declines steadily throughout — the property under test
    assert last < 0.55 * first, f"loss did not drop >=45%: {first:.3f} -> {last:.3f}"
    # the dense IUV term must itself improve (the rasterized-GT pathway)
    if "loss_IndexUV" in rows[0]:
        iuv = np.array([r.get("loss_IndexUV", np.nan) for r in rows])
        assert iuv[-3:].mean() < iuv[:3].mean()


@pytest.mark.slow
def test_overfit_bf16_mixed_precision():
    """compute_dtype='bfloat16': the mixed-precision train step (bf16
    forward, fp32 master params/BN stats/losses) must also learn.

    Runs in a subprocess with a clean single-device CPU backend: under the
    conftest's 8-virtual-device flag, CPU bf16 emulation degrades from
    ~0.1 s to >30 s per step (measured), which would blow any test budget.
    The body lives in tests/bf16_overfit_main.py."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(os.path.dirname(__file__), "bf16_overfit_main.py")
    res = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, env=env,
        # 560s passes uncontended but was observed timing out when the suite
        # shares the 1-core host with other jobs; give it real headroom
        timeout=1500, cwd=os.path.dirname(os.path.dirname(script)),
    )
    assert "BF16_OK" in res.stdout, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"
