"""CLI checkpoint-port proof (r2 VERDICT item #2).

Saves the reference-topology torch twin's state_dict as a genuine `.pt`
file, runs `cli/eval.py --torch_checkpoint` on a fixture dataset, and
asserts the CLI's per-sample MPJPE equals the torch twin's own eval through
the identical harness. This covers the plumbing `tests/test_port_e2e.py`
stops short of — `cli/common.build_model_and_params` ->
`port.danet_map.load_danet_checkpoint` (torch.load, 'module.' stripping,
LSTM bias fusing, strict report) — the closest possible stand-in for the
released checkpoints this container can't fetch (reference eval.py:322-335,
README.md:94-107).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from danet_densepose2smpl_tpu.models.iuv_estimator import LEARNED_OFFSET, LEARNED_RATIO
from danet_densepose2smpl_tpu.models.smpl_regressor import default_mean_params

from torch_twin import TorchDaNet, randomize_twin


@pytest.mark.slow
def test_cli_eval_torch_checkpoint(tmp_path):
    from danet_densepose2smpl_tpu.cli import eval as cli_eval
    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import ResumableLoader
    from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset
    from danet_densepose2smpl_tpu.eval import run_pose_eval
    from danet_densepose2smpl_tpu.eval.harness import synthetic_h36m_regressor
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model

    mp = default_mean_params()
    twin = TorchDaNet("resnet", mp, LEARNED_RATIO, LEARNED_OFFSET, msres_num_layers=18)
    randomize_twin(twin, seed=3)
    twin.eval()
    pt = str(tmp_path / "twin.pt")
    torch.save({"model": twin.state_dict()}, pt)

    npz, img_dir = write_synthetic_dataset(str(tmp_path), n=4)
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write("DANET:\n  IUV_REGRESSOR: resnet\n  MSRES_NUM_LAYERS: 18\n")
    result = str(tmp_path / "res.npz")
    cli_eval.main([
        "--dataset", "h36m-p2", "--npz", npz, "--img_dir", img_dir,
        "--cfg", cfg_yaml, "--torch_checkpoint", pt,
        "--synthetic-assets", "--num_verts", "300",
        "--batch_size", "2", "--result_file", result, "--log_freq", "0",
    ])
    cli_res = np.load(result)

    # the torch twin's own eval, through the identical harness/assets
    smpl = synthetic_smpl_model(num_verts=300, seed=0)
    jreg = synthetic_h36m_regressor(300, seed=0)
    ds = NpzDataset(npz, img_dir, name="h36m-p2", is_train=False, heatmap_size=56)
    loader = ResumableLoader(ds, 2, shuffle=False, drop_last=False)

    def _torch_host(img):
        with torch.no_grad():
            xt = torch.from_numpy(np.moveaxis(np.asarray(img), -1, 1).copy())
            return twin.infer_net(xt).numpy().astype(np.float32)

    def torch_infer(img):
        # run_pose_eval jits its step; hop to the host for the torch twin
        return jax.pure_callback(
            _torch_host, jax.ShapeDtypeStruct((img.shape[0], 229), jnp.float32), img
        )

    exp = run_pose_eval(torch_infer, loader.epoch(0), "h36m-p2", smpl, jreg, log_every=0)

    assert np.isfinite(cli_res["mpjpe"]).all()
    np.testing.assert_allclose(cli_res["mpjpe"], exp.mpjpe, rtol=5e-3, atol=0.05)
    np.testing.assert_allclose(cli_res["pa_mpjpe"], exp.pa_mpjpe, rtol=5e-3, atol=0.05)
