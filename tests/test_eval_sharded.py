"""Multi-device eval: the sharded eval step must reproduce the single-device
step exactly on the 8-virtual-device CPU mesh (SURVEY §2.3; round-1 verdict
asked for sharded-eval coverage alongside the sharded train step)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from danet_densepose2smpl_tpu.core.config import DaNetConfig
from danet_densepose2smpl_tpu.eval.harness import make_eval_step, synthetic_h36m_regressor
from danet_densepose2smpl_tpu.models.danet import DaNet
from danet_densepose2smpl_tpu.parallel import make_mesh
from danet_densepose2smpl_tpu.parallel.mesh import batch_sharding
from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model


@pytest.mark.slow
def test_sharded_eval_step_matches_single_device(rng):
    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest forces an 8-device CPU mesh"
    mesh = make_mesh(jax.devices())

    cfg = DaNetConfig(iuv_regressor="resnet", msres_num_layers=18,
                      img_size=64, heatmap_size=16)
    model = DaNet(cfg, train=False)
    b = n_dev
    images = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images[:1])

    def infer_fn(img):
        return model.apply(variables, img)["para"]

    smpl = synthetic_smpl_model(num_verts=300, seed=0)
    jreg = synthetic_h36m_regressor(300, seed=1)
    mapper = np.arange(14)

    gt_pose = jnp.asarray(rng.randn(b, 72).astype(np.float32) * 0.2)
    gt_betas = jnp.asarray(rng.randn(b, 10).astype(np.float32) * 0.3)
    gender = jnp.zeros(b, jnp.int32)
    pose_3d = jnp.asarray(
        np.concatenate([rng.randn(b, 24, 3) * 0.3, np.ones((b, 24, 1))], -1).astype(np.float32)
    )

    single = make_eval_step(infer_fn, smpl, jreg, mapper, mapper, use_gt_verts=False)
    (m1, p1), para1 = single(images, gt_pose, gt_betas, gender, pose_3d)

    sharded = make_eval_step(infer_fn, smpl, jreg, mapper, mapper,
                             use_gt_verts=False, mesh=mesh)
    bs = batch_sharding(mesh)
    args = [jax.device_put(a, bs) for a in (images, gt_pose, gt_betas, gender, pose_3d)]
    (m2, p2), para2 = sharded(*args)

    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(para2), np.asarray(para1), atol=1e-6)
    # outputs really are sharded over the mesh
    assert len(para2.sharding.device_set) == n_dev
