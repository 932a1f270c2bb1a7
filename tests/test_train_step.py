"""Train-step tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from danet_densepose2smpl_tpu.core.config import Config, DaNetConfig
from danet_densepose2smpl_tpu.data import synthetic_batch
from danet_densepose2smpl_tpu.models.danet import DaNet
from danet_densepose2smpl_tpu.parallel import make_mesh, shard_batch
from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
from danet_densepose2smpl_tpu.train import create_train_state, make_lr_schedule, make_train_step
import dataclasses


def tiny_cfg():
    return Config(
        danet=DaNetConfig(
            iuv_regressor="resnet", msres_num_layers=18,
            img_size=64, heatmap_size=16,
        )
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = DaNet(cfg.danet, train=True)
    smpl = synthetic_smpl_model(num_verts=200, seed=0)
    batch = synthetic_batch(cfg, batch_size=8, num_verts=200, num_dp_points=32, img_size=64)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, jnp.zeros((1, 64, 64, 3)))
    return cfg, model, smpl, batch, state


def test_lr_schedule():
    cfg = Config()
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(29999)) == pytest.approx(1e-4)
    assert float(sched(30001)) == pytest.approx(1e-5)
    assert float(sched(60001)) == pytest.approx(1e-6)


@pytest.mark.slow
def test_single_device_step(setup):
    cfg, model, smpl, batch, state = setup
    step = make_train_step(model, smpl, cfg, donate=False)
    batch_j = jax.tree.map(jnp.asarray, batch)
    state2, metrics = step(state, batch_j, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(delta)) > 0


@pytest.mark.slow
def test_pretrain_mode_step(setup):
    cfg, model, smpl, batch, state = setup
    step = make_train_step(model, smpl, cfg, pretrain_mode=True, donate=False)
    batch_j = jax.tree.map(jnp.asarray, batch)
    _, metrics = step(state, batch_j, jax.random.PRNGKey(1))
    assert "loss_U" in metrics and "smpl_pose" not in metrics
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["iuv_gt", "iuv_gt_feat"])
def test_train_step_gt_input_modes(mode, setup):
    """The GT-driven ablation modes must be trainable through the REAL
    jitted step: step_fn passes uv_image_gt / target_smpl_kps into the
    forward (reference danet.py:67-77,249-262). Regression guard for the
    r3 review finding that the iuv_gt_feat training path was unreachable
    from the trainer."""
    _, _, smpl, batch, _ = setup
    cfg = Config(
        danet=DaNetConfig(
            iuv_regressor="resnet", msres_num_layers=18,
            img_size=64, heatmap_size=16, input_mode=mode,
        )
    )
    model = DaNet(cfg.danet, train=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    step = make_train_step(model, smpl, cfg, donate=False)
    state2, metrics = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
def test_train_step_device_ingest(setup):
    """Raw-frame batches: crop+rot+flip+noise+normalize fuse into the jitted
    train step (cli/train.py --device_preprocess; the training half of the
    BASELINE ingest north star)."""
    cfg, model, smpl, batch, state = setup
    rng = np.random.RandomState(7)
    b = 8
    raw = dict(batch)
    del raw["img"]
    raw["raw_img"] = (rng.rand(b, 96, 96, 3) * 255).astype(np.uint8)
    raw["center"] = np.tile([48.0, 48.0], (b, 1)).astype(np.float32)
    raw["scale"] = np.full((b,), 0.4, np.float32)  # 80px box
    raw["rot_angle"] = rng.uniform(-30, 30, b).astype(np.float32)
    raw["is_flipped"] = (rng.rand(b) > 0.5).astype(np.float32)
    raw["pixel_noise"] = rng.uniform(0.8, 1.2, (b, 3)).astype(np.float32)

    step = make_train_step(model, smpl, cfg, donate=False)
    state2, metrics = step(state, jax.tree.map(jnp.asarray, raw), jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
def test_multi_device_step_matches_single(setup):
    cfg, model, smpl, batch, state = setup
    assert jax.device_count() == 8, "conftest must set 8 virtual CPU devices"
    mesh = make_mesh()
    step_m = make_train_step(model, smpl, cfg, mesh=mesh, donate=False)
    sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
    state_m, metrics_m = step_m(state, sharded, jax.random.PRNGKey(1))

    step_s = make_train_step(model, smpl, cfg, donate=False)
    _, metrics_s = step_s(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))

    # data-parallel step must equal the single-device step bitwise-ish
    np.testing.assert_allclose(
        float(metrics_m["loss_total"]), float(metrics_s["loss_total"]), rtol=2e-4
    )


@pytest.mark.slow
def test_masked_out_batch_is_finite(setup):
    """All validity masks zero -> losses are zeros, grads finite (the NaN
    trap of fixed-shape masked batches)."""
    cfg, model, smpl, batch, state = setup
    batch = dict(batch)
    for k in ("has_iuv", "has_dp", "has_pose_3d", "valid_fit"):
        batch[k] = np.zeros_like(batch[k])
    step = make_train_step(model, smpl, cfg, donate=False)
    state2, metrics = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    gmax = max(jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).max()), state2.params)))
    assert np.isfinite(gmax)


@pytest.mark.slow
def test_cast_float_tree_bf16(setup):
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree

    cfg, model, smpl, batch, state = setup
    vb = cast_float_tree({"params": state.params}, jnp.bfloat16)
    leaves = jax.tree.leaves(vb["params"])
    assert all(l.dtype in (jnp.bfloat16, jnp.int32) for l in leaves)
    # bf16 forward runs and stays close to fp32
    img = jnp.asarray(batch["img"][:2])
    emodel = type(model)(cfg.danet, train=False)
    ev = {"params": state.params, "batch_stats": state.batch_stats}
    p32 = emodel.apply(ev, img)["para"]
    evb = cast_float_tree(ev, jnp.bfloat16)
    pb = emodel.apply(evb, img.astype(jnp.bfloat16))["para"].astype(jnp.float32)
    assert float(jnp.abs(p32 - pb).max()) < 0.05
