import numpy as np
import jax
import jax.numpy as jnp
import pytest

from danet_densepose2smpl_tpu.nn import (
    GCN,
    HMR,
    IUVPredictHead,
    LimbResLayers,
    PoseHighResolutionNet,
    PoseResNet,
    SmplResNet,
)
from danet_densepose2smpl_tpu.nn.iuv_head import PartialIUVHead
from danet_densepose2smpl_tpu.nn.gcn import normalize_undigraph, normalize_digraph_rows


def test_smpl_resnet18():
    m = SmplResNet(resnet_nums=18, num_classes=13)
    x = jnp.zeros((2, 56, 56, 64))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    cls, feat = m.apply(v, x)
    assert cls.shape == (2, 13)
    assert feat.shape == (2, 2, 2, 512)  # 56 -> 28(stem) -> 14 -> 7 -> 4 -> 2


def test_smpl_resnet18_truncate1():
    m = SmplResNet(resnet_nums=18, num_classes=0, truncate=1)
    x = jnp.zeros((2, 56, 56, 64))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    cls, feat = m.apply(v, x)
    assert cls is None
    assert feat.shape == (2, 4, 4, 256)


def test_limb_res_layers():
    m = LimbResLayers(resnet_nums=18, outplanes=128, groups=24)
    x = jnp.zeros((2, 4, 4, 24 * 256))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (2, 24, 128)


def test_iuv_head_channel_plan():
    # 28px: the channel plan under test is size-independent
    m = IUVPredictHead()
    x = jnp.zeros((2, 28, 28, 48))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out["u"].shape == (2, 28, 28, 25)
    assert out["v"].shape == (2, 28, 28, 25)
    assert out["index"].shape == (2, 28, 28, 25)
    assert out["ann"].shape == (2, 28, 28, 15)
    assert out["heatmaps"].shape == (2, 28, 28, 24)


def test_partial_iuv_head_group_independence():
    """Each part's output depends only on its own input block (groups=24)."""
    m = PartialIUVHead()
    x = np.random.RandomState(0).rand(1, 8, 8, 24 * 4).astype(np.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    base = np.asarray(m.apply(v, jnp.asarray(x)))
    assert base.shape == (1, 24, 8, 8, 3, 7)

    x2 = x.copy()
    x2[..., 4:8] += 10.0  # perturb part 1's channels only
    out2 = np.asarray(m.apply(v, jnp.asarray(x2)))
    changed = np.abs(out2 - base).reshape(24, -1).max(axis=1) > 1e-6
    assert changed[1] and not changed[0] and not changed[2:].any()


@pytest.mark.parametrize(
    "nums", [18, pytest.param(50, marks=pytest.mark.slow)]
)
def test_pose_resnet_output_size(nums):
    # 128px: the stride plan (in/4) under test is size- and depth-independent;
    # the bottleneck-50 trace costs ~23s on this container -> slow tier (the
    # production resnet-50 topology is also covered by the port e2e tests)
    m = PoseResNet(resnet_nums=nums)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 256)


@pytest.mark.slow
def test_hrnet_w48_output():
    m = PoseHighResolutionNet()
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (1, 56, 56, 48)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    # HRNet-W48 trunk is ~63.6M params
    assert 55e6 < n_params < 72e6, n_params


def test_gcn_shapes_and_norms():
    A = np.zeros((24, 24), np.float32)
    A[0, 1] = A[1, 0] = 1
    np.fill_diagonal(A, 1)
    An = normalize_undigraph(jnp.asarray(A))
    assert np.isfinite(np.asarray(An)).all()
    row = normalize_digraph_rows(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(row).sum(-1), np.where(A.sum(1) > 0, 1.0, 0.0), atol=1e-6)

    m = GCN(hidden_dim=256, out_dim=128, num_layers=3)
    x = jnp.zeros((2, 24, 128))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, An)
    out = m.apply(v, x, An)
    assert out.shape == (2, 24, 128)


def test_hmr_forward():
    m = HMR()
    x = jnp.zeros((1, 224, 224, 3))
    init_pose = jnp.zeros((1, 144))
    init_shape = jnp.zeros((1, 10))
    init_cam = jnp.asarray([[0.9, 0.0, 0.0]])
    v = m.init({"params": jax.random.PRNGKey(0)}, x, init_pose, init_shape, init_cam)
    rotmats, shape, cam = m.apply(v, x, init_pose, init_shape, init_cam)
    assert rotmats.shape == (1, 24, 3, 3)
    assert shape.shape == (1, 10)
    assert cam.shape == (1, 3)
    eye = np.einsum("bjik,bjlk->bjil", np.asarray(rotmats), np.asarray(rotmats))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


def _tiny_hrnet_pair():
    from danet_densepose2smpl_tpu.nn.hrnet import PoseHighResolutionNet

    tiny_stages = (
        (1, 2, (1, 1), (8, 16)),
        (1, 3, (1, 1, 1), (8, 16, 32)),
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    base = PoseHighResolutionNet(stages=tiny_stages, train=True)
    rem = PoseHighResolutionNet(stages=tiny_stages, train=True, remat_modules=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x)
    return base, rem, variables, x


def test_hrnet_remat_modules_forward_match():
    """remat_scope='modules' shares the exact param tree and forward values
    with the unremat backbone (fast tier; the gradient-equality proof is the
    slow-tier test below — its two value_and_grad traces dominate the fast
    suite's budget, measured 65s on this 1-core container)."""
    base, rem, variables, x = _tiny_hrnet_pair()
    out0 = base.apply(variables, x, mutable=["batch_stats"])[0]
    out1 = rem.apply(variables, x, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


@pytest.mark.slow
def test_hrnet_remat_modules_grads_match():
    """remat_scope='modules' (per-HRModule jax.checkpoint) must be a pure
    memory/schedule change: forward outputs and parameter gradients equal
    the unremat backbone bit-for-bit structure-wise (allclose numerically)."""
    base, rem, variables, x = _tiny_hrnet_pair()

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    v1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(variables["params"])
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=str),
    ):
        assert str(p0) == str(p1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
