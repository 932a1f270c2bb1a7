"""Numeric golden tests: each torch->flax layout conversion must make the
flax layer reproduce the torch layer's output exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as fnn
import torch
import torch.nn as tnn

from danet_densepose2smpl_tpu.models.smpl_regressor import PartwiseDense
from danet_densepose2smpl_tpu.nn.gcn import GraphConv
from danet_densepose2smpl_tpu.port import (
    apply_rules,
    bn_rules,
    convert_conv,
    convert_deconv,
    convert_grouped_head,
    convert_grouped_head_bias,
    convert_linear,
)


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def from_t(x):
    return x.detach().numpy()


def test_conv_conversion(rng):
    t = tnn.Conv2d(5, 7, 3, padding=1, bias=True)
    x = rng.rand(2, 5, 9, 9).astype(np.float32)
    exp = np.moveaxis(from_t(t(torch.from_numpy(x))), 1, -1)

    f = fnn.Conv(7, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)
    v = f.init(jax.random.PRNGKey(0), to_nhwc(x))
    v = {"params": {"kernel": jnp.asarray(convert_conv(from_t(t.weight))), "bias": jnp.asarray(from_t(t.bias))}}
    got = np.asarray(f.apply(v, to_nhwc(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_strided_conv_conversion(rng):
    t = tnn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False)
    x = rng.rand(1, 4, 8, 8).astype(np.float32)
    exp = np.moveaxis(from_t(t(torch.from_numpy(x))), 1, -1)
    f = fnn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False)
    v = {"params": {"kernel": jnp.asarray(convert_conv(from_t(t.weight)))}}
    got = np.asarray(f.apply(v, to_nhwc(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_grouped_conv_conversion(rng):
    g = 4
    t = tnn.Conv2d(8 * g, 6 * g, 3, padding=1, groups=g, bias=False)
    x = rng.rand(2, 8 * g, 6, 6).astype(np.float32)
    exp = np.moveaxis(from_t(t(torch.from_numpy(x))), 1, -1)
    f = fnn.Conv(6 * g, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=g, use_bias=False)
    v = {"params": {"kernel": jnp.asarray(convert_conv(from_t(t.weight)))}}
    got = np.asarray(f.apply(v, to_nhwc(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_deconv_conversion(rng):
    t = tnn.ConvTranspose2d(5, 6, 4, stride=2, padding=1, bias=False)
    x = rng.rand(1, 5, 7, 7).astype(np.float32)
    exp = np.moveaxis(from_t(t(torch.from_numpy(x))), 1, -1)
    f = fnn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    v = {"params": {"kernel": jnp.asarray(convert_deconv(from_t(t.weight)))}}
    got = np.asarray(f.apply(v, to_nhwc(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_linear_conversion(rng):
    t = tnn.Linear(6, 4)
    x = rng.rand(3, 6).astype(np.float32)
    exp = from_t(t(torch.from_numpy(x)))
    f = fnn.Dense(4)
    v = {"params": {"kernel": jnp.asarray(convert_linear(from_t(t.weight))), "bias": jnp.asarray(from_t(t.bias))}}
    got = np.asarray(f.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_bn_conversion_via_rules(rng):
    t = tnn.BatchNorm2d(5)
    t.eval()
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(rng.rand(5).astype(np.float32) + 0.5))
        t.bias.copy_(torch.from_numpy(rng.rand(5).astype(np.float32)))
        t.running_mean.copy_(torch.from_numpy(rng.rand(5).astype(np.float32)))
        t.running_var.copy_(torch.from_numpy(rng.rand(5).astype(np.float32) + 0.5))
    x = rng.rand(2, 5, 4, 4).astype(np.float32)
    exp = np.moveaxis(from_t(t(torch.from_numpy(x))), 1, -1)

    f = fnn.BatchNorm(use_running_average=True)
    variables = f.init(jax.random.PRNGKey(0), to_nhwc(x))
    sd = {f"bn.{k}": v for k, v in t.state_dict().items()}
    new_vars, report = apply_rules(sd, variables, bn_rules("bn", ("BatchNorm_0",)[:0]), strict=False)
    # bn at tree root: path ()
    new_vars, report = apply_rules(sd, variables, bn_rules("bn", ()), strict=True)
    got = np.asarray(f.apply(new_vars, to_nhwc(x)))
    np.testing.assert_allclose(got, exp, atol=1e-5)
    assert not report["unconsumed_torch_keys"]


def test_grouped_head_conversion(rng):
    """torch groups=24 1x1 conv over (B, 24*C, 1, 1) == PartwiseDense."""
    g, cin, cout = 24, 16, 6
    t = tnn.Conv2d(g * cin, g * cout, 1, groups=g, bias=True)
    feats = rng.rand(2, g, cin).astype(np.float32)
    x_t = torch.from_numpy(feats.reshape(2, g * cin, 1, 1))
    exp = from_t(t(x_t)).reshape(2, g, cout)

    f = PartwiseDense(cout, num_parts=g)
    v = {
        "params": {
            "kernel": jnp.asarray(convert_grouped_head(from_t(t.weight), g)),
            "bias": jnp.asarray(convert_grouped_head_bias(from_t(t.bias), g)),
        }
    }
    got = np.asarray(f.apply(v, jnp.asarray(feats)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_graphconv_direct(rng):
    """GraphConv weights carry over unchanged (adj @ x @ W + b)."""
    A = rng.rand(6, 6).astype(np.float32)
    x = rng.rand(2, 6, 5).astype(np.float32)
    W = rng.rand(5, 7).astype(np.float32)
    b = rng.rand(7).astype(np.float32)
    exp = np.einsum("nm,bmf,fo->bno", A, x, W) + b

    g = GraphConv(7)
    v = {"params": {"weight": jnp.asarray(W), "bias": jnp.asarray(b)}}
    got = np.asarray(g.apply(v, jnp.asarray(x), jnp.asarray(A)))
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_apply_rules_shape_mismatch_raises(rng):
    f = fnn.Dense(4)
    v = f.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    sd = {"lin.weight": rng.rand(3, 6).astype(np.float32)}  # wrong out dim
    import pytest

    with pytest.raises(ValueError):
        apply_rules(sd, v, [("lin.weight", ("params", "kernel"), convert_linear)], strict=False)
