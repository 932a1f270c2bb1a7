"""Architecture + conversion validation: torch residual blocks built with
the reference's exact topology (res_module.py) must reproduce through the
flax blocks after rule-based weight conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from danet_densepose2smpl_tpu.nn.layers import BasicBlock, Bottleneck, ResLayer
from danet_densepose2smpl_tpu.port import apply_rules
from danet_densepose2smpl_tpu.port.blocks import basic_block_rules, bottleneck_rules, res_layer_rules


def torch_basic_block(inplanes, planes, stride=1):
    """Reference BasicBlock topology (res_module.py:27-56)."""

    class TB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            if stride != 1 or inplanes != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes)
                )
            else:
                self.downsample = None

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    return TB()


def torch_bottleneck(inplanes, planes, stride=1):
    class TB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            if stride != 1 or inplanes != planes * 4:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )
            else:
                self.downsample = None

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + r)

    return TB()


def randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.weight.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))


def run_both(tmod, fmod, rules, x, rng):
    randomize_bn_stats(tmod, rng)
    tmod.eval()
    exp = tmod(torch.from_numpy(x)).detach().numpy()
    exp = np.moveaxis(exp, 1, -1)

    xf = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = fmod.init({"params": jax.random.PRNGKey(0)}, xf)
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    new_vars, report = apply_rules(sd, variables, rules, strict=True)
    assert not report["unconsumed_torch_keys"], report["unconsumed_torch_keys"]
    got = np.asarray(fmod.apply(new_vars, xf))
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_basic_block_with_downsample(rng):
    x = rng.rand(2, 16, 10, 10).astype(np.float32)
    tmod = torch_basic_block(16, 32, stride=2)
    fmod = BasicBlock(planes=32, stride=2, train=False)
    run_both(tmod, fmod, basic_block_rules("", (), True), x, rng)


def test_basic_block_identity(rng):
    x = rng.rand(2, 32, 8, 8).astype(np.float32)
    tmod = torch_basic_block(32, 32)
    fmod = BasicBlock(planes=32, train=False)
    run_both(tmod, fmod, basic_block_rules("", (), False), x, rng)


def test_bottleneck_with_downsample(rng):
    x = rng.rand(2, 16, 10, 10).astype(np.float32)
    tmod = torch_bottleneck(16, 8, stride=2)
    fmod = Bottleneck(planes=8, stride=2, train=False)
    run_both(tmod, fmod, bottleneck_rules("", (), True), x, rng)


def test_res_layer_sequence(rng):
    """A torch layer of 3 BasicBlocks == flax ResLayer with generated rules."""
    blocks = [torch_basic_block(16, 32, 2), torch_basic_block(32, 32), torch_basic_block(32, 32)]
    tmod = tnn.Sequential(*blocks)
    fmod = ResLayer(BasicBlock, planes=32, num_blocks=3, stride=2, train=False)
    x = rng.rand(1, 16, 12, 12).astype(np.float32)
    rules = res_layer_rules("", (), "basic", 3, True)
    run_both(tmod, fmod, rules, x, rng)


def test_full_smpl_resnet18_conversion(rng):
    """End-to-end: a torch SmplResNet-18 twin (reference res_module topology)
    converts name-for-name and reproduces through the flax SmplResNet."""
    from danet_densepose2smpl_tpu.nn.resnet import SmplResNet
    from danet_densepose2smpl_tpu.port.blocks import smpl_resnet_rules

    class TorchSmplResNet(tnn.Module):
        def __init__(self, num_classes=13):
            super().__init__()
            self.conv1 = tnn.Conv2d(64, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)

            def layer(inp, planes, blocks, stride):
                mods = [torch_basic_block(inp, planes, stride)]
                for _ in range(blocks - 1):
                    mods.append(torch_basic_block(planes, planes))
                return tnn.Sequential(*mods)

            self.layer1 = layer(64, 64, 2, 1)
            self.layer2 = layer(64, 128, 2, 2)
            self.layer3 = layer(128, 256, 2, 2)
            self.layer4 = layer(256, 512, 2, 2)
            self.final_layer = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))
            return self.final_layer(x)

    tmod = TorchSmplResNet()
    randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.rand(2, 64, 56, 56).astype(np.float32)
    exp = tmod(torch.from_numpy(x)).detach().numpy()

    fmod = SmplResNet(resnet_nums=18, num_classes=13, train=False)
    xf = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = fmod.init({"params": jax.random.PRNGKey(0)}, xf)
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    rules = smpl_resnet_rules("", (), 18, num_classes=13)
    new_vars, report = apply_rules(sd, variables, rules, strict=True)
    assert not report["unconsumed_torch_keys"], report["unconsumed_torch_keys"]
    got, _ = fmod.apply(new_vars, xf)
    np.testing.assert_allclose(np.asarray(got), exp, atol=3e-4)


def test_full_hrnet_conversion(rng):
    """A torch HRNet twin (reference hr_module.py topology + names, small
    stage spec) converts name-for-name through hrnet_rules and reproduces
    through the flax PoseHighResolutionNet."""
    from danet_densepose2smpl_tpu.nn.hrnet import PoseHighResolutionNet
    from danet_densepose2smpl_tpu.port.blocks import hrnet_rules

    stages = ((1, 2, (2, 2), (8, 16)), (1, 3, (2, 2, 2), (8, 16, 32)))

    def conv_bn_relu(cin, cout, stride=1):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, stride, 1, bias=False), tnn.BatchNorm2d(cout), tnn.ReLU()
        )

    class TorchHR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(64)
            blocks = [torch_bottleneck(64, 64)] + [torch_bottleneck(256, 64) for _ in range(3)]
            self.layer1 = tnn.Sequential(*blocks)

            prev = (256,)
            self.specs = stages
            for s_idx, (nm, nb, nblk, ch) in enumerate(stages):
                t = s_idx + 1
                trans = tnn.ModuleList()
                for i in range(nb):
                    if i < len(prev):
                        if prev[i] != ch[i]:
                            trans.append(
                                tnn.Sequential(
                                    tnn.Conv2d(prev[i], ch[i], 3, 1, 1, bias=False),
                                    tnn.BatchNorm2d(ch[i]), tnn.ReLU(),
                                )
                            )
                        else:
                            trans.append(tnn.Identity())
                    else:
                        trans.append(tnn.Sequential(conv_bn_relu(prev[-1], ch[i], 2)))
                setattr(self, f"transition{t}", trans)

                mods = tnn.ModuleList()
                for m in range(nm):
                    mod = tnn.Module()
                    mod.branches = tnn.ModuleList(
                        [tnn.Sequential(*[torch_basic_block(ch[b], ch[b]) for _ in range(nblk[b])]) for b in range(nb)]
                    )
                    last = s_idx == len(stages) - 1 and m == nm - 1
                    n_out = 1 if last else nb
                    fuse = tnn.ModuleList()
                    for i in range(n_out):
                        row = tnn.ModuleList()
                        for j in range(nb):
                            if j > i:
                                row.append(tnn.Sequential(
                                    tnn.Conv2d(ch[j], ch[i], 1, bias=False), tnn.BatchNorm2d(ch[i]),
                                    tnn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                                ))
                            elif j < i:
                                steps = []
                                for k in range(i - j):
                                    lastk = k == i - j - 1
                                    cout = ch[i] if lastk else ch[j]
                                    seq = [tnn.Conv2d(ch[j], cout, 3, 2, 1, bias=False), tnn.BatchNorm2d(cout)]
                                    if not lastk:
                                        seq.append(tnn.ReLU())
                                    steps.append(tnn.Sequential(*seq))
                                row.append(tnn.Sequential(*steps))
                            else:
                                row.append(tnn.Identity())
                        fuse.append(row)
                    mod.fuse_layers = fuse
                    mods.append(mod)
                setattr(self, f"stage{t + 1}", mods)
                prev = ch

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = torch.relu(self.bn2(self.conv2(x)))
            x = self.layer1(x)
            xs = [x]
            prev_n = 1
            for s_idx, (nm, nb, nblk, ch) in enumerate(self.specs):
                t = s_idx + 1
                trans = getattr(self, f"transition{t}")
                new = []
                for i in range(nb):
                    src = xs[i] if i < prev_n else xs[-1]
                    new.append(trans[i](src))
                for mod in getattr(self, f"stage{t + 1}"):
                    ys = [mod.branches[b](new[b]) for b in range(nb)]
                    outs = []
                    for i, row in enumerate(mod.fuse_layers):
                        acc = None
                        for j in range(nb):
                            y = ys[j] if isinstance(row[j], tnn.Identity) else row[j](ys[j])
                            acc = y if acc is None else acc + y
                        outs.append(torch.relu(acc))
                    new = outs
                xs = new
                prev_n = nb
            return xs[0]

    tmod = TorchHR()
    randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    exp = np.moveaxis(tmod(torch.from_numpy(x)).detach().numpy(), 1, -1)

    fmod = PoseHighResolutionNet(stages=stages, train=False)
    xf = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = fmod.init({"params": jax.random.PRNGKey(0)}, xf)
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    rules = hrnet_rules(stages)
    new_vars, report = apply_rules(sd, variables, rules, strict=True)
    assert not report["unconsumed_torch_keys"], report["unconsumed_torch_keys"][:6]
    got = np.asarray(fmod.apply(new_vars, xf))
    np.testing.assert_allclose(got, exp, atol=3e-4)


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["hrnet", "resnet"])
def test_danet_full_map_structural(backbone, rng):
    """The complete DaNet checkpoint map covers every flax parameter and
    consumes every (synthesized, shape-correct) torch key; the converted
    model executes."""
    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.port.danet_map import danet_rules, synthesize_torch_state_dict

    kw = {"iuv_regressor": backbone}
    if backbone == "resnet":
        kw["msres_num_layers"] = 18  # keep the test light
    cfg = DaNetConfig(**kw)
    model = DaNet(cfg, train=False)
    size = 64 if backbone == "resnet" else 224
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size, size, 3)))

    rules = danet_rules(cfg)
    sd = synthesize_torch_state_dict(rules, variables)
    new_vars, report = apply_rules(sd, variables, rules, strict=True)
    assert not report["unconsumed_torch_keys"], report["unconsumed_torch_keys"][:5]
    assert not report["unfilled_params"]
    out = model.apply(new_vars, jnp.zeros((1, size, size, 3)))
    assert np.isfinite(np.asarray(out["para"])).all()


def test_hmr_map_structural(rng):
    """HMR checkpoint map: full coverage with a synthesized state_dict."""
    from danet_densepose2smpl_tpu.nn.hmr import HMR
    from danet_densepose2smpl_tpu.port.danet_map import hmr_rules, synthesize_torch_state_dict

    m = HMR(train=False)
    v = m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 144)), jnp.zeros((1, 10)), jnp.asarray([[0.9, 0.0, 0.0]]),
    )
    rules = hmr_rules()
    sd = synthesize_torch_state_dict(rules, v)
    new_vars, report = apply_rules(sd, v, rules, strict=True)
    assert not report["unconsumed_torch_keys"]
    assert not report["unfilled_params"]
    rot, shape, cam = m.apply(
        new_vars, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 144)), jnp.zeros((1, 10)), jnp.asarray([[0.9, 0.0, 0.0]])
    )
    assert np.isfinite(np.asarray(rot)).all()
