"""Rule generators for porting torch residual blocks -> flax blocks.

These compose into full-model name maps: the reference's BasicBlock /
Bottleneck / ResLayer naming (conv1/bn1/conv2/bn2[/conv3/bn3]/downsample.{0,1},
layers as `prefix.{i}.`) maps onto this framework's auto-named flax modules
(Conv_0 / NormAct_0/BatchNorm_0 / ... with the downsample conv last).
Validated in tests/test_port_blocks.py by running torch blocks and flax
blocks with converted weights side by side.
"""

from __future__ import annotations

from danet_densepose2smpl_tpu.port.convert import bn_rules, conv_rules


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def basic_block_rules(tpre: str, fpath: tuple, has_downsample: bool) -> list:
    """torch BasicBlock (reference res_module.py:27-56) -> flax BasicBlock.

    flax order (nn/layers.py): Conv_0, NormAct_0, Conv_1, NormAct_1,
    [Conv_2 + NormAct_2 for the shortcut projection]."""
    rules = []
    rules += conv_rules(_j(tpre, "conv1"), fpath + ("conv1",))
    rules += bn_rules(_j(tpre, "bn1"), fpath + ("bn1", "norm"))
    rules += conv_rules(_j(tpre, "conv2"), fpath + ("conv2",))
    rules += bn_rules(_j(tpre, "bn2"), fpath + ("bn2", "norm"))
    if has_downsample:
        rules += conv_rules(_j(tpre, "downsample.0"), fpath + ("downsample_conv",))
        rules += bn_rules(_j(tpre, "downsample.1"), fpath + ("downsample_bn", "norm"))
    return rules


def bottleneck_rules(tpre: str, fpath: tuple, has_downsample: bool) -> list:
    """torch Bottleneck (reference res_module.py:59-97) -> flax Bottleneck."""
    rules = []
    rules += conv_rules(_j(tpre, "conv1"), fpath + ("conv1",))
    rules += bn_rules(_j(tpre, "bn1"), fpath + ("bn1", "norm"))
    rules += conv_rules(_j(tpre, "conv2"), fpath + ("conv2",))
    rules += bn_rules(_j(tpre, "bn2"), fpath + ("bn2", "norm"))
    rules += conv_rules(_j(tpre, "conv3"), fpath + ("conv3",))
    rules += bn_rules(_j(tpre, "bn3"), fpath + ("bn3", "norm"))
    if has_downsample:
        rules += conv_rules(_j(tpre, "downsample.0"), fpath + ("downsample_conv",))
        rules += bn_rules(_j(tpre, "downsample.1"), fpath + ("downsample_bn", "norm"))
    return rules


def res_layer_rules(
    tpre: str,
    fpath: tuple,
    block: str,
    num_blocks: int,
    first_has_downsample: bool,
) -> list:
    """A torch `layerN = nn.Sequential(blocks)` -> flax ResLayer.

    block: 'basic' | 'bottleneck'. Only block 0 may carry the projection
    shortcut (reference _make_layer)."""
    gen = basic_block_rules if block == "basic" else bottleneck_rules
    rules = []
    for i in range(num_blocks):
        rules += gen(
            _j(tpre, str(i)),
            fpath + (str(i),),
            has_downsample=(i == 0 and first_has_downsample),
        )
    return rules


def smpl_resnet_rules(
    tpre: str, fpath: tuple, depth: int, num_classes: int = 229, truncate: int = 0,
) -> list:
    """Full SmplResNet map (reference res_module.py:393-497): conv1/bn1 +
    layer1..4 + final_layer, honoring `truncate`."""
    from danet_densepose2smpl_tpu.port.convert import convert_linear
    import numpy as np

    block = "basic" if depth in (18, 34) else "bottleneck"
    counts = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
              101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    exp = 1 if block == "basic" else 4

    rules = []
    rules += conv_rules(_j(tpre, "conv1"), fpath + ("conv1",))
    rules += bn_rules(_j(tpre, "bn1"), fpath + ("bn1", "norm"))
    in_ch = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        if (li == 2 and truncate >= 2) or (li == 3 and truncate >= 1):
            break
        stride = 1 if li == 0 else 2
        has_ds = stride != 1 or in_ch != planes * exp
        rules += res_layer_rules(
            _j(tpre, f"layer{li + 1}"), fpath + (f"layer{li + 1}",), block, counts[li], has_ds
        )
        in_ch = planes * exp
    if num_classes > 0:
        rules += [
            (_j(tpre, "final_layer.weight"), ("params",) + fpath + ("final_layer", "kernel"), convert_linear),
            (_j(tpre, "final_layer.bias"), ("params",) + fpath + ("final_layer", "bias"), np.asarray),
        ]
    return rules


def hrnet_rules(stages, fpath: tuple = ()) -> list:
    """Full PoseHighResolutionNet map (reference hr_module.py:188-378).

    `stages`: the framework's stage spec tuples (num_modules, num_branches,
    num_blocks, channels). Torch names: conv1/bn1/conv2/bn2, layer1 (4
    Bottlenecks), transition{t} ModuleLists (existing-branch adapters
    `transition{t}.{i}.{0,1}`, new-branch `transition{t}.{i}.0.{0,1}`),
    stage{t+1}.{m}.branches.{b}.{k}, stage{t+1}.{m}.fuse_layers.{i}.{j}
    (j>i: `.0/.1` conv+bn; j<i: `.{k}.0/.{k}.1` per step).
    """
    rules = []
    rules += conv_rules("conv1", fpath + ("conv1",))
    rules += bn_rules("bn1", fpath + ("bn1", "norm"))
    rules += conv_rules("conv2", fpath + ("conv2",))
    rules += bn_rules("bn2", fpath + ("bn2", "norm"))
    rules += res_layer_rules("layer1", fpath + ("layer1",), "bottleneck", 4, True)

    prev_channels = (256,)
    for s_idx, (num_modules, num_branches, num_blocks, channels) in enumerate(stages):
        t = s_idx + 1
        for i in range(num_branches):
            if i < len(prev_channels):
                if prev_channels[i] != channels[i]:
                    rules += conv_rules(f"transition{t}.{i}.0", fpath + (f"transition{t}_{i}_conv",))
                    rules += bn_rules(f"transition{t}.{i}.1", fpath + (f"transition{t}_{i}_bn", "norm"))
            else:
                rules += conv_rules(f"transition{t}.{i}.0.0", fpath + (f"transition{t}_{i}_conv",))
                rules += bn_rules(f"transition{t}.{i}.0.1", fpath + (f"transition{t}_{i}_bn", "norm"))

        last_stage = s_idx == len(stages) - 1
        for m in range(num_modules):
            mpre = f"stage{t + 1}.{m}"
            mpath = fpath + (f"stage{t + 1}_{m}",)
            for b in range(num_branches):
                rules += res_layer_rules(
                    f"{mpre}.branches.{b}", mpath + (f"branch{b}",), "basic", num_blocks[b], False
                )
            n_out = 1 if (last_stage and m == num_modules - 1) else num_branches
            for i in range(n_out):
                for j in range(num_branches):
                    if j > i:
                        rules += conv_rules(f"{mpre}.fuse_layers.{i}.{j}.0", mpath + (f"fuse{i}_{j}_conv",))
                        rules += bn_rules(f"{mpre}.fuse_layers.{i}.{j}.1", mpath + (f"fuse{i}_{j}_bn", "norm"))
                    elif j < i:
                        for k in range(i - j):
                            rules += conv_rules(
                                f"{mpre}.fuse_layers.{i}.{j}.{k}.0", mpath + (f"fuse{i}_{j}_{k}_conv",)
                            )
                            rules += bn_rules(
                                f"{mpre}.fuse_layers.{i}.{j}.{k}.1", mpath + (f"fuse{i}_{j}_{k}_bn", "norm")
                            )
        prev_channels = channels
    return rules
