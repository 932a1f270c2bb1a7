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
