"""flax.linen neural building blocks (NHWC, TPU-native).

Parity targets: reference `models/module/` — the channel plans, block
topologies and head dimensions match so released checkpoints can be ported;
the implementations are idiomatic JAX (channels-last, `feature_group_count`
for the 24-part grouped stacks, no global config reads).
"""

from danet_densepose2smpl_tpu.nn.layers import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    ResLayer,
)
from danet_densepose2smpl_tpu.nn.resnet import (  # noqa: F401
    LimbResLayers,
    PoseResNet,
    SmplResNet,
)
from danet_densepose2smpl_tpu.nn.hrnet import PoseHighResolutionNet  # noqa: F401
from danet_densepose2smpl_tpu.nn.iuv_head import IUVPredictHead  # noqa: F401
from danet_densepose2smpl_tpu.nn.gcn import GCN, GraphConv  # noqa: F401
from danet_densepose2smpl_tpu.nn.hmr import HMR  # noqa: F401
