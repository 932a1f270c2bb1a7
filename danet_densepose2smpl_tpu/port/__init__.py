"""Checkpoint porting: released PyTorch DaNet weights -> flax parameter trees.

The reference ships trained checkpoints (danet_model_h36m_itw.pt,
danet_model_h36m_dpcoco.pt); this package maps their state_dict layouts
onto this framework's parameter pytree (SURVEY.md Â§7.4 hard part 4).
"""

from danet_densepose2smpl_tpu.port.convert import (  # noqa: F401
    apply_rules,
    bn_rules,
    conv_rules,
    convert_bn,
    convert_conv,
    convert_deconv,
    convert_grouped_head,
    convert_grouped_head_bias,
    convert_linear,
)
