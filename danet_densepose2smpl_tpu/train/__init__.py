"""Training: loss assembly, sharded train step, schedules, fits dict, loop."""

from danet_densepose2smpl_tpu.train.objective import (  # noqa: F401
    compute_losses,
    part_iuv_gt_crops,
)
from danet_densepose2smpl_tpu.train.prepare import prepare_targets  # noqa: F401
from danet_densepose2smpl_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_train_step,
)
from danet_densepose2smpl_tpu.train.fits_dict import FitsDict  # noqa: F401
from danet_densepose2smpl_tpu.train.trainer import Trainer  # noqa: F401
