"""Model layer: DaNet (IUV estimator + decomposed SMPL regressor) and losses."""

from danet_densepose2smpl_tpu.models.iuv_estimator import IUVEstimator  # noqa: F401
from danet_densepose2smpl_tpu.models.smpl_regressor import (  # noqa: F401
    DecomposedPredictor,
    GlobalPredictor,
    MeanParams,
    default_mean_params,
    load_mean_params,
)
from danet_densepose2smpl_tpu.models.danet import DaNet  # noqa: F401
