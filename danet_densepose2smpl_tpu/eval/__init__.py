"""Evaluation harnesses reproducing the reference's eval.py / eval_coco.py."""

from danet_densepose2smpl_tpu.eval.metrics import (  # noqa: F401
    SegmentationScores,
    compute_mpjpe,
    keypoint_oks_ap,
)
from danet_densepose2smpl_tpu.eval.harness import PoseEvalResult, run_pose_eval  # noqa: F401
