"""Data layer: npz datasets, augmentation, mixed sampling, synthetic fixtures."""

from danet_densepose2smpl_tpu.data.synthetic import synthetic_batch  # noqa: F401
