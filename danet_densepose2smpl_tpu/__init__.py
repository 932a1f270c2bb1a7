"""danet_densepose2smpl_tpu — a TPU-native JAX/XLA/Pallas framework with the
capabilities of DaNet-DensePose2SMPL ("Learning 3D Human Shape and Pose from
Dense Body Parts", TPAMI 2020).

Built from scratch for TPU: NHWC layouts, bfloat16 matmuls on the MXU,
vmapped 24-part computation instead of grouped convs, Pallas kernels for the
mesh rasterizer and part-crop resampling, and `jax.sharding.Mesh`-based data
parallelism instead of a single-GPU loop.

Layer map (mirrors SURVEY.md §7.1):
  core/      config pytrees, rng, mesh/sharding, checkpointing
  ops/       pure-JAX numerics (rotations, projection, IUV codec, ...)
  kernels/   Pallas TPU kernels (rasterizer, part crops)
  smpl/      SMPL body model (fused blendshape + LBS forward)
  nn/        flax.linen building blocks (HRNet-W48, ResNets, GCN, heads)
  models/    DaNet composition + losses; HMR baseline
  data/      npz datasets, augmentation, mixed sampling
  parallel/  mesh construction and sharded train/eval steps
  train/     training loop, fits dict, two-stage schedule
  eval/      MPJPE/PA-MPJPE/COCO-AP harnesses
  cli/       demo / eval / eval_coco / train entry points
"""

__version__ = "0.1.0"
