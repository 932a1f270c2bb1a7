"""Sharded train step: one jitted function = forward + losses + grads + Adam.

Replaces the reference's eager loop body (`train/trainer.py:117-244`,
`base_trainer.py:53-106`): the whole step compiles to a single XLA program
over the data-parallel mesh. Params/optimizer state are replicated, the
batch is sharded on the 'data' axis; XLA inserts the gradient all-reduce
and the global-batch means inside BatchNorm (sync-BN).

Two-stage schedule: `pretrain_mode` changes the traced graph (IUV-only), so
the trainer holds two compiled step functions and switches at
`pretr_step` (reference `base_trainer.py:74`, README two-stage recipe).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from danet_densepose2smpl_tpu.core.config import Config
from danet_densepose2smpl_tpu.models.danet import DaNet
from danet_densepose2smpl_tpu.smpl import SMPLModel
from danet_densepose2smpl_tpu.train.objective import compute_losses
from danet_densepose2smpl_tpu.train.prepare import prepare_targets


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """Step decay x0.1 at each SOLVER.STEPS boundary after the first
    (reference trainer.py:63,120-128: decay_steps_ind starts at 1, so the
    leading 0 milestone never fires)."""
    boundaries = {int(s): 0.1 for s in cfg.solver.steps[1:]}
    return optax.piecewise_constant_schedule(cfg.solver.base_lr, boundaries)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam at the reference's operating point (trainer.py:42-44). SGD is
    accepted for completeness; anything else fails fast rather than being
    silently mapped to Adam."""
    if cfg.solver.optimizer == "adam":
        return optax.adam(make_lr_schedule(cfg))
    if cfg.solver.optimizer == "sgd":
        return optax.sgd(make_lr_schedule(cfg), momentum=0.9)
    raise ValueError(
        f"unsupported solver.optimizer '{cfg.solver.optimizer}' (supported: adam, sgd)"
    )


def create_train_state(model: DaNet, cfg: Config, rng, sample_image) -> TrainState:
    gt_kwargs = {}
    if cfg.danet.input_mode in ("iuv_gt", "iuv_gt_feat"):
        # GT-driven ablation modes consume the rendered GT IUV image (and GT
        # SMPL keypoints for the oracle STN) in the forward; init with
        # matching placeholders so the parameter tree includes those paths
        b = sample_image.shape[0]
        s = cfg.danet.heatmap_size
        gt_kwargs = {
            "uv_image_gt": jnp.zeros((b, s, s, 3), sample_image.dtype),
            "smpl_kps_gt": jnp.zeros((b, 24, 3), sample_image.dtype),
        }
    variables = model.init(
        {"params": rng, "jitter": jax.random.fold_in(rng, 1), "partdrop": jax.random.fold_in(rng, 2)},
        sample_image,
        **gt_kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


def make_loss_fn(
    train_model: DaNet,
    smpl: SMPLModel,
    cfg: Config,
    pretrain_mode: bool = False,
) -> Callable:
    """The differentiated core of the train step as a standalone function
    loss_fn(params, batch_stats, batch, jit_rng, drop_rng) ->
    (total, (losses, new_batch_stats)). Factored out so the component
    profiler (scripts/profile_train.py) can time forward / forward+backward
    in isolation against exactly the production graph."""
    # Mixed precision (compute_dtype='bfloat16'): the model forward runs in
    # bf16 (params cast per step, activations follow), while master params,
    # optimizer moments, BatchNorm statistics (flax computes them in f32
    # regardless of input dtype), GT preparation and every loss stay fp32.
    # Gradients arrive fp32 through the cast's transpose.
    mp_dtype = jnp.bfloat16 if cfg.danet.compute_dtype == "bfloat16" else None

    def loss_fn(params, batch_stats, batch, jit_rng, drop_rng):
        if mp_dtype is not None:
            from danet_densepose2smpl_tpu.parallel.mesh import cast_float_tree

            fwd_params = cast_float_tree(params, mp_dtype)
            img = batch["img"].astype(mp_dtype)
        else:
            fwd_params, img = params, batch["img"]
        gt_kwargs = {}
        if cfg.danet.input_mode in ("iuv_gt", "iuv_gt_feat"):
            # GT-driven ablations consume the rendered GT IUV image (and
            # GT SMPL keypoints for the oracle STN) inside the forward —
            # reference danet.py:67-77,249-262. prepare_targets put both
            # in the batch; a KeyError here means the dataset/renderer
            # cannot supply them for this mode.
            gt_kwargs = {"uv_image_gt": batch["uv_image_gt"],
                         "smpl_kps_gt": batch["target_smpl_kps"]}
        out, mutated = train_model.apply(
            {"params": fwd_params, "batch_stats": batch_stats},
            img,
            pretrain_mode=pretrain_mode,
            mutable=["batch_stats"],
            rngs={"jitter": jit_rng, "partdrop": drop_rng},
            **gt_kwargs,
        )
        if mp_dtype is not None:
            out = jax.tree.map(
                lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and x.dtype == mp_dtype else x,
                out,
            )
        total, losses = compute_losses(
            cfg.danet, smpl, out, batch, pretrain_mode=pretrain_mode,
            openpose_weight=cfg.train.openpose_train_weight,
            gt_weight=cfg.train.gt_train_weight,
        )
        return total, (losses, mutated["batch_stats"])

    return loss_fn


def make_train_step(
    train_model: DaNet,
    smpl: SMPLModel,
    cfg: Config,
    mesh: Mesh | None = None,
    pretrain_mode: bool = False,
    donate: bool = True,
    renderer=None,
    is_itw: bool = False,
) -> Callable:
    """Build the jitted train step.

    Returns step(state, batch, rng) -> (state, metrics). With a mesh, the
    batch is expected sharded on the 'data' axis and state replicated.
    When the batch carries raw GT (`opt_pose` from the fits lookup), the
    full target preparation — pseudo-fit merge, camera WLS fits, target
    keypoint projection, GT IUV rendering — runs inside the same jit.
    """
    optimizer = make_optimizer(cfg)
    loss_fn_core = make_loss_fn(train_model, smpl, cfg, pretrain_mode=pretrain_mode)

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        if "raw_img" in batch:
            # device ingest: raw uint8 frames -> augmented normalized crops
            # inside the same XLA program as forward+backward (the training
            # half of the BASELINE ingest north star)
            from danet_densepose2smpl_tpu.data.pipeline import device_preprocess_train

            batch = dict(batch)
            batch["img"] = device_preprocess_train(
                batch.pop("raw_img"), batch["center"], batch["scale"],
                batch["rot_angle"], batch["is_flipped"], batch.pop("pixel_noise"),
                out_size=cfg.danet.img_size,
            )
        if "opt_pose" in batch and "opt_rotmat" not in batch:
            batch = prepare_targets(cfg, smpl, batch, renderer=renderer, is_itw=is_itw)
        jit_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            return loss_fn_core(params, state.batch_stats, batch, jit_rng, drop_rng)

        (total, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss_total"] = total
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
