"""Shared CLI plumbing: asset resolution, checkpoint loading, arg groups.

The reference hard-codes asset paths in `path_config.py`; here every asset
(SMPL model, DensePose UV atlas, H36M joint regressor, SPIN mean params)
resolves from flags/environment with a `--synthetic-assets` fallback so
every entry point runs in asset-free environments (fixtures, CI).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--cfg", default=None, help="YAML config (reference layout)")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (or empty for random init)")
    p.add_argument("--torch_checkpoint", default=None,
                   help="released reference .pt checkpoint to port (danet/hmr)")
    p.add_argument("--regressor", default="danet", choices=["danet", "hmr"])
    p.add_argument("--smpl_model", default=os.environ.get("SMPL_MODEL_PATH"),
                   help=".pkl/.npz SMPL model (dir ok); synthetic if absent")
    p.add_argument("--uv_atlas", default=os.environ.get("DENSEPOSE_UV_PATH"),
                   help="UV_Processed.mat; synthetic if absent")
    p.add_argument("--j_regressor_h36m", default=os.environ.get("J_REGRESSOR_H36M"),
                   help="J_regressor_h36m.npy; synthetic if absent")
    p.add_argument("--j_regressor_extra", default=os.environ.get("J_REGRESSOR_EXTRA"))
    p.add_argument("--smpl_mean_params", default=os.environ.get("SMPL_MEAN_PARAMS"))
    p.add_argument("--synthetic-assets", action="store_true",
                   help="force synthetic SMPL/atlas/regressor assets")
    p.add_argument("--num_verts", type=int, default=6890,
                   help="vertex count for synthetic SMPL (tests use fewer)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="serving mode: cast params/activations to bfloat16")
    p.add_argument("--cpu", action="store_true",
                   help="force the JAX CPU backend (debug/fixture runs, or "
                        "when no accelerator is attached)")
    return p


def apply_platform(args):
    """Honor --cpu before any jax operation initializes a backend.

    Must be the first jax touch in a CLI main: some environments pin the
    platform via an env var the config override still beats, but only until
    the backend exists."""
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")


def load_assets(args):
    """Returns (smpl_model, atlas, j_regressor_h36m, mean_params)."""
    from danet_densepose2smpl_tpu.eval.harness import synthetic_h36m_regressor
    from danet_densepose2smpl_tpu.models.smpl_regressor import load_mean_params
    from danet_densepose2smpl_tpu.smpl import load_smpl_model, synthetic_smpl_model
    from danet_densepose2smpl_tpu.smpl.densepose_atlas import (
        load_densepose_atlas,
        synthetic_densepose_atlas,
    )

    import os

    smpl_male = smpl_female = None
    if args.smpl_model and not args.synthetic_assets:
        smpl = load_smpl_model(args.smpl_model, j_regressor_extra_path=args.j_regressor_extra)
        if os.path.isdir(args.smpl_model):
            # gendered models for the 3DPW eval (reference eval.py:68-75)
            for gender, slot in (("male", "smpl_male"), ("female", "smpl_female")):
                p = os.path.join(args.smpl_model, f"SMPL_{gender.upper()}.pkl")
                if os.path.isfile(p):
                    locals_model = load_smpl_model(p, j_regressor_extra_path=args.j_regressor_extra)
                    if gender == "male":
                        smpl_male = locals_model
                    else:
                        smpl_female = locals_model
    else:
        smpl = synthetic_smpl_model(num_verts=args.num_verts, seed=args.seed)

    if args.uv_atlas and not args.synthetic_assets:
        atlas = load_densepose_atlas(args.uv_atlas)
    else:
        atlas = synthetic_densepose_atlas(smpl, seed=args.seed)

    if args.j_regressor_h36m and not args.synthetic_assets:
        jreg = np.load(args.j_regressor_h36m).astype(np.float32)
    else:
        jreg = synthetic_h36m_regressor(smpl.num_verts, seed=args.seed)

    mean = load_mean_params(None if args.synthetic_assets else args.smpl_mean_params)
    return smpl, atlas, jreg, mean, (smpl_male or smpl), (smpl_female or smpl)


def build_model_and_params(args, cfg, train: bool = False):
    """Construct the model; restore params from --checkpoint or random-init."""
    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.nn.hmr import HMR

    if args.regressor == "hmr":
        model = HMR(train=train)
        sample = (jnp.zeros((1, cfg.danet.img_size, cfg.danet.img_size, 3)),
                  jnp.zeros((1, 144)), jnp.zeros((1, 10)), jnp.asarray([[0.9, 0.0, 0.0]]))
        variables = model.init({"params": jax.random.PRNGKey(args.seed)}, *sample)
    else:
        model = DaNet(cfg.danet, train=train)
        rngs = {"params": jax.random.PRNGKey(args.seed)}
        if train:
            rngs.update(jitter=jax.random.PRNGKey(1), partdrop=jax.random.PRNGKey(2))
        variables = model.init(rngs, jnp.zeros((1, cfg.danet.img_size, cfg.danet.img_size, 3)))

    if getattr(args, "torch_checkpoint", None):
        if args.regressor == "hmr":
            from danet_densepose2smpl_tpu.port.danet_map import load_hmr_checkpoint

            variables, report = load_hmr_checkpoint(args.torch_checkpoint, variables, strict=True)
        else:
            from danet_densepose2smpl_tpu.port.danet_map import load_danet_checkpoint

            variables, report = load_danet_checkpoint(args.torch_checkpoint, cfg.danet, variables, strict=True)
        extra = report["unconsumed_torch_keys"]
        print(f"ported {args.torch_checkpoint} ({len(extra)} torch keys unused"
              + (f", e.g. {extra[:3]}" if extra else "") + ")")

    if args.checkpoint:
        import jax.numpy as jnp

        from danet_densepose2smpl_tpu.core.checkpoint import CheckpointManager
        from danet_densepose2smpl_tpu.train.step import TrainState, make_optimizer

        mngr = CheckpointManager(args.checkpoint)
        # the stored tree is a full TrainState; rebuild its template from cfg
        opt_template = make_optimizer(cfg).init(variables["params"])
        template = TrainState(
            variables["params"], variables.get("batch_stats", {}), opt_template,
            jnp.zeros((), jnp.int32),
        )
        restored = mngr.restore(template)
        if restored is not None:
            state, _ = restored
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            print(f"restored checkpoint from {args.checkpoint}")
    return model, variables


def dump_run_config(args, cfg, out_dir: str):
    """Persist the resolved run configuration (reference train_options.py
    dumps config.json per run)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {"args": {k: str(v) for k, v in vars(args).items()}}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(payload, f, indent=2)
