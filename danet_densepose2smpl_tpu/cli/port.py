"""Checkpoint-port preflight CLI.

The day the released reference checkpoints (`danet_model_h36m_itw.pt`,
`danet_model_h36m_dpcoco.pt` — reference README.md:94-107) are available,
parity evaluation should be one documented command with no debugging. This
tool makes that true ahead of time:

  # go/no-go a real .pt against the port map (no weights applied):
  python -m danet_densepose2smpl_tpu.cli.port --check ckpt.pt [--cfg cfg.yaml]

  # dump the expected torch-key manifest (key -> shape) the map demands:
  python -m danet_densepose2smpl_tpu.cli.port --manifest expected_keys.json

Exit code 0 = GO (every expected key present at the right shape, every flax
leaf fillable), 1 = NO-GO with a categorized report. Model shapes come from
`jax.eval_shape` — no compile, no device, runs in seconds on CPU.

Reference anchor: eval.py:322-335 (strict=False torch load this tool makes
strict-able), utils/saver.py:32-34 (frozen SMPL buffers stripped on save).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load_state_dict(pt_path: str) -> dict:
    """torch.load + the same normalization the real port applies:
    'module.' DataParallel prefix strip + LSTM bias fusing."""
    import torch

    from danet_densepose2smpl_tpu.port.danet_map import fuse_lstm_biases

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {
        (k[7:] if k.startswith("module.") else k):
            v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
    }
    return fuse_lstm_biases(sd)


def _shape_template(args, cfg):
    """Flax variable tree of ShapeDtypeStructs via eval_shape (no compile,
    no weight materialization — preflight only needs shapes)."""
    import jax
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.models.danet import DaNet
    from danet_densepose2smpl_tpu.nn.hmr import HMR

    if args.regressor == "hmr":
        model = HMR(train=False)
        sample = (jnp.zeros((1, cfg.danet.img_size, cfg.danet.img_size, 3)),
                  jnp.zeros((1, 144)), jnp.zeros((1, 10)),
                  jnp.asarray([[0.9, 0.0, 0.0]]))
        return jax.eval_shape(
            lambda rng: model.init({"params": rng}, *sample), jax.random.PRNGKey(0)
        )
    model = DaNet(cfg.danet, train=False)
    x = jnp.zeros((1, cfg.danet.img_size, cfg.danet.img_size, 3))
    return jax.eval_shape(
        lambda rng: model.init({"params": rng}, x), jax.random.PRNGKey(0)
    )


def _rules(args, cfg):
    from danet_densepose2smpl_tpu.port.danet_map import danet_rules, hmr_rules

    return hmr_rules() if args.regressor == "hmr" else danet_rules(cfg.danet)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check", default=None, metavar="CKPT_PT",
                   help="released .pt to preflight against the port map")
    p.add_argument("--manifest", default=None, metavar="OUT_JSON",
                   help="write the expected torch key -> shape manifest")
    p.add_argument("--cfg", default=None, help="YAML config (reference layout)")
    p.add_argument("--regressor", default="danet", choices=["danet", "hmr"])
    p.add_argument("--json", action="store_true",
                   help="emit the full report as JSON instead of text")
    p.add_argument("--limit", type=int, default=12,
                   help="max items printed per report section")
    args = p.parse_args(argv)
    if not args.check and not args.manifest:
        p.error("nothing to do: pass --check ckpt.pt and/or --manifest out.json")

    import jax

    jax.config.update("jax_platforms", "cpu")  # shape-only work; never touch a TPU

    from danet_densepose2smpl_tpu.core.config import load_config
    from danet_densepose2smpl_tpu.port.danet_map import expected_torch_shapes
    from danet_densepose2smpl_tpu.port.preflight import format_report, preflight_report

    cfg = load_config(args.cfg)
    variables = _shape_template(args, cfg)
    rules = _rules(args, cfg)

    if args.manifest:
        manifest = {k: list(v) for k, v in expected_torch_shapes(rules, variables).items()}
        with open(args.manifest, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"wrote {len(manifest)} expected torch keys to {args.manifest}")

    if not args.check:
        return 0

    sd = _load_state_dict(args.check)
    report = preflight_report(sd, rules, variables)
    if args.json:
        print(json.dumps(report, indent=1))
    else:
        print(format_report(report, limit=args.limit))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
