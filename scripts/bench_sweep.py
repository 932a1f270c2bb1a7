"""Perf-sweep harness around bench.py: serving batch sizes and training
configurations, one JSON line each (same honest forced-fetch timing).

Run from the repo root (axon plugin registration requires it):

    python -m scripts.bench_sweep --serve_b 320 384 --train bf16_remat:96

Results feed PERF.md's operating-point tables; the shipped bench.py keeps
the headline configurations.
"""

from __future__ import annotations

import argparse
import json
import traceback

import bench


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--serve_b", type=int, nargs="*", default=[],
                   help="serving batch sizes to time (bf16, pre-staged)")
    p.add_argument("--train", nargs="*", default=[],
                   help="training modes as name:batch, name in "
                        "{fp32, bf16, bf16_remat, fp32_remat}")
    args = p.parse_args(argv)

    # same guard rails as bench.main(): fail fast if the TPU tunnel is down,
    # and reuse the persistent compile cache so sweep points skip the
    # ~10-min cold flagship compiles on repeat runs
    bench._require_backend()
    bench._enable_compile_cache()

    kw = {
        "fp32": {},
        "bf16": {"compute_dtype": "bfloat16"},
        "bf16_remat": {"compute_dtype": "bfloat16", "remat_backbone": True},
        "fp32_remat": {"remat_backbone": True},
    }
    modes = []
    for spec in args.train:
        name, _, b = spec.partition(":")
        if name not in kw or not b.isdigit():
            p.error(f"--train spec '{spec}' must be name:batch with name in {sorted(kw)}")
        modes.append((f"train_{name}_b{b}", int(b), kw[name]))

    for b in args.serve_b:
        try:
            bench.bench_inference(B=b)
        except Exception:
            print(json.dumps({"metric": f"serve_b{b}_error",
                              "value": traceback.format_exc().strip().splitlines()[-1]}),
                  flush=True)
    if modes:
        try:
            bench.bench_train(modes=modes)
        except Exception:
            print(json.dumps({"metric": "train_sweep_error",
                              "value": traceback.format_exc().strip().splitlines()[-1]}),
                  flush=True)


if __name__ == "__main__":
    main()
