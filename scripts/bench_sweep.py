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
    p.add_argument("--serve_b", nargs="*", default=[],
                   help="serving batch sizes to time (bf16, pre-staged); "
                        "'512x2' = batch 512 with part_head_chunks=2 (the "
                        "serving-memory knob for the B=512 crop-tensor OOM)")
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
    kw["bf16_rematmod"] = {"compute_dtype": "bfloat16", "remat_backbone": True,
                           "remat_scope": "modules"}
    modes = []
    for spec in args.train:
        name, _, b = spec.partition(":")
        full = name.startswith("full_")   # full_<mode> = raw batch + in-jit
        base = name[5:] if full else name  # GT prep + raster (true trainer step)
        if base not in kw or not b.isdigit():
            p.error(f"--train spec '{spec}' must be [full_]name:batch with name in {sorted(kw)}")
        modes.append((f"train_{name}_b{b}", int(b), kw[base]) + ((True,) if full else ()))

    for spec in args.serve_b:
        b, _, ch = str(spec).partition("x")
        kw = {"part_head_chunks": int(ch)} if ch else None
        try:
            bench.bench_inference(B=int(b), danet_kw=kw)
        except Exception:
            print(json.dumps({"metric": f"serve_b{spec}_error",
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
