"""Demo smoke over the 10 real reference example JPEGs (VERDICT r4 next-#8).

Runs the demo CLI once over /root/reference/examples (ONE model instance,
jitted infer compiled once), then asserts a composite PNG materialized for
every input and is a valid non-trivial image. Asset-free: synthetic SMPL +
atlas, tiny config by default for speed; pass --cfg configs/danet_default.yaml
for the flagship graph.

Run: python -m scripts.demo_smoke [--examples DIR] [--cfg CFG] [--tpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--examples", default="/root/reference/examples")
    p.add_argument("--cfg", default="configs/danet_tiny_test.yaml")
    p.add_argument("--num_verts", type=int, default=500)
    p.add_argument("--tpu", action="store_true",
                   help="run on the default (TPU) backend instead of CPU")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)

    imgs = sorted(glob.glob(os.path.join(args.examples, "*.jpg")))
    if not imgs:
        print(json.dumps({"demo_smoke": "SKIP", "reason": f"no jpgs in {args.examples}"}))
        return 0

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="demo_smoke_")
    from danet_densepose2smpl_tpu.cli.demo import main as demo_main

    cli = ["--imglist", args.examples, "--out_dir", out_dir,
           "--cfg", args.cfg, "--synthetic-assets",
           "--num_verts", str(args.num_verts)]
    if not args.tpu:
        cli.append("--cpu")
    rc = demo_main(cli)
    if rc not in (0, None):
        print(json.dumps({"demo_smoke": "FAIL", "rc": rc}))
        return 1

    import numpy as np

    failures = []
    for img in imgs:
        stem = os.path.splitext(os.path.basename(img))[0]
        outs = glob.glob(os.path.join(out_dir, f"{stem}*.png"))
        if not outs:
            failures.append(f"{stem}: no composite written")
            continue
        import cv2

        comp = cv2.imread(outs[0])
        if comp is None or comp.size == 0:
            failures.append(f"{stem}: unreadable composite")
        elif comp.std() < 1.0:  # a constant image means a dead render path
            failures.append(f"{stem}: composite has no content (std={comp.std():.2f})")
    status = {"demo_smoke": "FAIL" if failures else "OK",
              "images": len(imgs), "out_dir": out_dir, "failures": failures}
    print(json.dumps(status))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
