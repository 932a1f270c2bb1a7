"""Long-window training stability proof on the real chip (r4 VERDICT #7).

The CPU trainer e2e test (tests/test_trainer_e2e.py) proves two-stage +
mid-epoch-resume semantics at fixture scale; this script proves the same
trainer holds up over a multi-thousand-step window on real TPU hardware
with the flagship 224px model in bf16 (reference training loop:
/root/reference/train/base_trainer.py:53-106):

  A. straight run: N steps across the pretrain->full two-stage boundary
     (pretr_step = N/2), synthetic dataset, fixed seed.
  B. interrupted run: same config, --time_to_run stops it mid-run with a
     clean checkpoint+exit (wherever the budget lands, usually mid-epoch);
     a second invocation auto-resumes from the workdir and completes.

Then it checks, and prints as JSON lines:
  - resumed-vs-straight final parameters: bitwise max |diff| (must be 0 —
    the step rng is fold_in(rng, state.step) and the loader permutation is
    a pure function of the epoch, so the step sequence replays exactly);
  - loss trajectory: no NaN/inf anywhere in either metrics.jsonl, and the
    median of the last 5 summary windows vs the first (must drop);
  - the full loss curve (step, loss_total) for PERF.md.

Run: python -m scripts.train_stability [--steps 3200] [--batch 32]
Takes ~1.5 h on the tunneled v5e (host-decode-bound at batch 32 on the
1-core container; the point is numerics/infra, not throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def run_cli(workdir, name, epochs, pretr, batch, num_samples, summary, extra=()):
    cmd = [
        sys.executable, "-m", "danet_densepose2smpl_tpu.cli.train",
        "--name", name, "--log_dir", workdir,
        "--synthetic-data", "--num_samples", str(num_samples),
        "--batch_size", str(batch), "--num_epochs", str(epochs),
        "--pretr_step", str(pretr), "--bf16",
        "--summary_steps", str(summary), "--vis_interval", "0",
        *extra,
    ]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True)
    dt = time.time() - t0
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-6:])
    phase = "budget" if "--time_to_run" in extra else "run"
    print(f"--- {name} ({phase}) rc={p.returncode} {dt:.0f}s\n{tail}", flush=True)
    if p.returncode != 0:
        raise RuntimeError(f"{name} failed")
    return dt


def load_metrics(workdir, name):
    rows = []
    with open(os.path.join(workdir, name, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def final_params(workdir, name):
    """Template-free orbax restore, platform-agnostic: restore every leaf
    as np.ndarray so the saved shardings (which name the *saving*
    process's devices — axon TPU for the real run, TFRT_CPU for the smoke)
    are never deserialized; a template-free `mngr.restore(step)` fails with
    'Device ... was not found in jax.local_devices()' whenever the reading
    process's platform differs. Both runs saved the same topology, and the
    comparison below touches every leaf, so a mismatch cannot hide."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(workdir, name, "checkpoints")))
    step = mngr.latest_step()
    assert step is not None, f"no checkpoint for {name}"
    path = os.path.join(workdir, name, "checkpoints", str(step), "default")
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    out = ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    return out["state"], out["resume"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_samples", type=int, default=256)
    ap.add_argument("--workdir", default="/tmp/danet_stability")
    ap.add_argument("--cpu", action="store_true", help="CPU debug run")
    args = ap.parse_args()

    batches_per_epoch = args.num_samples // args.batch
    epochs = -(-args.steps // batches_per_epoch)
    pretr = args.steps // 2
    # CPU mode is for debugging this script, not evidence: tiny config
    extra = ("--cpu", "--img_size", "64", "--cfg", "configs/danet_tiny_test.yaml",
             "--num_verts", "400") if args.cpu else ()

    if os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)

    summary = max(1, min(50, args.steps // 10))

    # A: straight
    dt_a = run_cli(args.workdir, "straight", epochs, pretr, args.batch,
                   args.num_samples, summary, extra)

    # B: budget-interrupted + auto-resume. Budget = ~45% of A's wall time
    # lands the interrupt in the pretrain->full neighborhood, usually
    # mid-epoch.
    run_cli(args.workdir, "resumed", epochs, pretr, args.batch,
            args.num_samples, summary,
            extra + ("--time_to_run", str(max(30.0, 0.45 * dt_a))))
    # the budget save must land strictly mid-run or the resume leg proves
    # nothing
    import orbax.checkpoint as ocp
    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.workdir, "resumed", "checkpoints")))
    interrupt_step = mngr.latest_step()
    print(json.dumps({"metric": "stability_interrupt_step",
                      "value": int(interrupt_step or 0),
                      "mid_run": bool(interrupt_step and 0 < interrupt_step < args.steps)}),
          flush=True)
    assert interrupt_step and 0 < interrupt_step < args.steps, \
        f"budget stop landed at {interrupt_step}, not mid-run — raise --steps"
    run_cli(args.workdir, "resumed", epochs, pretr, args.batch,
            args.num_samples, summary, extra)

    import numpy as np
    import jax.tree_util as jtu

    state_a, point_a = final_params(args.workdir, "straight")
    state_b, point_b = final_params(args.workdir, "resumed")
    assert int(point_a["step"]) == int(point_b["step"]), (point_a, point_b)
    diffs = jtu.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
        if hasattr(a, "dtype") else 0.0,
        state_a["params"], state_b["params"])
    max_diff = max(jtu.tree_leaves(diffs))
    print(json.dumps({"metric": "stability_resume_params_max_abs_diff",
                      "value": max_diff, "steps": int(point_a["step"]),
                      "bitmatch": max_diff == 0.0}), flush=True)

    for name in ("straight", "resumed"):
        rows = load_metrics(args.workdir, name)
        losses = [r["loss_total"] for r in rows if "loss_total" in r]
        if not losses:
            print(json.dumps({"metric": f"stability_{name}_loss",
                              "error": "no summary windows logged"}), flush=True)
            continue
        finite = all(np.isfinite(losses))
        first = losses[0]
        last5 = float(np.median(losses[-5:]))
        print(json.dumps({
            "metric": f"stability_{name}_loss", "first_window": first,
            "median_last5": last5, "n_windows": len(losses),
            "all_finite": bool(finite), "dropped": bool(last5 < first),
            "curve": [[int(r["step"]), round(float(r["loss_total"]), 3)]
                      for r in rows if "loss_total" in r][::4],
        }), flush=True)


if __name__ == "__main__":
    main()
