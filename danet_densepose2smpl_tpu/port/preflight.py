"""Released-checkpoint preflight: go/no-go a real .pt against the port map.

The reference's correctness is anchored by evaluating its released
checkpoints (`danet_model_h36m_itw.pt` / `danet_model_h36m_dpcoco.pt`,
reference README.md:94-107, eval.py:322-335). This container has no way to
fetch them, so porting must be provably ready *before* they appear: this
module diffs a real state_dict's key inventory against the rule map
(`port/danet_map.py`) and reports, without applying anything:

  * torch keys the map expects but the file lacks        (missing)
  * torch keys the file carries that no rule consumes    (unmapped),
    split from known-ignorable ones (num_batches_tracked, frozen
    `iuv2smpl.smpl.*` buffers the reference strips on save, saver.py:32-34)
  * tensors whose transformed shape mismatches the flax leaf (shape)
  * flax leaves no rule fills                            (unfilled)

Shapes come from `jax.eval_shape` over `model.init`, so the check runs in
seconds with no compile and no weights materialized. `preflight_report`
accumulates every problem instead of failing on the first, which is what a
go/no-go needs (apply_rules raises eagerly by design).
"""

from __future__ import annotations

import numpy as np

from danet_densepose2smpl_tpu.port.convert import _flatten

# key patterns a released checkpoint legitimately carries that the port map
# deliberately ignores
_IGNORABLE = (
    "num_batches_tracked",   # torch BN step counters
    "iuv2smpl.smpl.",        # frozen SMPL buffers (stripped on save anyway)
    ".smpl.",                # same, under other wrappers
    "init_pose", "init_shape", "init_cam",  # HMR mean-param buffers
)


def _is_ignorable(key: str) -> bool:
    return any(p in key for p in _IGNORABLE)


def preflight_report(torch_sd: dict, rules, variables) -> dict:
    """Diff a (already 'module.'-stripped, bias-fused) state_dict against a
    rule list + flax shape template. Never raises on checkpoint problems;
    raises only if the rule map itself is broken (a rule naming a flax leaf
    that doesn't exist — a framework bug, not a checkpoint one)."""
    flat = {col: _flatten(variables.get(col, {})) for col in ("params", "batch_stats")}

    missing, shape_mismatches, consumed, filled = [], [], set(), set()
    for torch_key, dest, transform in rules:
        col, *path = dest
        path = tuple(path)
        tgt = flat[col].get(path)
        if tgt is None:
            raise KeyError(f"rule map bug: no flax leaf {col}/{'/'.join(path)}")
        if torch_key not in torch_sd:
            if torch_key not in consumed:  # report each absent tensor once
                missing.append(torch_key)
                consumed.add(torch_key)
            continue
        consumed.add(torch_key)
        try:
            val = transform(torch_sd[torch_key]) if transform else np.asarray(torch_sd[torch_key])
            got = tuple(val.shape)
        except Exception as e:  # a transform choking on a malformed tensor
            shape_mismatches.append(
                {"torch_key": torch_key, "flax_path": "/".join(path),
                 "got": f"transform failed: {type(e).__name__}: {e}",
                 "want": list(tgt.shape)})
            continue
        if got != tuple(tgt.shape):
            shape_mismatches.append(
                {"torch_key": torch_key, "flax_path": "/".join(path),
                 "got": list(got), "want": list(tgt.shape)})
        else:
            filled.add((col, path))

    unmapped = [k for k in torch_sd if k not in consumed]
    unmapped_real = [k for k in unmapped if not _is_ignorable(k)]
    unmapped_ignorable = [k for k in unmapped if _is_ignorable(k)]
    unfilled = sorted(
        "/".join((col,) + p)
        for col in ("params", "batch_stats")
        for p in flat[col]
        if (col, p) not in filled
    )

    ok = not missing and not shape_mismatches and not unmapped_real and not unfilled
    return {
        "ok": ok,
        "n_torch_keys": len(torch_sd),
        "n_rules": len(rules),
        "missing_torch_keys": sorted(missing),
        "shape_mismatches": shape_mismatches,
        "unmapped_torch_keys": sorted(unmapped_real),
        "unmapped_ignorable": sorted(unmapped_ignorable),
        "unfilled_flax_leaves": unfilled,
    }


def format_report(report: dict, limit: int = 12) -> str:
    """Human go/no-go rendering of `preflight_report` output."""
    lines = []

    def section(title, items, render=str):
        lines.append(f"  {title}: {len(items)}")
        for it in items[:limit]:
            lines.append(f"    - {render(it)}")
        if len(items) > limit:
            lines.append(f"    ... and {len(items) - limit} more")

    lines.append(
        f"checkpoint: {report['n_torch_keys']} torch tensors, "
        f"{report['n_rules']} port rules"
    )
    section("missing torch keys (map expects, file lacks)", report["missing_torch_keys"])
    section(
        "shape mismatches",
        report["shape_mismatches"],
        lambda m: f"{m['torch_key']} -> {m['flax_path']}: got {m['got']}, want {m['want']}",
    )
    section("unmapped torch keys (file carries, no rule consumes)", report["unmapped_torch_keys"])
    section("unfilled flax leaves", report["unfilled_flax_leaves"])
    lines.append(f"  ignorable unmapped (BN counters / frozen SMPL buffers): "
                 f"{len(report['unmapped_ignorable'])}")
    lines.append("PREFLIGHT: GO — checkpoint ports cleanly" if report["ok"]
                 else "PREFLIGHT: NO-GO — fix the items above before evaluating")
    return "\n".join(lines)
