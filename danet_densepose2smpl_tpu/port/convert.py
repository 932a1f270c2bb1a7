"""Torch -> flax weight-layout conversion (checkpoint porting, SURVEY §7.4#4).

Layout rules (validated numerically against torch in tests/test_port.py):
  Conv2d         (O, I/g, kh, kw) -> flax Conv kernel (kh, kw, I/g, O)
                 (same rule for feature_group_count/grouped convs)
  ConvTranspose2d(I, O, kh, kw)   -> flax ConvTranspose kernel: spatially
                 flipped, then transposed to (kh, kw, I, O)
  Linear         (O, I)           -> Dense kernel (I, O)
  BatchNorm2d    weight/bias/running_mean/running_var
                 -> scale/bias (params) + mean/var (batch_stats)
  grouped 1x1 head (G*O, I, 1, 1) -> PartwiseDense kernel (G, I, O), bias
                 (G*O,) -> (G, O)
  GraphConv      weight (I, O), bias (O,) -> unchanged

Porting a full released checkpoint additionally needs the name map between
the reference's module tree and this framework's (documented per-block in
the model docstrings; the structures correspond 1:1). `apply_rules` runs a
rule list of (torch_key, flax_path, transform) triples and reports
unconsumed / unfilled entries so porting errors are loud rather than
silent.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def convert_conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_deconv(w) -> np.ndarray:
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def convert_linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def convert_bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def convert_grouped_head(w, groups: int = 24) -> np.ndarray:
    w = np.asarray(w)[:, :, 0, 0]
    g_out = w.shape[0] // groups
    return np.transpose(w.reshape(groups, g_out, -1), (0, 2, 1))


def convert_grouped_head_bias(b, groups: int = 24) -> np.ndarray:
    return np.asarray(b).reshape(groups, -1)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def apply_rules(
    torch_sd: dict,
    variables: dict,
    rules: Sequence[tuple],
    strict: bool = True,
):
    """Apply (torch_key, ('params'|'batch_stats', *flax_path), transform)
    rules. Returns (new_variables, report)."""
    flat = {col: _flatten(variables.get(col, {})) for col in ("params", "batch_stats")}
    consumed = set()
    filled = {"params": {}, "batch_stats": {}}

    for torch_key, dest, transform in rules:
        col, *path = dest
        path = tuple(path)
        val = transform(torch_sd[torch_key]) if transform else np.asarray(torch_sd[torch_key])
        tgt = flat[col].get(path)
        if tgt is None:
            raise KeyError(f"no flax leaf {col}/{'/'.join(path)}")
        if tuple(tgt.shape) != tuple(val.shape):
            raise ValueError(f"{torch_key} -> {path}: shape {val.shape} vs {tgt.shape}")
        filled[col][path] = val.astype(np.float32)
        consumed.add(torch_key)

    report = {
        "unconsumed_torch_keys": [
            k for k in torch_sd if k not in consumed and "num_batches_tracked" not in k
        ],
        "unfilled_params": [p for p in flat["params"] if p not in filled["params"]],
    }
    if strict and report["unfilled_params"]:
        raise ValueError(f"conversion incomplete: {report['unfilled_params'][:5]}...")

    out = {}
    for col in ("params", "batch_stats"):
        merged = dict(flat[col])
        merged.update(filled[col])
        out[col] = _unflatten(merged)
    return out, report


def bn_rules(torch_prefix: str, flax_path: tuple) -> list:
    """Rules for one BatchNorm (params scale/bias + stats mean/var)."""
    return [
        (f"{torch_prefix}.weight", ("params",) + flax_path + ("scale",), np.asarray),
        (f"{torch_prefix}.bias", ("params",) + flax_path + ("bias",), np.asarray),
        (f"{torch_prefix}.running_mean", ("batch_stats",) + flax_path + ("mean",), np.asarray),
        (f"{torch_prefix}.running_var", ("batch_stats",) + flax_path + ("var",), np.asarray),
    ]


def conv_rules(torch_prefix: str, flax_path: tuple, bias: bool = False) -> list:
    r = [(f"{torch_prefix}.weight", ("params",) + flax_path + ("kernel",), convert_conv)]
    if bias:
        r.append((f"{torch_prefix}.bias", ("params",) + flax_path + ("bias",), np.asarray))
    return r
