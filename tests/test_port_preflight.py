"""Released-checkpoint preflight (r3 VERDICT missing #1 / next #4).

The real `danet_model_h36m_itw.pt` can't be fetched here, so the preflight
is proven on a synthesized shape-correct state_dict: a clean file is GO,
and each corruption class (missing key, foreign key, reshaped tensor) is
NO-GO with the right category populated. Reference anchor: README.md:94-107,
eval.py:322-335.
"""

import json

import numpy as np
import pytest
import torch

from danet_densepose2smpl_tpu.cli import port as cli_port
from danet_densepose2smpl_tpu.core.config import load_config
from danet_densepose2smpl_tpu.port.danet_map import (
    danet_rules,
    expected_torch_shapes,
    synthesize_torch_state_dict,
)
from danet_densepose2smpl_tpu.port.preflight import format_report, preflight_report


class _Args:
    regressor = "danet"


@pytest.fixture(scope="module")
def tiny():
    cfg = load_config(None, overrides={"danet.iuv_regressor": "resnet",
                                       "danet.msres_num_layers": 18})
    variables = cli_port._shape_template(_Args(), cfg)
    rules = danet_rules(cfg.danet)
    sd = synthesize_torch_state_dict(rules, variables)
    return cfg, variables, rules, sd


def test_clean_checkpoint_is_go(tiny):
    _, variables, rules, sd = tiny
    report = preflight_report(sd, rules, variables)
    assert report["ok"], format_report(report)
    assert not report["missing_torch_keys"]
    assert not report["shape_mismatches"]
    assert not report["unmapped_torch_keys"]
    assert not report["unfilled_flax_leaves"]
    assert "GO" in format_report(report)


def test_manifest_matches_synthesized_shapes(tiny):
    _, variables, rules, sd = tiny
    manifest = expected_torch_shapes(rules, variables)
    assert set(manifest) == set(sd)
    for k, shape in manifest.items():
        assert tuple(shape) == sd[k].shape, k


def test_corruptions_are_categorized(tiny):
    _, variables, rules, sd = tiny
    bad = dict(sd)
    dropped = "img2iuv.learned_ratio"
    del bad[dropped]
    bad["totally.foreign.weight"] = np.zeros((3, 3), np.float32)
    reshaped = "iuv2smpl.smpl_para_Outs.body_net.0.weight"
    bad[reshaped] = np.zeros((1, 2, 3, 4), np.float32)
    # ignorable keys a real released file carries
    bad["iuv2smpl.smpl.v_template"] = np.zeros((10, 3), np.float32)
    bad["img2iuv.iuv_est.bn1.num_batches_tracked"] = np.zeros((), np.int64)

    report = preflight_report(bad, rules, variables)
    assert not report["ok"]
    assert dropped in report["missing_torch_keys"]
    assert "totally.foreign.weight" in report["unmapped_torch_keys"]
    assert any(m["torch_key"] == reshaped for m in report["shape_mismatches"])
    # the dropped + mis-shaped tensors leave their flax leaves unfilled
    assert any("stn_ratio" in leaf for leaf in report["unfilled_flax_leaves"])
    assert len(report["unmapped_ignorable"]) == 2
    assert "NO-GO" in format_report(report)


def test_cli_check_roundtrip(tiny, tmp_path, capsys):
    _, _, _, sd = tiny
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text("DANET:\n  IUV_REGRESSOR: resnet\n  MSRES_NUM_LAYERS: 18\n")

    pt = tmp_path / "clean.pt"
    torch.save({"model": {("module." + k): torch.from_numpy(v) for k, v in sd.items()}}, pt)
    manifest_path = tmp_path / "manifest.json"
    rc = cli_port.main(["--check", str(pt), "--cfg", str(cfg_yaml),
                        "--manifest", str(manifest_path)])
    out = capsys.readouterr().out
    assert rc == 0 and "GO" in out
    manifest = json.loads(manifest_path.read_text())
    assert set(manifest) == set(sd)

    bad = dict(sd)
    del bad["img2iuv.learned_ratio"]
    pt_bad = tmp_path / "bad.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in bad.items()}}, pt_bad)
    rc = cli_port.main(["--check", str(pt_bad), "--cfg", str(cfg_yaml), "--json"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 1 and not report["ok"]
    assert "img2iuv.learned_ratio" in report["missing_torch_keys"]
