"""Tests for the offline DP-COCO converter, DensePose symmetry machinery,
and the barycentric surface lookup."""

import json

import numpy as np
import pytest

from danet_densepose2smpl_tpu.data.preprocess import db_coco_extract, kp_coco2smpl
from danet_densepose2smpl_tpu.data.rle import encode_rle
from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
from danet_densepose2smpl_tpu.smpl.densepose_atlas import synthetic_densepose_atlas
from danet_densepose2smpl_tpu.smpl.densepose_methods import (
    INDEX_SYMMETRY,
    fbc_to_surface,
    get_symmetric_densepose,
    iuv_to_face_bc,
    synthetic_uv_symmetry,
)


def test_kp_coco2smpl_rules():
    kps = np.zeros((17, 3))
    kps[:, 2] = 2  # all visible
    kps[:, 0] = np.arange(17) * 10.0
    kps[:, 1] = np.arange(17) * 5.0
    out = kp_coco2smpl(kps)
    # direct limb mapping: smpl l_hip(1) <- coco 11 with conf/2
    np.testing.assert_allclose(out[1, :2], kps[11, :2])
    assert out[1, 2] == 1.0  # vis 2 / 2
    # pelvis = mid-hip at conf .5
    np.testing.assert_allclose(out[0, :2], kps[[11, 12], :2].mean(0))
    assert out[0, 2] == 0.5
    # hands copy wrists
    np.testing.assert_allclose(out[22, :2], out[20, :2])
    # partial visibility: no shoulders -> no neck/head chain
    kps2 = kps.copy()
    kps2[[5, 6], 2] = 0
    out2 = kp_coco2smpl(kps2)
    assert out2[12, 2] == 0 and out2[15, 2] == 0 and out2[6, 2] == 0


def test_db_coco_extract(tmp_path, rng):
    mask = np.zeros((256, 256), np.uint8)
    mask[50:200, 50:200] = 1
    ann = {
        "image_id": 1,
        "num_keypoints": 10,
        "bbox": [20.0, 30.0, 100.0, 150.0],
        "keypoints": (rng.rand(17, 3) * [[200, 200, 2]]).astype(np.float64).reshape(-1).tolist(),
        "dp_masks": [encode_rle(mask)] * 14,
        "dp_I": [1.0, 2.0], "dp_U": [0.2, 0.4], "dp_V": [0.3, 0.5],
        "dp_x": [100.0, 120.0], "dp_y": [90.0, 100.0],
    }
    db = {
        "images": [{"id": 1, "file_name": "img1.jpg"}],
        "annotations": [ann, {"image_id": 1, "num_keypoints": 0, "bbox": [0, 0, 1, 1]}],
    }
    p = tmp_path / "dp.json"
    p.write_text(json.dumps(db))
    out = str(tmp_path / "dp.npz")
    n = db_coco_extract(str(p), out, img_prefix="train2014")
    assert n == 1
    d = np.load(out, allow_pickle=True)
    assert d["imgname"][0] == "train2014/img1.jpg"
    np.testing.assert_allclose(d["center"][0], [70, 105])
    # reference dp_coco.py:15,66: scale = 1.2 * max(w, h) / 200
    np.testing.assert_allclose(d["scale"][0], 1.2 * 150.0 / 200.0)
    assert d["smpl_2dkps"].shape == (1, 24, 3)
    assert d["dp_annot"][0]["dp_I"] == [1.0, 2.0]
    assert d["im_id"][0] == 1
    # COCO-17 kps land at the GT-24 indices of dp_coco.py:12 (joints_idx),
    # visibility binarized — NOT at slots 0..16
    from danet_densepose2smpl_tpu.data.preprocess import COCO17_TO_GT24

    kps = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
    got = d["part"][0]
    np.testing.assert_allclose(got[list(COCO17_TO_GT24), :2], kps[:, :2])
    np.testing.assert_allclose(
        got[list(COCO17_TO_GT24), 2], (kps[:, 2] > 0).astype(np.float64)
    )
    untouched = sorted(set(range(24)) - set(COCO17_TO_GT24))
    np.testing.assert_array_equal(got[untouched], 0.0)


def _valid_dp_ann(aid=7, **over):
    mask = np.zeros((256, 256), np.uint8)
    mask[10:60, 10:60] = 1
    ann = {
        "id": aid,
        "image_id": 1,
        "iscrowd": 0,
        "bbox": [5.0, 5.0, 80.0, 120.0],
        "keypoints": [10.0, 12.0, 2.0] * 17,
        "dp_masks": [encode_rle(mask)] + [[]] * 13,
        "dp_I": [3.0, 4.0],
        "dp_U": [0.1, 0.9],
        "dp_V": [0.2, 0.8],
        "dp_x": [50.0, 60.0],
        "dp_y": [40.0, 70.0],
    }
    ann.update(over)
    return ann


def test_dp_coco_preflight(tmp_path):
    """Schema go/no-go for the real densepose json (r3 VERDICT missing #2):
    hard violations fail, handled quirks only warn/count."""
    from danet_densepose2smpl_tpu.data.preprocess import check_dp_coco_json
    from danet_densepose2smpl_tpu.data.rle import compress_counts

    comp_masks = [
        {"size": m["size"], "counts": compress_counts(m["counts"]).decode("ascii")}
        if m else []
        for m in _valid_dp_ann()["dp_masks"]
    ]
    db = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [
            _valid_dp_ann(1),
            _valid_dp_ann(2, dp_masks=comp_masks, iscrowd=1),
            {"id": 3, "image_id": 1, "bbox": [0, 0, 5, 5]},  # no dp -> skipped
            _valid_dp_ann(4, keypoints=None, dp_U=[0.1, 1.7]),  # warns, still GO
        ],
    }
    p = tmp_path / "ok.json"
    p.write_text(json.dumps(db))
    rep = check_dp_coco_json(str(p))
    assert rep["ok"], rep["errors"]
    s = rep["stats"]
    assert s["dp_annotations"] == 3 and s["annotations"] == 4
    assert s["crowd_with_dp"] == 1 and s["no_keypoints"] == 1
    assert s["rle_compressed"] == 1 and s["rle_uncompressed"] == 2
    assert any("dp_U" in w for w in rep["warnings"])

    # hard failures: ragged point lists, unresolvable image_id, missing dp_V
    bad = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [
            _valid_dp_ann(1, dp_x=[1.0]),
            _valid_dp_ann(2, image_id=99),
            {k: v for k, v in _valid_dp_ann(3).items() if k != "dp_V"},
        ],
    }
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps(bad))
    rep2 = check_dp_coco_json(str(p2))
    assert not rep2["ok"]
    text = " ".join(rep2["errors"])
    assert "ragged" in text and "not in images" in text and "dp_V" in text


def test_preprocess_cli_go_no_go(tmp_path, capsys):
    from danet_densepose2smpl_tpu.cli.preprocess import main as cli_main

    db = {"images": [{"id": 1, "file_name": "a.jpg"}],
          "annotations": [_valid_dp_ann(1)]}
    p = tmp_path / "dp.json"
    p.write_text(json.dumps(db))
    out = str(tmp_path / "dp.npz")
    assert cli_main(["--json", str(p), "--out", out]) == 0
    assert "GO" in capsys.readouterr().out
    assert np.load(out, allow_pickle=True)["imgname"].shape == (1,)

    bad = {"images": [{"id": 1, "file_name": "a.jpg"}],
           "annotations": [_valid_dp_ann(1, dp_x=[1.0])]}
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps(bad))
    assert cli_main(["--json", str(p2), "--check"]) == 1
    assert "NO-GO" in capsys.readouterr().out


def test_symmetric_densepose(rng):
    sym = synthetic_uv_symmetry()
    I = np.array([1.0, 2.0, 23.0])
    U = np.array([0.25, 0.5, 0.75])
    V = np.array([0.1, 0.2, 0.3])
    x = np.array([10.0, 100.0, 200.0])
    y = np.array([5.0, 50.0, 150.0])
    mask = np.zeros((256, 256), np.uint8)
    mask[:, :128] = 3  # a left-side part
    I2, U2, V2, x2, y2, m2 = get_symmetric_densepose(I, U, V, x, y, mask, sym)
    np.testing.assert_array_equal(I2, [INDEX_SYMMETRY[0], INDEX_SYMMETRY[1], INDEX_SYMMETRY[22]])
    np.testing.assert_allclose(U2, 1 - U, atol=2 / 255)  # synthetic mirror
    np.testing.assert_allclose(V2, V, atol=2 / 255)
    np.testing.assert_array_equal(x2, 256 - x)
    np.testing.assert_array_equal(y2, y)
    # mask: left part 3 -> right half, label swapped to 2
    assert (m2[:, 128:] == 2).all() and (m2[:, :128] == 0).all()
    # involution on indices
    np.testing.assert_array_equal(INDEX_SYMMETRY[INDEX_SYMMETRY - 1], np.arange(1, 25))


def test_iuv_surface_roundtrip(rng):
    model = synthetic_smpl_model(num_verts=300, seed=3)
    atlas = synthetic_densepose_atlas(model, seed=3)
    # pick a real face and its centroid UV; lookup must find a face of the
    # same patch whose surface point matches the barycentric combination
    f = 17
    patch = int(atlas.face_indices[f])
    u = float(atlas.u_norm[atlas.faces[f]].mean())
    v = float(atlas.v_norm[atlas.faces[f]].mean())
    face, b0, b1, b2 = iuv_to_face_bc(atlas, patch, u, v)
    assert atlas.face_indices[face] == patch
    np.testing.assert_allclose(b0 + b1 + b2, 1.0, atol=1e-6)
    verts = model.v_template
    p = fbc_to_surface(atlas, face, (b0, b1, b2), verts)
    assert p.shape == (3,)
    # the surface point lies within the face's bounding box
    corners = verts[atlas.vert_mapping[atlas.faces[face]]]
    assert (p >= corners.min(0) - 1e-6).all() and (p <= corners.max(0) + 1e-6).all()


# --- official UV symmetry table path ----------------------------------------


def _write_official_mat(path, rng):
    """Write a fixture .mat with the EXACT layout of the official
    `UV_symmetry_transforms.mat`: 1x24 MATLAB cell arrays `U_transforms` /
    `V_transforms` of 256x256 float64 lookup images (what scipy loads as
    object arrays indexed d['U_transforms'][0, i])."""
    from scipy.io import savemat

    u_cells = np.empty((1, 24), dtype=object)
    v_cells = np.empty((1, 24), dtype=object)
    for i in range(24):
        u_cells[0, i] = rng.rand(256, 256)
        v_cells[0, i] = rng.rand(256, 256)
    savemat(str(path), {"U_transforms": u_cells, "V_transforms": v_cells})
    return u_cells, v_cells


def test_official_table_flip_matches_reference_semantics(tmp_path, rng):
    """Byte-level oracle for reference densepose_methods.py:31-58: the flip
    through a loaded official-format table must equal direct per-point
    indexing U_transforms[patch-1][int(V*255), int(U*255)] with the patch
    and mask label swaps."""
    from danet_densepose2smpl_tpu.smpl.densepose_methods import (
        MASK_SYMMETRY,
        load_uv_symmetry,
    )

    mat = tmp_path / "UV_symmetry_transforms.mat"
    u_cells, v_cells = _write_official_mat(mat, rng)
    sym = load_uv_symmetry(str(mat))
    assert not sym.synthetic

    n = 64
    I = rng.randint(1, 25, n).astype(np.float64)
    U = np.concatenate([rng.rand(n - 2), [0.0, 1.0]])  # include both edges
    V = np.concatenate([rng.rand(n - 2), [1.0, 0.0]])
    x = rng.rand(n) * 255
    y = rng.rand(n) * 255
    mask = rng.randint(0, 15, (256, 256)).astype(np.uint8)

    I2, U2, V2, x2, y2, m2 = get_symmetric_densepose(I, U, V, x, y, mask, sym)

    # independent oracle, straight from the reference's algebra
    for k in range(n):
        patch = int(I[k])
        u_loc = int(U[k] * 255)
        v_loc = int(V[k] * 255)
        assert I2[k] == INDEX_SYMMETRY[patch - 1]
        np.testing.assert_allclose(U2[k], np.float32(u_cells[0, patch - 1][v_loc, u_loc]), rtol=1e-6)
        np.testing.assert_allclose(V2[k], np.float32(v_cells[0, patch - 1][v_loc, u_loc]), rtol=1e-6)
    np.testing.assert_array_equal(x2, 256 - x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(m2, MASK_SYMMETRY[np.fliplr(mask)])


def test_find_uv_symmetry_resolution(tmp_path, rng, monkeypatch):
    from danet_densepose2smpl_tpu.smpl import densepose_methods as dpm

    mat = tmp_path / "sym.mat"
    _write_official_mat(mat, rng)

    # explicit path wins
    assert dpm.find_uv_symmetry(str(mat)) is not None
    # explicit-but-missing is an error, not a silent None
    with pytest.raises(FileNotFoundError):
        dpm.find_uv_symmetry(str(tmp_path / "nope.mat"))
    # env var fallback
    monkeypatch.setenv("DANET_UV_SYMMETRY", str(mat))
    assert dpm.find_uv_symmetry() is not None
    # nothing anywhere -> None with a loud warning
    monkeypatch.delenv("DANET_UV_SYMMETRY")
    monkeypatch.chdir(tmp_path)
    with pytest.warns(UserWarning, match="NOT be flip-augmented"):
        assert dpm.find_uv_symmetry() is None


def test_synthetic_flip_is_loud(monkeypatch):
    from danet_densepose2smpl_tpu.smpl import densepose_methods as dpm

    sym = synthetic_uv_symmetry()
    assert sym.synthetic
    args = (np.array([1.0]), np.array([0.5]), np.array([0.5]),
            np.array([10.0]), np.array([10.0]), np.zeros((256, 256), np.uint8))

    monkeypatch.setattr(dpm, "_warned_synthetic_flip", False)
    with pytest.warns(UserWarning, match="chart-.?mirror"):
        get_symmetric_densepose(*args, sym)

    monkeypatch.setenv("DANET_STRICT_DP_SYMMETRY", "1")
    with pytest.raises(RuntimeError, match="refusing to flip"):
        get_symmetric_densepose(*args, sym)
