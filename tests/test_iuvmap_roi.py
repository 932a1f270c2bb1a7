"""roi-aspect-fit variants of the IUV codec vs a torch oracle.

The reference's `iuv_map2img(..., uv_rois)` / `iuv_img2map(..., uv_rois,
new_size)` paths (reference utils/iuvmap.py:72-99,150-209) are per-sample
`F.interpolate(mode='nearest')` + pad/slice loops; ours is one batched
separable integer gather. The oracle below transcribes the reference loops
with torch. Nearest-resize boundary note: torch evaluates
`floor(dst * in/out)` with an f64 scale, which lands one pixel low whenever
`dst*in` is an exact multiple of `out` whose f64 quotient rounds down
(56/20 = 2.8 -> 5*2.8 = 13.999..). Our integer rule has no such artifact, so
the comparison (a) requires exact equality on every sample whose torch
source-index vectors agree with the exact-integer ones, and (b) for the
rest, checks every divergent index is exactly the documented off-by-one.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from danet_densepose2smpl_tpu.ops import iuv_img2map, iuv_map2img  # noqa: E402
from danet_densepose2smpl_tpu.ops.iuvmap import _roi_aspect_sizes  # noqa: E402


def random_rois(rng, b, lo=20.0, hi=300.0):
    x1 = rng.uniform(0, 50, b)
    y1 = rng.uniform(0, 50, b)
    w = rng.uniform(lo, hi, b)
    h = rng.uniform(lo, hi, b)
    return np.stack([np.arange(b), x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def torch_sizes(roi, size):
    """Reference utils/iuvmap.py:82-96 size rule (python f64 aspect)."""
    w, h = float(roi[3] - roi[1]), float(roi[4] - roi[2])
    aspect = w / h
    if aspect < 1:
        return size, max(int(size * aspect), 1)
    return max(int(size / aspect), 1), size


def torch_map2img_roi(img_bchw, rois, size):
    """Transcription of reference utils/iuvmap.py:72-99 (squish + pad)."""
    outs = []
    for i in range(img_bchw.shape[0]):
        new_h, new_w = torch_sizes(rois[i], size)
        out = F.interpolate(img_bchw[i : i + 1], size=[new_h, new_w], mode="nearest")
        if new_w < size:
            pad_l = int(0.5 * (size - new_w))
            out = F.pad(out, pad=(pad_l, size - new_w - pad_l, 0, 0))
        else:
            pad_t = int(0.5 * (size - new_h))
            out = F.pad(out, pad=(0, 0, pad_t, size - new_h - pad_t))
        outs.append(out)
    return torch.cat(outs, dim=0)


def torch_img2map_roi(maps_bchw, rois, size, out_size):
    """Transcription of reference utils/iuvmap.py:162-199 (crop + upsample)."""
    outs = []
    for i in range(maps_bchw.shape[0]):
        new_h, new_w = torch_sizes(rois[i], size)
        mh, mw = (size - new_h) // 2, (size - new_w) // 2
        crop = maps_bchw[i : i + 1, :, mh : mh + new_h, mw : mw + new_w]
        outs.append(F.interpolate(crop, size=(out_size, out_size), mode="nearest"))
    return torch.cat(outs, dim=0)


def exact_and_torch_indices(n_in, n_out):
    """(exact integer, torch-f64) nearest source indices for a 1D resize."""
    dst = np.arange(n_out)
    exact = dst * n_in // n_out
    scale = np.float64(n_in) / np.float64(n_out)
    torch_idx = np.floor(dst * scale).astype(np.int64)
    return exact, np.minimum(torch_idx, n_in - 1)


def sample_agrees(roi, size, out_size):
    """True when torch's f64 resize indices match the exact-integer rule for
    this sample (both axes, both directions used by the two codecs)."""
    new_h, new_w = torch_sizes(roi, size)
    for n_in, n_out in [(size, new_h), (size, new_w), (new_h, out_size), (new_w, out_size)]:
        exact, tor = exact_and_torch_indices(n_in, n_out)
        if not np.array_equal(exact, tor):
            return False
    return True


def divergences_are_off_by_one(size, out_size, rois):
    for roi in rois:
        new_h, new_w = torch_sizes(roi, size)
        for n_in, n_out in [(size, new_h), (size, new_w), (new_h, out_size), (new_w, out_size)]:
            exact, tor = exact_and_torch_indices(n_in, n_out)
            diff = np.abs(exact - tor)
            assert diff.max() <= 1, (n_in, n_out, diff.max())


def test_roi_sizes_match_reference_rule(rng):
    size = 56
    rois = random_rois(rng, 64)
    new_h, new_w = (np.asarray(a) for a in _roi_aspect_sizes(jnp.asarray(rois), size))
    for i, roi in enumerate(rois):
        th, tw = torch_sizes(roi, size)
        assert (new_h[i], new_w[i]) == (th, tw), (i, roi)


def test_map2img_roi_vs_torch(rng):
    b, s = 24, 56
    rois = random_rois(rng, b)
    part = rng.randint(0, 25, (b, s, s)).astype(np.int64)
    u = rng.rand(b, s, s, 25).astype(np.float32)
    v = rng.rand(b, s, s, 25).astype(np.float32)
    idx = np.eye(25, dtype=np.float32)[part] * 10.0  # decisive argmax

    ours = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
                                  uv_rois=jnp.asarray(rois)))
    # Oracle: build the reference's pre-squish image from our (verified
    # elsewhere) no-roi path, then squish with the transcribed torch loop.
    base = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx)))
    oracle = torch_map2img_roi(
        torch.from_numpy(np.moveaxis(base, -1, 1)), rois, s).numpy()
    oracle = np.moveaxis(oracle, 1, -1)

    agree = [sample_agrees(roi, s, s) for roi in rois]
    assert sum(agree) >= b // 2, "test vacuous: too few boundary-free samples"
    for i in range(b):
        if agree[i]:
            np.testing.assert_array_equal(ours[i], oracle[i], err_msg=f"sample {i}")
    divergences_are_off_by_one(s, s, rois)


def test_img2map_roi_vs_torch(rng):
    b, s, m = 24, 56, 64
    rois = random_rois(rng, b)
    part = rng.randint(0, 25, (b, s, s)).astype(np.float32)
    img = np.stack([part / 24.0, rng.rand(b, s, s), rng.rand(b, s, s)], -1).astype(np.float32)

    ours = [np.asarray(x) for x in iuv_img2map(jnp.asarray(img), uv_rois=jnp.asarray(rois),
                                               new_size=m)]
    base = [np.asarray(x) for x in iuv_img2map(jnp.asarray(img))]
    agree = [sample_agrees(roi, s, m) for roi in rois]
    assert sum(agree) >= b // 2, "test vacuous: too few boundary-free samples"
    for ours_stack, base_stack in zip(ours, base):
        oracle = torch_img2map_roi(
            torch.from_numpy(np.moveaxis(base_stack, -1, 1)), rois, s, m).numpy()
        oracle = np.moveaxis(oracle, 1, -1)
        for i in range(b):
            if agree[i]:
                np.testing.assert_array_equal(ours_stack[i], oracle[i], err_msg=f"sample {i}")
    divergences_are_off_by_one(s, m, rois)


def test_map2img_roi_square_roi_is_identity(rng):
    """aspect == 1 squishes nothing: the roi path must equal the plain path."""
    b, s = 4, 32
    w = rng.uniform(50, 200, b).astype(np.float32)
    rois = np.stack([np.arange(b), np.zeros(b), np.zeros(b), w, w], 1).astype(np.float32)
    part = rng.randint(0, 25, (b, s, s)).astype(np.int64)
    u = rng.rand(b, s, s, 25).astype(np.float32)
    v = rng.rand(b, s, s, 25).astype(np.float32)
    idx = np.eye(25, dtype=np.float32)[part]
    plain = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx)))
    roi = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
                                 uv_rois=jnp.asarray(rois)))
    np.testing.assert_array_equal(plain, roi)
    # And img2map with new_size == input size round-trips exactly too.
    img = plain
    a = [np.asarray(x) for x in iuv_img2map(jnp.asarray(img))]
    b_ = [np.asarray(x) for x in iuv_img2map(jnp.asarray(img), uv_rois=jnp.asarray(rois))]
    for x, y in zip(a, b_):
        np.testing.assert_array_equal(x, y)
