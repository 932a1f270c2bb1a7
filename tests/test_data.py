import numpy as np
import pytest

from danet_densepose2smpl_tpu.data.dataset import NpzDataset
from danet_densepose2smpl_tpu.data.loader import ResumableLoader
from danet_densepose2smpl_tpu.data.mixed import MixedDataset
from danet_densepose2smpl_tpu.data.rle import (
    compress_counts,
    decode_rle,
    decode_dp_masks,
    encode_rle,
    _uncompress_counts,
)
from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset
from danet_densepose2smpl_tpu.data.transforms import crop, get_transform, transform_points, uncrop


# ------------------------------ RLE ------------------------------------


def test_rle_roundtrip(rng):
    mask = (rng.rand(64, 48) > 0.7).astype(np.uint8)
    rle = encode_rle(mask)
    np.testing.assert_array_equal(decode_rle(rle), mask)


def test_rle_compressed_roundtrip(rng):
    mask = (rng.rand(31, 17) > 0.5).astype(np.uint8)
    rle = encode_rle(mask)
    compressed = compress_counts(rle["counts"])
    counts2 = _uncompress_counts(compressed)
    assert counts2 == list(rle["counts"])
    np.testing.assert_array_equal(decode_rle({"size": rle["size"], "counts": compressed}), mask)


def test_decode_dp_masks(rng):
    masks = []
    for p in range(14):
        m = np.zeros((256, 256), np.uint8)
        m[p * 10 : p * 10 + 10, :20] = 1
        masks.append(encode_rle(m))
    label = decode_dp_masks(masks)
    assert label.shape == (256, 256)
    for p in range(14):
        assert (label[p * 10 : p * 10 + 10, :20] == p + 1).all()


# ------------------------------ transforms ------------------------------


def test_crop_uncrop_inverse(rng):
    # smooth image: resampling round trip must approximately invert
    yy, xx = np.mgrid[0:200, 0:180]
    img = np.stack([yy, xx, yy + xx], -1).astype(np.float32) % 255
    center, scale = np.array([90.0, 100.0]), 0.9
    c = crop(img, center, scale, (64, 64))
    assert c.shape == (64, 64, 3)
    # the original center pixel value appears at the crop center
    np.testing.assert_allclose(c[32, 32], img[100, 90], atol=3)
    back = uncrop(c.astype(np.uint8), center, scale, (200, 180, 3))
    ys, xs = slice(40, 160), slice(20, 160)
    corr = np.corrcoef(back[ys, xs].reshape(-1), img[ys, xs].reshape(-1).astype(np.uint8))[0, 1]
    assert corr > 0.95, corr


def test_transform_points_center_maps_to_middle():
    center, scale, res = np.array([50.0, 60.0]), 0.5, (64, 64)
    out = transform_points(np.array([[51.0, 61.0]]), center, scale, res)
    np.testing.assert_allclose(out[0], [33, 33], atol=1.5)


def test_get_transform_rotation_keeps_center():
    center, scale, res = np.array([30.0, 40.0]), 0.4, (64, 64)
    t = get_transform(center, scale, res, rot=37.0)
    p = t @ np.array([30.0, 40.0, 1.0])
    np.testing.assert_allclose(p[:2], [32, 32], atol=1e-6)


# ------------------------------ dataset ------------------------------


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_ds")
    npz, img_dir = write_synthetic_dataset(str(d), n=12, with_dp=True)
    return npz, img_dir


def test_dataset_item_contract(ds_dir):
    npz, img_dir = ds_dir
    ds = NpzDataset(npz, img_dir, name="synth", is_train=True)
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["img"].shape == (224, 224, 3)
    assert item["keypoints"].shape == (49, 3)
    assert item["pose"].shape == (72,)
    assert item["pose_3d"].shape == (24, 4)
    assert item["dp_dict"]["u_points"].shape == (25, 196)
    assert item["dp_dict"]["ann_labels"].shape == (56, 56)
    assert np.abs(item["keypoints"][:, :2]).max() <= 3.0
    # dp sample: rotation forced to 0
    assert item["rot_angle"] == 0.0


def test_dataset_determinism(ds_dir):
    npz, img_dir = ds_dir
    ds = NpzDataset(npz, img_dir, is_train=True)
    a = ds.__getitem__(3, rng=np.random.RandomState(7))
    b = ds.__getitem__(3, rng=np.random.RandomState(7))
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])


def test_dataset_eval_mode_no_augment(ds_dir):
    npz, img_dir = ds_dir
    ds = NpzDataset(npz, img_dir, is_train=False)
    a = ds.__getitem__(1, rng=np.random.RandomState(1))
    b = ds.__getitem__(1, rng=np.random.RandomState(99))
    np.testing.assert_array_equal(a["img"], b["img"])
    assert a["is_flipped"] == 0 and a["rot_angle"] == 0


def test_loader_resume_and_sharding(ds_dir):
    npz, img_dir = ds_dir
    ds = NpzDataset(npz, img_dir, is_train=True)
    loader = ResumableLoader(ds, batch_size=4, seed=5)
    full = list(loader.epoch(epoch=0))
    assert len(full) == 3
    assert full[0][1]["img"].shape == (4, 224, 224, 3)

    resumed = list(loader.epoch(epoch=0, start_batch=2))
    assert len(resumed) == 1
    np.testing.assert_array_equal(resumed[0][1]["img"], full[2][1]["img"])

    # two-shard loaders jointly reproduce the unsharded batch
    sh0 = ResumableLoader(ds, batch_size=4, seed=5, shard_id=0, num_shards=2)
    sh1 = ResumableLoader(ds, batch_size=4, seed=5, shard_id=1, num_shards=2)
    b0 = next(iter(sh0.epoch(0)))[1]
    b1 = next(iter(sh1.epoch(0)))[1]
    assert b0["img"].shape == (2, 224, 224, 3)
    ref = full[0][1]["sample_index"]
    got = np.concatenate([b0["sample_index"], b1["sample_index"]])
    np.testing.assert_array_equal(got, ref)


def test_mixed_dataset_partition(ds_dir):
    npz, img_dir = ds_dir
    a = NpzDataset(npz, img_dir, name="a", is_train=True)
    b = NpzDataset(npz, img_dir, name="b", is_train=True)
    mixed = MixedDataset({"a": a, "b": b}, {"a": 0.8, "b": 0.2})
    counts = {0: 0, 1: 0}
    for i in range(200):
        item = mixed.__getitem__(i % len(mixed), rng=np.random.RandomState(i))
        counts[int(item["dataset_idx"])] += 1
    assert counts[0] > 120 and counts[1] > 10


def test_native_rle_matches_numpy(rng):
    """C++ codec (when the toolchain exists) agrees with the numpy impl."""
    from danet_densepose2smpl_tpu.native import rle_bindings as nb

    if not nb.available():
        import pytest

        pytest.skip("no C++ toolchain")
    for shape in [(64, 48), (256, 256), (31, 17)]:
        mask = (rng.rand(*shape) > 0.6).astype(np.uint8)
        rle = encode_rle(mask)
        native = nb.decode_rle_native(rle)
        np.testing.assert_array_equal(native, mask)
        rle_n = nb.encode_rle_native(mask)
        assert rle_n["counts"] == list(rle["counts"])
        # compressed string path
        comp = {"size": rle["size"], "counts": compress_counts(rle["counts"])}
        np.testing.assert_array_equal(nb.decode_rle_native(comp), mask)

    masks = []
    for p in range(14):
        m = np.zeros((256, 256), np.uint8)
        m[p * 8 : p * 8 + 30, 10:200] = 1
        masks.append(encode_rle(m))
    np.testing.assert_array_equal(nb.decode_dp_masks_native(masks), decode_dp_masks(masks))


def test_device_preprocess_matches_host_crop(rng):
    """The jitted device crop must match the host cv2 crop (bilinear)."""
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD
    from danet_densepose2smpl_tpu.data.pipeline import device_preprocess

    yy, xx = np.mgrid[0:180, 0:160]
    img = np.stack([yy, xx, (yy + xx) * 0.7], -1).astype(np.uint8)  # smooth, no wrap
    imgs = np.stack([img, img[::-1].copy()])
    centers = np.array([[80.0, 90.0], [70.0, 100.0]], np.float32)
    scales = np.array([0.6, 0.5], np.float32)

    got = np.asarray(device_preprocess(jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales), out_size=64))

    for i in range(2):
        ref = crop(imgs[i].astype(np.float32), centers[i], scales[i], (64, 64)) / 255.0
        ref = (ref - IMG_NORM_MEAN) / IMG_NORM_STD
        # interiors match to interpolation tolerance (borders differ by
        # padding convention)
        diff = np.abs(got[i, 2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert diff.max() < 0.1, diff.max()
        assert np.median(diff) < 0.01


def test_device_preprocess_train_matches_host(rng):
    """device_preprocess_train (crop+rot+flip+noise+normalize, one jitted
    program) is the bilinear twin of the host training image path
    (reference base_dataset.py:145-158,244-251)."""
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD
    from danet_densepose2smpl_tpu.data.pipeline import device_preprocess_train
    from danet_densepose2smpl_tpu.data.transforms import flip_img

    yy, xx = np.mgrid[0:180, 0:160]
    img = np.stack([yy, xx, (yy + xx) * 0.7], -1).astype(np.uint8)  # smooth
    imgs = np.stack([img, img[::-1].copy(), img[:, ::-1].copy()])
    centers = np.array([[80.0, 90.0], [70.0, 100.0], [75.0, 95.0]], np.float32)
    scales = np.array([0.55, 0.45, 0.5], np.float32)
    rots = np.array([0.0, 25.0, -40.0], np.float32)
    flips = np.array([0.0, 1.0, 1.0], np.float32)
    pn = rng.uniform(0.7, 1.3, (3, 3)).astype(np.float32)

    got = np.asarray(
        device_preprocess_train(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales),
            jnp.asarray(rots), jnp.asarray(flips), jnp.asarray(pn), out_size=64,
        )
    )

    for i in range(3):
        ref = crop(imgs[i].astype(np.float32), centers[i], scales[i], (64, 64),
                   rot=float(rots[i]))
        if flips[i]:
            ref = flip_img(ref)
        ref = np.clip(ref * pn[i], 0, 255) / 255.0
        ref = (ref - IMG_NORM_MEAN) / IMG_NORM_STD
        diff = np.abs(got[i, 2:-2, 2:-2] - ref[2:-2, 2:-2])
        # residual is cv2's 5-bit fixed-point interpolation; the affine
        # itself is exact (crop_thetas inverts get_transform analytically)
        assert np.median(diff) < 0.005, np.median(diff)
        assert np.percentile(diff, 95) < 0.01, np.percentile(diff, 95)
        assert diff.max() < 0.05, diff.max()


def test_prefetch_loader_identical_batches(tmp_path):
    """PrefetchLoader must yield byte-identical batches in the same order as
    the synchronous ResumableLoader (same per-sample RNG derivation)."""
    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import PrefetchLoader, ResumableLoader
    from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset

    npz, img_dir = write_synthetic_dataset(str(tmp_path), n=10)
    ds = NpzDataset(npz, img_dir, name="synth", is_train=True, heatmap_size=16)
    base = ResumableLoader(ds, 4, seed=3, shuffle=True, drop_last=False)
    pre = PrefetchLoader(ResumableLoader(ds, 4, seed=3, shuffle=True, drop_last=False),
                         depth=2, workers=3)

    got = list(pre.epoch(1))
    exp = list(base.epoch(1))
    assert [b for b, _ in got] == [b for b, _ in exp]
    for (_, g), (_, e) in zip(got, exp):
        for k in e:
            if isinstance(e[k], dict):
                for kk in e[k]:
                    np.testing.assert_array_equal(g[k][kk], e[k][kk])
            elif isinstance(e[k], list):
                assert g[k] == e[k]
            else:
                np.testing.assert_array_equal(g[k], e[k])
    # early-abort path shuts the producer down cleanly
    it = pre.epoch(0)
    next(it)
    it.close()


def test_eval_harness_device_preprocess_path(tmp_path):
    """run_pose_eval(device_preprocess=True) consumes raw frames and matches
    the host-crop path closely (bilinear crop twins)."""
    import jax.numpy as jnp

    from danet_densepose2smpl_tpu.data.dataset import NpzDataset
    from danet_densepose2smpl_tpu.data.loader import ResumableLoader
    from danet_densepose2smpl_tpu.data.synthetic import write_synthetic_dataset
    from danet_densepose2smpl_tpu.eval import run_pose_eval
    from danet_densepose2smpl_tpu.eval.harness import synthetic_h36m_regressor
    from danet_densepose2smpl_tpu.ops.rotations import batch_rodrigues
    from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model

    npz, img_dir = write_synthetic_dataset(str(tmp_path), n=6)
    smpl = synthetic_smpl_model(num_verts=300, seed=0)
    jreg = synthetic_h36m_regressor(300, seed=1)

    def run(raw):
        ds = NpzDataset(npz, img_dir, name="h36m-p2", is_train=False,
                        heatmap_size=16, return_raw=raw)
        loader = ResumableLoader(ds, 3, shuffle=False, drop_last=False)
        # infer depends on the (preprocessed) images so the pipeline is live
        def infer_fn(img):
            b = img.shape[0]
            cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (b, 1))
            betas = jnp.tile(jnp.mean(img, axis=(1, 2, 3))[:, None] * 1e-3, (1, 10))
            rot = jnp.tile(jnp.eye(3).reshape(1, 9), (b, 24)).reshape(b, 216)
            return jnp.concatenate([cam, betas, rot], axis=1)

        return run_pose_eval(infer_fn, loader.epoch(0), "h36m-p2", smpl, jreg,
                             log_every=0, device_preprocess=raw)

    host = run(False)
    dev = run(True)
    assert np.isfinite(dev.mpjpe).all()
    np.testing.assert_allclose(dev.mpjpe, host.mpjpe, atol=5e-4)
