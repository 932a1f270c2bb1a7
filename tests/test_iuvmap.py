import numpy as np
import jax.numpy as jnp

from danet_densepose2smpl_tpu.constants import ANN_CHANNELS, IUV_CHANNELS, INDEX2ANN_GROUPS
from danet_densepose2smpl_tpu.ops import iuvmap_clean, iuv_img2map, iuv_map2img


def random_iuv_image(rng, b=2, s=16):
    part = rng.randint(0, 25, (b, s, s)).astype(np.float32)
    u = rng.rand(b, s, s).astype(np.float32)
    v = rng.rand(b, s, s).astype(np.float32)
    img = np.stack([part / 24.0, u, v], axis=-1)
    # Background pixels carry no UV by convention.
    img[..., 1] *= part > 0
    img[..., 2] *= part > 0
    return img, part.astype(np.int32)


def test_img2map_onehot(rng):
    img, part = random_iuv_image(rng)
    u, v, idx, ann = (np.asarray(x) for x in iuv_img2map(jnp.asarray(img)))
    assert idx.shape[-1] == IUV_CHANNELS and ann.shape[-1] == ANN_CHANNELS
    np.testing.assert_allclose(idx.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_array_equal(idx.argmax(-1), part)
    # Ann grouping: each patch maps to its configured coarse part.
    for ann_ch, patches in enumerate(INDEX2ANN_GROUPS):
        mask = np.isin(part, patches)
        np.testing.assert_allclose(ann[..., ann_ch], mask.astype(np.float32), atol=1e-6)
    # U values appear on the winning channel only.
    np.testing.assert_allclose((u * idx).sum(-1), img[..., 1], atol=1e-6)
    np.testing.assert_allclose((u * (1 - idx)).sum(-1), 0.0, atol=1e-6)


def test_img_map_roundtrip(rng):
    img, _ = random_iuv_image(rng)
    u, v, idx, ann = iuv_img2map(jnp.asarray(img))
    img2 = np.asarray(iuv_map2img(u, v, idx, ann))
    np.testing.assert_allclose(img2, img, atol=1e-5)


def test_iuvmap_clean_is_onehot_argmax(rng):
    b, s = 2, 8
    logits = rng.randn(b, s, s, IUV_CHANNELS).astype(np.float32)
    ann_logits = rng.randn(b, s, s, ANN_CHANNELS).astype(np.float32)
    u_in = rng.rand(b, s, s, IUV_CHANNELS).astype(np.float32)
    v_in = rng.rand(b, s, s, IUV_CHANNELS).astype(np.float32)

    u, v, idx, ann = (
        np.asarray(x)
        for x in iuvmap_clean(jnp.asarray(u_in), jnp.asarray(v_in), jnp.asarray(logits), jnp.asarray(ann_logits))
    )
    np.testing.assert_array_equal(idx.argmax(-1), logits.argmax(-1))
    np.testing.assert_allclose(idx.sum(-1), 1.0)
    np.testing.assert_array_equal(ann.argmax(-1), ann_logits.argmax(-1))
    sel = logits.argmax(-1)
    np.testing.assert_allclose(u.sum(-1), np.take_along_axis(u_in, sel[..., None], -1)[..., 0], atol=1e-6)


def test_map2img_background_via_ann(rng):
    """Pixels whose ann argmax is background are forced to background."""
    b, s = 1, 4
    idx = np.zeros((b, s, s, IUV_CHANNELS), dtype=np.float32)
    idx[..., 5] = 1.0  # every pixel claims patch 5
    u = np.ones_like(idx) * 0.7
    v = np.ones_like(idx) * 0.3
    ann = np.zeros((b, s, s, ANN_CHANNELS), dtype=np.float32)
    ann[..., 0] = 1.0  # but ann says background everywhere
    img = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx), jnp.asarray(ann)))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)


def test_map2img_ind_mapping(rng):
    """Partial 7-channel stacks remap local channel ids via a lookup."""
    mapping = [0, 7, 8, 9, 10, 1, 2]
    b, s, k = 1, 4, 7
    idx = np.zeros((b, s, s, k), dtype=np.float32)
    idx[..., 3] = 1.0
    u = np.full((b, s, s, k), 0.5, dtype=np.float32)
    v = np.full((b, s, s, k), 0.25, dtype=np.float32)
    img = np.asarray(iuv_map2img(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx), ind_mapping=mapping))
    np.testing.assert_allclose(img[..., 0], mapping[3] / 24.0, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 0.5, atol=1e-6)
