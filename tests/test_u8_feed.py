"""Transfer-thin u8 training feed: host/device color-affine equivalence.

The u8 feed ships raw resized pixels + a per-image folded
jitter+normalize affine (data/coco.color_affine) and applies it
in-graph (train.apply_color_affine) — 4x fewer bytes over the
host->device link than the f32 feed. These tests pin that the two
feeds are the same math.
"""

import random

import numpy as np
import pytest

from odtk_tpu.data.coco import (_color_jitter_normalize, color_affine,
                                _draw_jitter, _GRAY)
from odtk_tpu.train import apply_color_affine, make_optimizer, \
    make_train_step


def test_color_affine_matches_host_jitter_chain():
    """color_affine applied on-device == _color_jitter_normalize on the
    host, for the same jitter draws, including the contrast term's
    image-mean and the clip."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    img_u8 = (rng.rand(40, 56, 3) * 255).astype(np.uint8)

    random.seed(7)
    fb, fc, fs, fh = _draw_jitter(0.3, 0.3, 0.1, 0.3)
    mgray01 = float(
        img_u8.reshape(-1, 3).astype(np.float64).mean(0) @
        _GRAY.astype(np.float64)) / 255.0
    t, off = color_affine(fb, fc, fs, fh, mgray01)

    # host reference path on the float image, same draws
    random.seed(7)
    host = _color_jitter_normalize(img_u8.astype(np.float32),
                                   0.3, 0.3, 0.1, 0.3)

    colors = np.concatenate([t, off[:, None]], axis=1)[None]
    sizes = np.asarray([[40, 56]], np.float32)
    dev = np.asarray(apply_color_affine(
        jnp.asarray(img_u8[None]), jnp.asarray(colors),
        jnp.asarray(sizes)))[0]
    np.testing.assert_allclose(dev, host, atol=2e-3)


def test_apply_color_affine_masks_padding():
    import jax.numpy as jnp
    t, off = color_affine(1.0, 1.0, 1.0, 0.0, 0.0)
    colors = np.concatenate([t, off[:, None]], axis=1)[None]
    img = np.full((1, 8, 8, 3), 255, np.uint8)
    out = np.asarray(apply_color_affine(
        jnp.asarray(img), jnp.asarray(colors),
        jnp.asarray([[5, 6]], np.float32)))
    assert np.all(out[0, 5:] == 0) and np.all(out[0, :, 6:] == 0)
    # valid region: (255/255 - mean)/std, nonzero everywhere
    assert np.all(np.abs(out[0, :5, :6]) > 0.1)


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth import make_dataset
    root = tmp_path_factory.mktemp('u8feed')
    img_dir, ann = make_dataset(str(root), n_images=4, size=(100, 120),
                                fmt='jpg', seed=3)
    return img_dir, ann


def test_loader_u8_emit_matches_f32_feed(dataset):
    """Same seeds -> the u8 batch pushed through apply_color_affine
    equals the f32 batch (up to u8 rounding of the resize output)."""
    import jax.numpy as jnp
    from odtk_tpu.data.loader import DataIterator

    img_dir, ann = dataset
    kw = dict(resize=96, max_size=160, batch_size=4, stride=32, world=1,
              annotations=ann, training=True, max_det=8, seed=5,
              augment_brightness=0.05, augment_contrast=0.05,
              augment_hue=0.01, augment_saturation=0.05)
    it8 = DataIterator(img_dir, emit='u8', num_threads=1, **kw)
    it32 = DataIterator(img_dir, emit='f32', num_threads=1, **kw)

    random.seed(11)
    b8 = next(iter(it8))
    random.seed(11)
    b32 = next(iter(it32))

    assert b8[0].dtype == np.uint8 and len(b8) == 4
    assert b8[2].shape == (4, 3, 4) and b8[3].shape == (4, 2)
    np.testing.assert_array_equal(b8[1], b32[1])      # identical targets
    dev = np.asarray(apply_color_affine(
        jnp.asarray(b8[0]), jnp.asarray(b8[2]), jnp.asarray(b8[3])))
    # u8 resize rounds each pixel once before the affine: tolerance is
    # one quantization step through the steepest channel (~1/255/std)
    assert dev.shape == b32[0].shape
    np.testing.assert_allclose(dev, b32[0], atol=0.03)


def test_u8_train_step_matches_f32(dataset):
    """One optimizer step through the u8 graph == the f32 graph."""
    import jax
    import jax.numpy as jnp
    from odtk_tpu.data.loader import DataIterator
    from odtk_tpu.model import Model
    from odtk_tpu.parallel import make_mesh, shard_batch

    img_dir, ann = dataset
    kw = dict(resize=96, max_size=160, batch_size=2, stride=128, world=1,
              annotations=ann, training=True, max_det=8, seed=5)
    random.seed(3)
    b8 = next(iter(DataIterator(img_dir, emit='u8', num_threads=1, **kw)))
    random.seed(3)
    b32 = next(iter(DataIterator(img_dir, emit='f32', num_threads=1, **kw)))

    model = Model(backbones='ResNet18FPN', classes=3)
    model.initialize(rng=0, image_size=(128, 128))
    mesh = make_mesh(jax.devices()[:2])
    tx = make_optimizer(lr=0.01, warmup=10, milestones=[100], gamma=0.1)
    import jax
    # host numpy copies: the steps donate their params/opt args, and a
    # shared device array would be deleted by the first call
    params = jax.device_get(model.variables['params'])
    frozen = model.variables['frozen']

    step8 = make_train_step(model, tx, mesh, u8_feed=True)
    imgs, cols, szs, tg = shard_batch(mesh, b8[0], b8[2], b8[3], b8[1])
    p8, _, cl8, bl8 = step8(params, tx.init(params), frozen,
                            imgs, cols, szs, tg)
    step32 = make_train_step(model, tx, mesh)
    imgs32, tg32 = shard_batch(mesh, b32[0], b32[1])
    p32, _, cl32, bl32 = step32(params, tx.init(params), frozen,
                                imgs32, tg32)
    np.testing.assert_allclose(float(cl8), float(cl32), rtol=1e-3)
    np.testing.assert_allclose(float(bl8), float(bl32), rtol=1e-2)
    # parameters moved the same way
    la, lb = jax.tree.leaves(p8)[0], jax.tree.leaves(p32)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-4)


def test_yuv420_roundtrip_smooth_image():
    """RGB -> YUV420 -> device assembly -> RGB is near-exact on
    chroma-smooth content (the only loss is 2x2 chroma averaging)."""
    import jax.numpy as jnp
    from odtk_tpu.data.loader import rgb_to_yuv420, fold_yuv_affine
    from odtk_tpu.data.coco import color_affine, IMAGENET_MEAN, \
        IMAGENET_STD
    from odtk_tpu.train import apply_color_affine_yuv

    # smooth gradient image: chroma varies slowly
    h, w = 32, 48
    gy, gx = np.mgrid[0:h, 0:w]
    rgb = np.stack([gx * 3, gy * 4, (gx + gy)], axis=-1).astype(np.uint8)
    y, c = rgb_to_yuv420(rgb)
    assert y.shape == (h, w) and c.shape == (h // 2, w // 2, 2)

    t, off = color_affine(1.0, 1.0, 1.0, 0.0, 0.0)     # pure normalize
    colors = fold_yuv_affine(
        np.concatenate([t, off[:, None]], axis=1)[None])
    out = np.asarray(apply_color_affine_yuv(
        jnp.asarray(y[None]), jnp.asarray(c[None]), jnp.asarray(colors),
        jnp.asarray([[h, w]], np.float32)))[0]
    # undo normalization -> compare pixel values in [0,1]
    back = out * IMAGENET_STD + IMAGENET_MEAN
    want = rgb.astype(np.float32) / 255.0
    # nearest-upsampled 2x2-averaged chroma: worst case ~the local
    # chroma gradient (few/255 here) plus u8 rounding
    assert np.abs(back - want).max() < 0.03


def test_loader_yuv420_emit_matches_f32_feed(dataset):
    """Same seeds -> the yuv420 batch through the device assembly
    approximates the f32 batch (chroma-blur tolerance)."""
    import jax.numpy as jnp
    from odtk_tpu.data.loader import DataIterator
    from odtk_tpu.train import apply_color_affine_yuv

    img_dir, ann = dataset
    kw = dict(resize=96, max_size=160, batch_size=4, stride=32, world=1,
              annotations=ann, training=True, max_det=8, seed=5,
              augment_brightness=0.05, augment_contrast=0.05,
              augment_hue=0.01, augment_saturation=0.05)
    ity = DataIterator(img_dir, emit='yuv420', num_threads=1, **kw)
    it32 = DataIterator(img_dir, emit='f32', num_threads=1, **kw)

    random.seed(11)
    by = next(iter(ity))
    random.seed(11)
    b32 = next(iter(it32))

    y, c, tgts, colors, sizes = by
    assert y.dtype == np.uint8 and y.ndim == 3
    assert c.shape == (4, y.shape[1] // 2, y.shape[2] // 2, 2)
    np.testing.assert_array_equal(tgts, b32[1])
    dev = np.asarray(apply_color_affine_yuv(
        jnp.asarray(y), jnp.asarray(c), jnp.asarray(colors),
        jnp.asarray(sizes)))
    assert dev.shape == b32[0].shape
    # synthetic rectangles have hard chroma edges; compare medians and
    # the bulk of pixels rather than the max
    err = np.abs(dev - b32[0])
    assert np.median(err) < 0.01
    assert err.mean() < 0.04
    assert (err < 0.12).mean() > 0.94


def test_yuv_train_step_runs_and_is_close(dataset):
    import jax
    import jax.numpy as jnp
    from odtk_tpu.data.loader import DataIterator
    from odtk_tpu.model import Model
    from odtk_tpu.parallel import make_mesh, shard_batch

    img_dir, ann = dataset
    kw = dict(resize=96, max_size=160, batch_size=2, stride=128, world=1,
              annotations=ann, training=True, max_det=8, seed=5)
    random.seed(3)
    by = next(iter(DataIterator(img_dir, emit='yuv420', num_threads=1,
                                **kw)))
    random.seed(3)
    b32 = next(iter(DataIterator(img_dir, emit='f32', num_threads=1,
                                 **kw)))

    model = Model(backbones='ResNet18FPN', classes=3)
    model.initialize(rng=0, image_size=(128, 128))
    mesh = make_mesh(jax.devices()[:2])
    tx = make_optimizer(lr=0.01, warmup=10, milestones=[100], gamma=0.1)
    params = jax.device_get(model.variables['params'])
    frozen = model.variables['frozen']

    stepy = make_train_step(model, tx, mesh, feed='yuv420')
    y, c, tgts, colors, sizes = by
    ys, cs, col, szs, tg = shard_batch(mesh, y, c, colors, sizes, tgts)
    _, _, cly, bly = stepy(params, tx.init(params), frozen,
                           ys, cs, col, szs, tg)
    step32 = make_train_step(model, tx, mesh)
    imgs32, tg32 = shard_batch(mesh, b32[0], b32[1])
    _, _, cl32, bl32 = step32(params, tx.init(params), frozen,
                              imgs32, tg32)
    assert np.isfinite(float(cly)) and np.isfinite(float(bly))
    # chroma subsampling perturbs pixels slightly; losses stay close
    np.testing.assert_allclose(float(cly), float(cl32), rtol=0.05)
    np.testing.assert_allclose(float(bly), float(bl32), rtol=0.05)


def test_device_feed_orders_and_surfaces_errors():
    """_device_feed preserves batch order, device_puts every array, and
    re-raises feeder-side exceptions in the consumer."""
    import jax
    from odtk_tpu.parallel import make_mesh
    from odtk_tpu.train import _device_feed

    mesh = make_mesh(jax.devices()[:2])
    batches = [(np.full((2, 4), i, np.float32),
                np.full((2, 3), -i, np.float32)) for i in range(5)]
    out = list(_device_feed(iter(batches), mesh))
    assert len(out) == 5
    for i, (a, b) in enumerate(out):
        assert isinstance(a, jax.Array) and isinstance(b, jax.Array)
        assert float(a[0, 0]) == i and float(b[0, 0]) == -i

    def bad():
        yield batches[0]
        raise RuntimeError('loader exploded')

    feed = _device_feed(bad(), mesh)
    next(feed)
    with pytest.raises(RuntimeError, match='loader exploded'):
        next(feed)


def test_device_feed_transform_and_early_stop():
    import jax
    from odtk_tpu.parallel import make_mesh, shard_batch
    from odtk_tpu.train import _device_feed

    mesh = make_mesh(jax.devices()[:2])
    batches = [(np.zeros((2, 4), np.float32), i) for i in range(6)]
    feed = _device_feed(iter(batches), mesh,
                        transform=lambda b: (shard_batch(mesh, b[0]),
                                             b[1] * 10))
    first = next(feed)
    assert first[1] == 0 and isinstance(first[0], jax.Array)
    feed.close()   # early stop must not hang the feeder thread


def test_native_yuv420_matches_numpy_twin():
    """The C converter (host_decode.cpp odtk_rgb_to_yuv420) and the
    numpy reference produce the same planes within 1 LSB, including
    odd-dimension edge blocks."""
    from odtk_tpu.data import native
    from odtk_tpu.data.loader import _rgb_to_yuv420_numpy

    if native.rgb_to_yuv420(np.zeros((2, 2, 3), np.uint8)) is None:
        pytest.skip('native yuv converter unavailable')
    rng = np.random.RandomState(9)
    for h, w in ((16, 24), (15, 23), (1, 1), (7, 2)):
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        yn, cn = native.rgb_to_yuv420(rgb)
        yp, cp = _rgb_to_yuv420_numpy(rgb)
        assert yn.shape == yp.shape and cn.shape == cp.shape
        assert np.abs(yn.astype(int) - yp.astype(int)).max() <= 1, (h, w)
        assert np.abs(cn.astype(int) - cp.astype(int)).max() <= 1, (h, w)


def test_eval_normalize_u8_matches_f32_canvas():
    """The u8 eval feed's in-graph normalize reproduces the f32 eval
    loader's canvas exactly (pad zeroed in normalized space)."""
    import jax.numpy as jnp
    from odtk_tpu.ops.color import eval_normalize_u8, IMAGENET_MEAN, \
        IMAGENET_STD

    rng = np.random.RandomState(4)
    u8 = (rng.rand(1, 12, 16, 3) * 255).astype(np.uint8)
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    want[0, 9:] = 0
    want[0, :, 13:] = 0
    got = np.asarray(eval_normalize_u8(
        jnp.asarray(u8), jnp.asarray([[9, 13]], np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_eval_normalize_yuv_exact_on_gray():
    """On chroma-flat (grayscale) content the yuv420 eval feed is
    EXACT vs the u8 feed — subsampling constant chroma loses nothing."""
    import jax.numpy as jnp
    from odtk_tpu.data.loader import rgb_to_yuv420
    from odtk_tpu.ops.color import eval_normalize_u8, eval_normalize_yuv

    g = np.repeat(np.arange(0, 240, 10, dtype=np.uint8)
                  .reshape(4, 6)[..., None], 3, axis=-1)
    y, c = rgb_to_yuv420(g)
    sizes = np.asarray([[4, 6]], np.float32)
    want = np.asarray(eval_normalize_u8(jnp.asarray(g[None]),
                                        jnp.asarray(sizes)))
    got = np.asarray(eval_normalize_yuv(jnp.asarray(y[None]),
                                        jnp.asarray(c[None]),
                                        jnp.asarray(sizes)))
    np.testing.assert_allclose(got, want, atol=0.03)  # u8 roundtrip LSBs


def test_infer_yuv_eval_feed_runs(dataset, capsys, monkeypatch):
    import os
    from odtk_tpu.infer import infer
    from odtk_tpu.model import Model

    monkeypatch.setenv('ODTK_EVAL_FEED', 'yuv420')
    img_dir, ann = dataset
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    out = os.path.join(os.path.dirname(img_dir), 'det_yuv.json')
    stats = infer(m, img_dir, [out], 64, 128, 2, annotations=ann,
                  mixed_precision=False, verbose=False)
    assert stats is None
    assert 'No detections!' in capsys.readouterr().out


def test_infer_u8_eval_feed_runs(dataset, capsys):
    """infer() end-to-end on the u8 eval feed (jax backend default)."""
    import os
    from odtk_tpu.infer import infer
    from odtk_tpu.model import Model

    img_dir, ann = dataset
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    out = os.path.join(os.path.dirname(img_dir), 'det_u8.json')
    stats = infer(m, img_dir, [out], 64, 128, 2, annotations=ann,
                  mixed_precision=False, verbose=False)
    assert stats is None   # untrained prior-init model: no detections
    assert 'No detections!' in capsys.readouterr().out


def test_native_u8_decode_matches_float(dataset):
    from odtk_tpu.data import native
    if not native.available() or not getattr(native._load(), '_has_u8',
                                             False):
        pytest.skip('native u8 decode unavailable')
    import os
    img_dir, _ = dataset
    fp = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    with open(fp, 'rb') as f:
        data = f.read()
    f32 = native.decode_jpeg(data, 96, 160, normalize=False)
    u8 = native.decode_jpeg_u8(data, 96, 160)
    assert f32 is not None and u8 is not None
    assert u8[1:] == f32[1:]            # same dims + ratio
    np.testing.assert_allclose(u8[0].astype(np.float32), f32[0],
                               atol=0.51)  # round-to-nearest of the same blend
