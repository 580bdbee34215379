"""Native host-pipeline (C++ libjpeg) tests."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from odtk_tpu.data import native
from odtk_tpu.data.coco import IMAGENET_MEAN, IMAGENET_STD, CocoDataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library unavailable')


def _jpeg_bytes(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    arr[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    arr[20:50, 30:80] = [200, 40, 90]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG', quality=95)
    return buf.getvalue(), arr


def test_decode_matches_pil_pipeline():
    data, arr = _jpeg_bytes()
    out = native.decode_jpeg(data, resize=48, max_size=100,
                             pad_to=(48, 64), normalize=True)
    assert out is not None
    got, oh, ow, ratio = out
    assert (oh, ow) == (48, 64)
    assert abs(ratio - 0.5) < 1e-6
    # PIL reference: decode -> bilinear resize -> normalize
    im = Image.open(io.BytesIO(data)).convert('RGB').resize(
        (64, 48), Image.BILINEAR)
    want = (np.asarray(im, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    # JPEG decode + resample differences stay small
    assert np.abs(got[:oh, :ow] - want).mean() < 0.12


def test_decode_max_size_cap():
    data, _ = _jpeg_bytes(h=100, w=300)
    out = native.decode_jpeg(data, resize=90, max_size=150,
                             pad_to=(50, 150), normalize=False)
    got, oh, ow, ratio = out
    assert abs(ratio - 0.5) < 1e-6       # capped by max_size/300
    assert (oh, ow) == (50, 150)


def test_resize_rgb_roundtrip():
    rgb = (np.ones((40, 60, 3)) * [100, 150, 200]).astype(np.uint8)
    out = native.resize_rgb(rgb, 20, 30, normalize=False)
    np.testing.assert_allclose(out, np.broadcast_to(
        [100.0, 150.0, 200.0], (20, 30, 3)), atol=0.5)


def test_invalid_jpeg_returns_none():
    assert native.decode_jpeg(b'not a jpeg', 64, 128) is None


def test_dataset_uses_native_for_jpeg(tmp_path):
    data, _ = _jpeg_bytes()
    (tmp_path / 'img.jpg').write_bytes(data)
    ds = CocoDataset(str(tmp_path), resize=48, max_size=96, stride=32,
                     annotations=None, training=False)
    arr, img_id, ratio = ds[0]
    assert min(arr.shape[:2]) == 48   # exact resize; loader pads at collate
    assert abs(arr.mean()) < 5        # normalized


def test_rot90_same_canvas_matches_pil():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (40, 60, 3)).astype(np.uint8)
    for k in (1, 2, 3):
        got = CocoDataset._rot90_same_canvas(arr.astype(np.float32), k)
        want = np.asarray(Image.fromarray(arr).rotate(90 * k), np.float32)
        # PIL rotate fills border black; compare the overlapping region
        np.testing.assert_allclose(got, want, atol=1.0)


def test_decode_corrupt_jpeg_returns_none():
    """Truncated/garbage JPEG bytes must fail cleanly (the libjpeg
    setjmp error path), never crash or return a half-written buffer as
    success."""
    data, _ = _jpeg_bytes()
    assert native.decode_jpeg(data[:len(data) // 2], 48, 100) is None
    assert native.decode_jpeg(b'\xff\xd8\xff\xe0garbage', 48, 100) is None
    assert native.decode_jpeg(b'', 48, 100) is None


def test_loader_skips_corrupt_jpeg_with_warning(tmp_path, capfd):
    """A corrupt image mid-epoch is skipped with a warning and replaced
    by the next readable one — the epoch completes with full-shape
    batches instead of a dead worker thread (DALI owns this failure
    class in the reference, odtk/dali.py:33-36)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.data.loader import DataIterator

    img_dir, anns = make_dataset(str(tmp_path), n_images=8,
                                 size=(160, 200), max_boxes=2, fmt='jpg')
    # truncate one file so it opens (header intact) but fails to decode,
    # and zero another so it fails at open
    files = sorted(f for f in os.listdir(img_dir) if f.endswith('.jpg'))
    bad1 = os.path.join(img_dir, files[1])
    blob = open(bad1, 'rb').read()
    open(bad1, 'wb').write(blob[:len(blob) // 3])
    bad2 = os.path.join(img_dir, files[4])
    open(bad2, 'wb').write(b'not a jpeg')

    for training in (True, False):
        it = DataIterator(img_dir, resize=128, max_size=160, batch_size=4,
                          stride=32, world=1, annotations=anns,
                          training=training)
        batches = list(it)
        assert len(batches) == 2
        for b in batches:
            assert b[0].shape[0] == 4
            assert np.isfinite(b[0]).all()
    err = capfd.readouterr().err
    assert 'skipping unreadable image' in err


def test_loader_raises_when_everything_corrupt(tmp_path):
    """If every image is unreadable the loader must fail loudly (after
    the bounded retry), not loop forever."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.data.loader import DataIterator

    img_dir, anns = make_dataset(str(tmp_path), n_images=4,
                                 size=(160, 200), max_boxes=2, fmt='jpg')
    for f in os.listdir(img_dir):
        if f.endswith('.jpg'):
            open(os.path.join(img_dir, f), 'wb').write(b'junk')
    it = DataIterator(img_dir, resize=128, max_size=160, batch_size=4,
                      stride=32, world=1, annotations=anns, training=True)
    with pytest.raises(RuntimeError, match='failed to load'):
        list(it)
