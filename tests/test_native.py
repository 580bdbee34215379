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
