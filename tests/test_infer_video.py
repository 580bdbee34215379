"""Multi-stream video inference smoke (extras/infer_video.py — the
DeepStream-pipeline equivalent): 2 streams ride the batch axis through
the u8 feed with decode/compute overlap, outputs written per stream."""

import importlib.util
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from odtk_tpu.model import Model


def _write_video(path, frames=3, w=96, h=80, seed=0):
    rng = np.random.RandomState(seed)
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 5,
                          (w, h))
    for _ in range(frames):
        out.write((rng.rand(h, w, 3) * 255).astype(np.uint8))
    out.release()
    assert os.path.getsize(path) > 0


def test_infer_video_two_streams(tmp_path, monkeypatch):
    v1 = str(tmp_path / 'a.mp4')
    v2 = str(tmp_path / 'b.mp4')
    _write_video(v1, seed=1)
    _write_video(v2, seed=2)

    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    ckpt = str(tmp_path / 'm.ckpt')
    m.save({'path': ckpt})

    out_dir = str(tmp_path / 'out')
    spec = importlib.util.spec_from_file_location(
        'infer_video', os.path.join(os.path.dirname(__file__), '..',
                                    'extras', 'infer_video.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, 'argv', [
        'infer_video.py', ckpt, out_dir, v1, v2, '--size', '128'])
    mod.main()

    for v in ('a.mp4', 'b.mp4'):
        p = os.path.join(out_dir, v)
        assert os.path.isfile(p) and os.path.getsize(p) > 0
        cap = cv2.VideoCapture(p)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()
