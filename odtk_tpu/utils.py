"""Utilities: profiler, signal guard, metrics POST, visualization helpers.

Counterparts of odtk/utils.py — wall-clock Profiler with named counters
(:140-167), SIGINT deferral during checkpoint writes (:130-137), HTTP
metrics POST (:170-177), rotated-box corner helper (:83-101) and
detection visualization (:104-121).
"""

import json
import os
import signal
import time
import warnings
from contextlib import contextmanager
from datetime import datetime

import numpy as np


def rotate_box(bbox):
    """Corners of (x, y, w, h, theta) rotated about the box center.

    Returns a flat [x0,y0,...,x3,y3] list, corner order
    (tl, bl, br, tr) rotated — used to emit segmentation polygons for
    rotated detections (odtk/infer.py:127-132).
    """
    x, y, w, h, theta = bbox
    cx, cy = x + (w - 1) / 2.0, y + (h - 1) / 2.0
    base = np.array([[x, y], [x, y + h - 1],
                     [x + w - 1, y + h - 1], [x + w - 1, y]], np.float64)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    corners = (base - [cx, cy]) @ rot.T + [cx, cy]
    return corners.reshape(-1).tolist()


def show_detections(detections):
    """Draw detections over their images (odtk/utils.py:104-121)."""
    from PIL import Image, ImageDraw
    for image, dets in detections.items():
        im = Image.open(image).convert('RGBA')
        overlay = Image.new('RGBA', im.size, (255, 255, 255, 0))
        draw = ImageDraw.Draw(overlay)
        for det in sorted(dets, key=lambda d: d['score']):
            box = det['bbox']
            alpha = int(det['score'] * 255)
            draw.rectangle([box[0], box[1], box[0] + box[2], box[1] + box[3]],
                           outline=(255, 255, 255, alpha))
            draw.text((box[0] + 2, box[1]),
                      '[{}]'.format(det['class']), fill=(255, 255, 255, alpha))
            draw.text((box[0] + 2, box[1] + 10),
                      '{:.2}'.format(det['score']),
                      fill=(255, 255, 255, alpha))
        Image.alpha_composite(im, overlay).show()


def save_detections(path, detections):
    print('Writing detections to {}...'.format(os.path.basename(path)))
    with open(path, 'w') as f:
        json.dump(detections, f)


@contextmanager
def ignore_sigint():
    handler = signal.getsignal(signal.SIGINT)
    signal.signal(signal.SIGINT, signal.SIG_IGN)
    try:
        yield
    finally:
        signal.signal(signal.SIGINT, handler)


class Profiler:
    """Named wall-clock accumulators with running means."""

    def __init__(self, names=('main',)):
        self.names = list(names)
        self.reset()

    def reset(self):
        now = time.time()
        self.lasts = {k: now for k in self.names}
        self.totals = {k: 0.0 for k in self.names}
        self.counts = {k: 0 for k in self.names}
        self.means = {k: 0.0 for k in self.names}

    def start(self, name='main'):
        self.lasts[name] = time.time()

    def stop(self, name='main'):
        self.totals[name] += time.time() - self.lasts[name]
        self.counts[name] += 1
        self.means[name] = self.totals[name] / self.counts[name]

    def bump(self, name='main'):
        self.stop(name)
        self.start(name)


def post_metrics(url, metrics):
    """POST metric key/values with ns timestamps; warn on failure."""
    try:
        import requests
        for k, v in metrics.items():
            requests.post(url, data={
                'time': int(datetime.now().timestamp() * 1e9),
                'metric': k, 'value': v})
    except Exception as e:  # noqa: BLE001 — metrics must never kill training
        warnings.warn('Warning: posting metrics failed: {}'.format(e))
