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


# 12 visually distinct class colors (cycled by class id)
_PALETTE = [(230, 60, 60), (60, 200, 60), (70, 110, 245), (245, 200, 40),
            (200, 60, 230), (40, 220, 220), (250, 140, 30), (140, 230, 60),
            (240, 80, 160), (90, 220, 160), (160, 120, 250), (220, 220, 90)]


def show_detections(detections, min_score=0.0, save_to=None):
    """Render detection boxes onto their source images.

    ``detections`` maps image path -> list of {'bbox': xywh, 'class',
    'score'} dicts. Boxes are colored per class and labeled
    ``class score``; confident detections draw thicker outlines. Pass
    ``save_to`` (directory) to write annotated copies instead of
    opening a viewer.
    """
    from PIL import Image, ImageDraw
    for path, dets in detections.items():
        im = Image.open(path).convert('RGB')
        draw = ImageDraw.Draw(im)
        for det in sorted(dets, key=lambda d: d['score']):
            score = det['score']
            if score < min_score:
                continue
            x, y, w, h = det['bbox'][:4]
            color = _PALETTE[int(det['class']) % len(_PALETTE)]
            draw.rectangle([x, y, x + w, y + h], outline=color,
                           width=2 if score > 0.5 else 1)
            draw.text((x + 3, y + 1),
                      '{} {:.2f}'.format(det['class'], score), fill=color)
        if save_to:
            im.save(os.path.join(save_to, os.path.basename(path)))
        else:
            im.show()


def save_detections(path, detections):
    """Dump a detections structure as JSON."""
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


class _Lap:
    """One named stopwatch: accumulated seconds + completed laps."""

    __slots__ = ('mark', 'total', 'laps')

    def __init__(self):
        self.mark = time.perf_counter()
        self.total = 0.0
        self.laps = 0


class Profiler:
    """A set of named wall-clock stopwatches (monotonic clock).

    ``start``/``stop`` bracket a lap; ``bump`` closes the current lap
    and immediately opens the next (per-iteration cadence timing).
    ``totals`` and ``means`` expose accumulated seconds and per-lap
    averages as dict views for status lines.
    """

    def __init__(self, names=('main',)):
        self._laps = {n: _Lap() for n in names}

    def reset(self):
        for lap in self._laps.values():
            lap.__init__()

    def start(self, name='main'):
        self._laps[name].mark = time.perf_counter()

    def stop(self, name='main'):
        lap = self._laps[name]
        lap.total += time.perf_counter() - lap.mark
        lap.laps += 1

    def bump(self, name='main'):
        self.stop(name)
        self.start(name)

    @property
    def totals(self):
        return {n: lap.total for n, lap in self._laps.items()}

    @property
    def counts(self):
        return {n: lap.laps for n, lap in self._laps.items()}

    @property
    def means(self):
        return {n: lap.total / lap.laps if lap.laps else 0.0
                for n, lap in self._laps.items()}


def post_metrics(url, metrics):
    """Push metric key/value pairs to an HTTP collector.

    Each metric posts as form data with a nanosecond timestamp taken
    once for the whole batch. Failures (collector down, no route) are
    reduced to a warning — metrics must never take down training.
    """
    stamp = int(time.time() * 1e9)
    try:
        import requests
        for name, value in metrics.items():
            requests.post(url, data={'time': stamp, 'metric': name,
                                     'value': value})
    except Exception as e:  # noqa: BLE001
        warnings.warn('posting metrics to {} failed: {}'.format(url, e))
