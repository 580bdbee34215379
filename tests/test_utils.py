"""Utility tests: profiler, rotated-corner helper, sigint guard."""

import signal
import time

import numpy as np

from odtk_tpu.utils import Profiler, ignore_sigint, rotate_box


def test_profiler_counts_and_means():
    p = Profiler(['a', 'b'])
    p.start('a')
    time.sleep(0.01)
    p.stop('a')
    p.start('a')
    time.sleep(0.01)
    p.stop('a')
    assert p.counts['a'] == 2
    assert 0.005 < p.means['a'] < 0.5
    assert p.counts['b'] == 0
    p.reset()
    assert p.totals['a'] == 0


def test_profiler_bump():
    p = Profiler(['x'])
    p.start('x')
    p.bump('x')
    p.bump('x')
    assert p.counts['x'] == 2


def test_rotate_box_zero_angle():
    corners = rotate_box([10, 20, 8, 6, 0.0])
    np.testing.assert_allclose(
        corners, [10, 20, 10, 25, 17, 25, 17, 20], atol=1e-6)


def test_rotate_box_preserves_center_and_size():
    x, y, w, h, t = 30.0, 40.0, 12.0, 20.0, 0.7
    c = np.asarray(rotate_box([x, y, w, h, t])).reshape(4, 2)
    np.testing.assert_allclose(c.mean(0),
                               [x + (w - 1) / 2, y + (h - 1) / 2], atol=1e-6)
    d01 = np.linalg.norm(c[1] - c[0])
    d12 = np.linalg.norm(c[2] - c[1])
    np.testing.assert_allclose(sorted([d01, d12]),
                               sorted([w - 1, h - 1]), atol=1e-6)


def test_ignore_sigint_restores_handler():
    before = signal.getsignal(signal.SIGINT)
    with ignore_sigint():
        assert signal.getsignal(signal.SIGINT) == signal.SIG_IGN
    assert signal.getsignal(signal.SIGINT) == before
