"""Build-and-run check for the extras/cppapi deployment binaries.

The reference builds three binaries from its cppapi CMakeLists and they
are its C++ deployment story (extras/cppapi/CMakeLists.txt:1-48); this
suite compiles our three PJRT-based counterparts against the installed
headers and executes the device-free one (``odtk_export`` validates an
engine container and prints the deployment contract, the format half of
the reference's export.cpp). The device-attached run (``odtk_infer`` on
the chip) lives in extras/cppapi/check.sh — it must own the single TPU
claim, so it can't run under the CPU-forced test suite.
"""

import json
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPPAPI = os.path.join(ROOT, 'extras', 'cppapi')
BUILD = os.path.join(CPPAPI, 'build')


@pytest.fixture(scope='module')
def binaries():
    if not (os.path.exists('/usr/bin/cmake') or
            os.path.exists('/usr/local/bin/cmake')):
        pytest.skip('cmake unavailable')
    cfg = subprocess.run(['cmake', '-B', BUILD, '-G', 'Ninja', '.'],
                         cwd=CPPAPI, capture_output=True, text=True,
                         timeout=300)
    if cfg.returncode != 0:
        pytest.skip(f'cmake configure failed: {cfg.stderr[-400:]}')
    bld = subprocess.run(['ninja', '-C', BUILD], capture_output=True,
                         text=True, timeout=900)
    assert bld.returncode == 0, bld.stdout[-1500:] + bld.stderr[-1500:]
    return BUILD


def test_cppapi_binaries_build(binaries):
    for name in ('odtk_export', 'odtk_infer', 'odtk_infervideo'):
        path = os.path.join(binaries, name)
        assert os.path.isfile(path) and os.access(path, os.X_OK), name


def test_cppapi_export_reads_engine(binaries, tmp_path):
    """C++ container parser agrees with the Python writer: odtk_export
    loads a fresh .cppengine and prints its contract (rc=0)."""
    from odtk_tpu.export import export_cpp_engine
    from odtk_tpu.model import Model

    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    eng = str(tmp_path / 'm.cppengine')
    export_cpp_engine(m, (128, 128), batch=1, path=eng, precision='fp32',
                      platform='cpu')
    run = subprocess.run([os.path.join(binaries, 'odtk_export'), eng],
                         capture_output=True, text=True, timeout=120)
    assert run.returncode == 0, run.stderr
    assert 'stablehlo' in run.stdout
    # the C++ JSON lookup extracts the same contract Python wrote
    assert '[1, 128, 128, 3]' in run.stdout.replace('  ', ' ')


def test_cppapi_export_rejects_bad_magic(binaries, tmp_path):
    bad = tmp_path / 'bad.cppengine'
    bad.write_bytes(b'NOTODTK1' + b'\x00' * 64)
    run = subprocess.run([os.path.join(binaries, 'odtk_export'), str(bad)],
                         capture_output=True, text=True, timeout=60)
    assert run.returncode != 0
    assert 'bad magic' in run.stderr
