"""extras/roofline.py trace-attribution unit tests (synthetic trace)."""

import gzip
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        'roofline', os.path.join(REPO, 'extras', 'roofline.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _event(name, dur_us, long_name, nbytes, flops, pid=3):
    return {'ph': 'X', 'pid': pid, 'tid': 3, 'ts': 0.0, 'dur': dur_us,
            'name': name,
            'args': {'long_name': long_name,
                     'bytes_accessed': str(nbytes),
                     'model_flops': str(flops)}}


def _write_trace(tmp_path, events):
    d = tmp_path / 'plugins' / 'profile' / 'run1'
    d.mkdir(parents=True)
    meta = [{'ph': 'M', 'pid': 3, 'name': 'process_name',
             'args': {'name': 'TPU:0'}},
            {'ph': 'M', 'pid': 1, 'name': 'process_name',
             'args': {'name': 'python host'}}]
    with gzip.open(d / 'vm.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': meta + events}, f)
    return str(tmp_path)


def test_stage_classification_and_rates(tmp_path):
    r = _load()
    stage = r.make_stager(832)
    assert stage('fusion.1', 'x = bf16[8,416,416,64] conv(...)') \
        == 'stem(416)'
    assert stage('fusion.2', 'x = bf16[8,104,104,720] conv(...)') \
        == 'p3/heads(104)'
    assert stage('fusion.3', 'x = bf16[8,104,104,512] conv(...)') \
        == 'layer2(104)'
    # total padded anchor rows at 832: 104^2+52^2+26^2+13^2+7^2 = 14414
    assert stage('f', 'x = f32[8,14414,9] dot(...)') == 'loss/assign'
    assert stage('g', 'x = bf16[8,7,7,256] conv(...)') == 'p6/p7(13/7)'
    # packed layouts: merged-phase stem [B,416,208,2C], width-pair-
    # packed layer1 [B,208,104,2C] (wpack auto packs train graphs)
    assert stage('fusion.4', 'x = bf16[8,416,208,128] conv(...)') \
        == 'stem(416)'
    assert stage('fusion.5', 'x = bf16[8,208,104,128] conv(...)') \
        == 'layer1(208)'

    events = [
        _event('fusion.9', 1000.0, '%x = bf16[8,208,208,256] f(...)',
               819_000_000, 0),                     # 1 ms, 819 GB
        _event('fusion.8', 500.0, '%y = bf16[8,26,26,2048] f(...)',
               0, 98_500_000_000),                  # 0.5 ms, MXU peak
        _event('host_op', 99.0, 'ignored', 9, 9, pid=1),  # non-device
    ]
    logdir = _write_trace(tmp_path, events)
    ev, pids = r.load_events(logdir)
    assert pids == {3}
    st, ops, total = r.collect(ev, pids, r.make_stager(832))
    assert abs(total - 1.5) < 1e-6
    gbs, tfs = r.rates(*st['layer1(208)'])
    assert abs(gbs - 819.0) < 1.0 and tfs == 0.0
    gbs, tfs = r.rates(*st['layer4/p5(26)'])
    assert abs(tfs - 197.0) < 1.0
    assert r.bound_str(819.0, 1.0).startswith('HBM 100')
    assert r.bound_str(1.0, 197.0).startswith('MXU 100')
    assert r.bound_str(10.0, 1.0).startswith('overhead')


def test_cli_markdown_output(tmp_path):
    logdir = _write_trace(tmp_path, [
        _event('fusion.9', 2000.0, '%x = bf16[8,208,208,256] f(...)',
               1_638_000_000, 0)])
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'extras', 'roofline.py'),
         logdir, '--steps', '2', '--md'],
        capture_output=True, text=True, check=True).stdout
    assert '| layer1(208) | 1.00 |' in out
    assert 'HBM 100%' in out
