"""Weight-quantization round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from odtk_tpu.model import Model
from odtk_tpu.quantize import (quantize_weights, dequantize_weights,
                               quantize_model)


def test_quantize_dequantize_close():
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    params = m.variables['params']
    q, meta = quantize_weights(params)
    assert meta['quantized_tensors'] > 20
    deq = dequantize_weights(q, meta, jnp.float32)
    # per-channel int8: max relative error bounded by scale/2 per elem
    k = np.asarray(params['cls_head_0']['kernel'])
    k2 = np.asarray(deq['cls_head_0']['kernel'])
    absmax = np.abs(k).reshape(-1, k.shape[-1]).max(0)
    assert np.all(np.abs(k - k2) <= absmax / 127.0 + 1e-8)


def test_quantized_model_still_infers():
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3) * 0.1,
                    jnp.float32)
    before = m.module.apply(m.variables, x)[0][0]
    stats = quantize_model(m)
    assert stats['ratio'] > 3.5          # ~4x for conv-dominated params
    after = m.module.apply(m.variables, x)[0][0]
    # int8 weight noise perturbs logits slightly, not wildly
    diff = float(jnp.abs(after - before).mean())
    assert diff < 0.2, diff
    s, b, c = m.inference_fn(m.variables, x)
    assert np.isfinite(np.asarray(s)).all()


def test_int8_engine_real_storage_and_execution(tmp_path):
    """Real INT8: calibrated export stores int8 kernels (file ~4x
    smaller than fp32), the engine executes the int8 MXU path
    (QuantConv quant branch), and outputs stay close to fp32."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.export import export_model, Engine

    img_dir, _ = make_dataset(str(tmp_path), n_images=4, size=(128, 128))
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))

    m_fp = Model(backbones='ResNet18FPN', classes=3)
    m_fp.initialize(rng=0, image_size=(128, 128))
    p_fp = str(tmp_path / 'fp.engine')
    export_model(m_fp, (128, 128), precision='fp32', path=p_fp)

    m_i8 = Model(backbones='ResNet18FPN', classes=3)
    m_i8.initialize(rng=0, image_size=(128, 128))
    p_i8 = str(tmp_path / 'i8.engine')
    table = str(tmp_path / 'calib.json')
    export_model(m_i8, (128, 128), precision='int8', path=p_i8,
                 calibration_files=files, calibration_table=table)

    # int8 kernels + quant scales actually landed in the variables
    q = m_i8.variables['quant']
    assert 'cls_head_0' in q and 'w_scale' in q['cls_head_0']
    assert m_i8.variables['params']['cls_head_0']['kernel'].dtype == np.int8

    assert os.path.getsize(p_i8) < os.path.getsize(p_fp) / 2.5
    assert os.path.isfile(table)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 128, 3).astype(np.float32) * 0.5
    s_fp, b_fp, c_fp = Engine.load(p_fp)(x)
    s_i8, b_i8, c_i8 = Engine.load(p_i8)(x)
    assert np.isfinite(s_i8).all() and np.isfinite(b_i8).all()
    # raw head probabilities agree to int8 tolerance
    h_fp = np.asarray(m_fp.heads_fn(m_fp.variables, jnp.asarray(x))[0][0])
    h_i8 = np.asarray(m_i8.heads_fn(m_i8.variables, jnp.asarray(x))[0][0])
    assert np.abs(h_fp - h_i8).mean() < 5e-3


def test_calibration_table_reused(tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.export import calibrate

    img_dir, _ = make_dataset(str(tmp_path), n_images=2, size=(96, 96))
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(96, 96))
    table_path = str(tmp_path / 'table.json')
    t1 = calibrate(m, (96, 96), files, calibration_table=table_path)
    assert t1['version'] == 2 and len(t1['act_absmax']) > 20
    # second call must read the persisted table, not recompute
    t2 = calibrate(m, (96, 96), [], calibration_table=table_path)
    assert t2 == t1


def test_w8a8_full_int8_path(tmp_path):
    """The w8a8 mode executes real int8 convolutions (QuantConv's
    int8 branch) and stays numerically close to fp32."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.export import calibrate
    from odtk_tpu.quantize import build_quant_variables

    img_dir, _ = make_dataset(str(tmp_path), n_images=2, size=(96, 96))
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(96, 96))
    table = calibrate(m, (96, 96), files,
                      calibration_table=str(tmp_path / 't.json'))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    ref = np.asarray(m.heads_fn(m.variables, x)[0][0])

    qvars, stats = build_quant_variables(m.variables, table['act_absmax'],
                                         mode='w8a8')
    assert stats['quantized_tensors'] > 20
    assert 'act_scale' in qvars['quant']['cls_head_0']
    out = np.asarray(m.heads_fn(qvars, x)[0][0])
    assert np.isfinite(out).all()
    # activation quantization noise is larger than weight-only but the
    # sigmoid head outputs must remain close on prior-scale logits
    assert np.abs(out - ref).mean() < 2e-2


def test_percentile_calibration(tmp_path):
    """Percentile clipping thresholds are <= absmax per layer, the table
    records the method, and a percentile-calibrated model still infers
    close to fp32 (VERDICT r2 #8)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.export import calibrate
    from odtk_tpu.quantize import build_quant_variables

    img_dir, _ = make_dataset(str(tmp_path), n_images=2, size=(96, 96))
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(96, 96))
    t_max = calibrate(m, (96, 96), files,
                      calibration_table=str(tmp_path / 'absmax.json'))
    t_pct = calibrate(m, (96, 96), files, percentile=99.5,
                      calibration_table=str(tmp_path / 'p995.json'))
    assert t_max.get('method', 'absmax') == 'absmax'
    assert t_pct['method'] == 'percentile99.5'
    assert set(t_pct['act_absmax']) == set(t_max['act_absmax'])
    for k, v in t_pct['act_absmax'].items():
        assert 0 < v <= t_max['act_absmax'][k] + 1e-6
    # at least some layers actually clip (percentile < absmax)
    assert any(t_pct['act_absmax'][k] < t_max['act_absmax'][k] * 0.999
               for k in t_pct['act_absmax'])

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    ref = np.asarray(m.heads_fn(m.variables, x)[0][0])
    qvars, _ = build_quant_variables(m.variables, t_pct['act_absmax'],
                                     mode='w8a8')
    out = np.asarray(m.heads_fn(qvars, x)[0][0])
    assert np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 2e-2


def test_entropy_threshold_clips_outliers():
    """KL sweep on a gaussian bulk + far outliers picks a threshold
    well inside absmax (covering the bulk), and leaves near-uniform
    histograms essentially unclipped."""
    from odtk_tpu.quantize import entropy_threshold
    rng = np.random.RandomState(0)
    amax, nbins = 10.0, 2048
    bw = amax / nbins
    # bulk sigma=0.5 plus 0.01% outliers near amax
    bulk = np.abs(rng.randn(500000)) * 0.5
    outl = rng.uniform(9.0, 10.0, 50)
    hist = np.histogram(np.concatenate([bulk, outl]),
                        bins=nbins, range=(0, amax))[0]
    t = entropy_threshold(hist, bw)
    assert 1.0 < t < 6.0, t          # covers the bulk, clips the tail
    # uniform distribution: clipping only destroys information
    uhist = np.full(nbins, 100.0)
    tu = entropy_threshold(uhist, bw)
    assert tu > 0.9 * amax, tu
    # degenerate: empty histogram -> full range
    assert entropy_threshold(np.zeros(nbins), bw) == amax


def test_entropy_calibration_table(tmp_path):
    """--calibration-entropy: thresholds are <= absmax with at least
    one layer genuinely clipped, table records the method, and the
    entropy-calibrated model still infers close to fp32."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_dataset
    from odtk_tpu.export import calibrate
    from odtk_tpu.quantize import build_quant_variables

    img_dir, _ = make_dataset(str(tmp_path), n_images=2, size=(96, 96))
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(96, 96))
    t_max = calibrate(m, (96, 96), files,
                      calibration_table=str(tmp_path / 'absmax.json'))
    t_ent = calibrate(m, (96, 96), files, entropy=True,
                      calibration_table=str(tmp_path / 'entropy.json'))
    assert t_ent['method'] == 'entropy'
    assert set(t_ent['act_absmax']) == set(t_max['act_absmax'])
    for k, v in t_ent['act_absmax'].items():
        assert 0 < v <= t_max['act_absmax'][k] * (1 + 1e-6), k
    assert any(t_ent['act_absmax'][k] < t_max['act_absmax'][k] * 0.999
               for k in t_ent['act_absmax'])

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    ref = np.asarray(m.heads_fn(m.variables, x)[0][0])
    qvars, _ = build_quant_variables(m.variables, t_ent['act_absmax'],
                                     mode='w8a8')
    out = np.asarray(m.heads_fn(qvars, x)[0][0])
    assert np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 2e-2
