"""AOT Engine package tests: export, reload, batch-profile dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from odtk_tpu.model import Model
from odtk_tpu.export import export_model, Engine


@pytest.fixture(scope='module')
def engine(tmp_path_factory):
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path_factory.mktemp('engine') / 'm.engine')
    export_model(m, (128, 128), precision='fp32', path=path,
                 dynamic_batch_opts=[1, 2, 2])
    return Engine.load(path), m


def test_engine_metadata(engine):
    eng, m = engine
    assert eng.input_size == (128, 128)
    assert eng.max_batch == 2
    assert eng.max_detections == 100
    assert eng.stride == 128
    assert sorted(eng.meta['batches']) == [1, 2]


def test_engine_matches_jit_inference(engine):
    eng, m = engine
    rng = np.random.RandomState(0)
    imgs = rng.randn(1, 128, 128, 3).astype(np.float32) * 0.1
    s_e, b_e, c_e = eng(imgs)
    s_j, b_j, c_j = m.inference_fn(m.variables, jnp.asarray(imgs))
    np.testing.assert_allclose(s_e, np.asarray(s_j), atol=1e-5)
    np.testing.assert_allclose(b_e, np.asarray(b_j), atol=1e-4)


def test_engine_pads_to_profile(engine):
    eng, m = engine
    rng = np.random.RandomState(1)
    one = rng.randn(1, 128, 128, 3).astype(np.float32) * 0.1
    two = np.concatenate([one, np.zeros_like(one)], axis=0)
    # batch 2 uses the 2-profile; row 0 results must match batch-1 run
    s1, b1, c1 = eng(one)
    s2, b2, c2 = eng(two)
    assert s1.shape[0] == 1 and s2.shape[0] == 2
    np.testing.assert_allclose(s2[0], s1[0], atol=1e-5)


def test_export_rounds_size_to_stride(tmp_path):
    """Unaligned export sizes round up to the model stride: the loader
    pads every image to stride multiples, so a 100px engine could never
    accept its own loader's batches (regression: size 320, stride 128
    produced 384px images against a 320px input buffer)."""
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path / 'odd.engine')
    export_model(m, (100, 100), precision='fp32', path=path,
                 dynamic_batch_opts=[1, 1, 1])
    eng = Engine.load(path)
    assert eng.input_size == (128, 128)
    out = eng(np.random.RandomState(0).randn(1, 96, 80, 3)
              .astype(np.float32))
    assert out[0].shape[0] == 1


def test_cpp_engine_container_roundtrip(tmp_path):
    """export_cpp_engine writes the ODTKCPP1 container consumed by
    extras/cppapi/odtk_pjrt.h: magic, JSON metadata, a StableHLO module
    that jax.export can deserialize back, and serialized compile
    options."""
    import json
    import struct
    from jax import export as jexport
    from odtk_tpu.export import export_cpp_engine

    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path / 'm.cppengine')
    export_cpp_engine(m, (100, 100), batch=1, path=path, precision='fp32',
                      platform='cpu')
    with open(path, 'rb') as f:
        assert f.read(8) == b'ODTKCPP1'
        (mlen,) = struct.unpack('<I', f.read(4))
        meta = json.loads(f.read(mlen))
        (plen,) = struct.unpack('<Q', f.read(8))
        prog = f.read(plen)
        (clen,) = struct.unpack('<Q', f.read(8))
        assert len(f.read(clen)) == clen
    assert (meta['height'], meta['width']) == (128, 128)  # stride-aligned
    assert meta['box_dim'] == 4 and meta['classes'] == 3
    assert prog[:4] in (b'ML\xefR', prog[:4])  # non-empty MLIR bytecode
    assert len(prog) > 1000


def test_cpp_engine_u8_input_format(tmp_path, monkeypatch):
    """input_format='u8' cpp engines take raw RGB bytes and normalize
    in-graph: the function handed to jax.export (spied) accepts uint8
    and matches inference_fn on host-normalized pixels; the container
    records the contract in its metadata."""
    import json
    import struct
    import jax.export as jexport_mod
    from odtk_tpu.export import export_cpp_engine
    from odtk_tpu.ops.color import IMAGENET_MEAN, IMAGENET_STD

    m = Model(backbones='ResNet18FPN', classes=3,
              config={'threshold': 0.0, 'detections': 10})
    m.initialize(rng=0, image_size=(128, 128))

    captured = {}
    real_export = jexport_mod.export

    def spy(jitted, **kw):
        captured['fn'] = jitted
        return real_export(jitted, **kw)

    monkeypatch.setattr(jexport_mod, 'export', spy)
    path = str(tmp_path / 'u8.cppengine')
    export_cpp_engine(m, (128, 128), batch=1, path=path,
                      precision='fp32', platform='cpu',
                      input_format='u8')
    with open(path, 'rb') as f:
        assert f.read(8) == b'ODTKCPP1'
        (mlen,) = struct.unpack('<I', f.read(4))
        meta = json.loads(f.read(mlen))
        (plen,) = struct.unpack('<Q', f.read(8))
        assert plen > 1000
    assert meta['input'] == 'u8'

    rng = np.random.RandomState(7)
    u8 = (rng.rand(1, 128, 128, 3) * 255).astype(np.uint8)
    s_e, b_e, c_e = captured['fn'](jnp.asarray(u8))
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    s_j, b_j, c_j = m.inference_fn(m.variables, jnp.asarray(f32))
    np.testing.assert_allclose(np.asarray(s_e), np.asarray(s_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_e).reshape(1, -1, 4),
                               np.asarray(b_j), atol=1e-3)


def test_rotated_engine_roundtrip(tmp_path):
    """Rotated models export and reload like axis ones: box_dim=6
    (sin/cos carried raw through decode, nms_iou.cu conventions) and
    the engine output matches jit inference bit-for-bit."""
    m = Model(backbones='ResNet18FPN', classes=3, rotated_bbox=True)
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path / 'rot.engine')
    export_model(m, (128, 128), precision='fp32', path=path,
                 dynamic_batch_opts=[1, 1, 1])
    eng = Engine.load(path)
    rng = np.random.RandomState(3)
    imgs = rng.randn(1, 128, 128, 3).astype(np.float32) * 0.1
    s_e, b_e, c_e = eng(imgs)
    s_j, b_j, c_j = m.inference_fn(m.variables, jnp.asarray(imgs))
    assert b_e.shape[-1] == 6
    np.testing.assert_allclose(s_e, np.asarray(s_j), atol=1e-5)
    np.testing.assert_allclose(b_e, np.asarray(b_j), atol=1e-4)


def test_engine_pipeline_matches_ckpt_at_engine_geometry(tmp_path):
    """The FULL eval pipelines — loader included — must agree: engine
    eval vs jax eval with --fixed-size set to the ENGINE'S input_size
    (not the size requested at export, which stride-rounding may have
    changed). Round 4's phantom 0.09 AP 'export gap' was exactly this
    harness mistake: export --size 448 built a 512 engine, the ckpt leg
    evaluated at 448, and the scale mismatch read as export loss."""
    import json
    from odtk_tpu.infer import infer
    from synth import make_dataset

    img_dir, ann = make_dataset(str(tmp_path), n_images=2, size=(100, 120),
                                max_boxes=2, seed=5)
    # threshold 0 so even an untrained prior-init model emits detections
    m = Model(backbones='ResNet18FPN', classes=3,
              config={'threshold': 0.0, 'detections': 10})
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path / 'm.engine')
    # deliberately unaligned size: rounds up to 128
    export_model(m, (100, 100), precision='fp32', path=path,
                 dynamic_batch_opts=[1, 2, 2])
    eng = Engine.load(path)
    assert eng.input_size == (128, 128)

    det_e = str(tmp_path / 'det_engine.json')
    det_j = str(tmp_path / 'det_jax.json')
    infer(eng, img_dir, [det_e], 64, 128, 2, annotations=ann,
          verbose=False)
    # f32 eval feed for the jax leg: this test wants BIT-IDENTICAL
    # inputs through both pipelines (an untrained model's threshold-0
    # detections are noise — u8-rounded pixels reorder them entirely);
    # the u8 eval feed itself is pinned by test_u8_feed.py.
    import os
    os.environ['ODTK_EVAL_FEED'] = 'f32'
    try:
        infer(m, img_dir, [det_j], 64, 128, 2, annotations=ann,
              mixed_precision=False, verbose=False,
              fixed_size=eng.input_size)
    finally:
        del os.environ['ODTK_EVAL_FEED']
    with open(det_e) as f:
        de = json.load(f)['annotations']
    with open(det_j) as f:
        dj = json.load(f)['annotations']
    assert len(de) == len(dj) > 0
    for a, b in zip(de, dj):
        assert a['image_id'] == b['image_id']
        assert a['category_id'] == b['category_id']
        np.testing.assert_allclose(a['score'], b['score'], atol=1e-5)
        np.testing.assert_allclose(a['bbox'], b['bbox'], atol=1e-3)


def test_engine_rejects_bad_magic(tmp_path):
    p = tmp_path / 'junk.engine'
    p.write_bytes(b'not an engine at all')
    with pytest.raises(Exception):
        Engine.load(str(p))


def test_engine_chunks_oversized_batch(engine):
    # batch 5 > max profile 2: the engine must chunk into profile-sized
    # sub-batches and concatenate (csrc/extensions.cpp:160-181 behavior)
    eng, m = engine
    rng = np.random.RandomState(2)
    imgs = rng.randn(5, 128, 128, 3).astype(np.float32) * 0.1
    s, b, c = eng(imgs)
    assert s.shape[0] == 5 and b.shape[0] == 5 and c.shape[0] == 5
    s1, b1, c1 = eng(imgs[3:4])
    np.testing.assert_allclose(s[3], s1[0], atol=1e-5)
    np.testing.assert_allclose(b[3], b1[0], atol=1e-4)


def test_export_postprocessing_overrides(tmp_path):
    """CLI export can bake threshold/top-n/nms/detections into the
    engine (the reference's TRT plugins carry these as serialized
    params, configurable only by source edits)."""
    from odtk_tpu.main import main as cli_main

    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    ckpt = str(tmp_path / 'm.ckpt')
    m.save({'path': ckpt})
    path = str(tmp_path / 'm.engine')
    cli_main(['export', ckpt, path, '--size', '128', '--full-precision',
              '--dynamic-batch-opts', '1', '1', '1',
              '--detections', '25', '--top-n', '200',
              '--threshold', '0.1', '--nms', '0.4'])
    eng = Engine.load(path)
    assert eng.max_detections == 25
    out = eng(np.random.RandomState(0).randn(1, 128, 128, 3)
              .astype(np.float32))
    assert out[0].shape == (1, 25)


def test_export_clears_stale_training_mesh(tmp_path):
    """A train-then-export in one process must not bake the training
    mesh's shard_map into the serialized single-device graph."""
    import jax
    from odtk_tpu.parallel import make_mesh

    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    mesh = make_mesh(jax.devices())          # 8 virtual CPU devices
    m.set_spmd_mesh(mesh)                    # simulate post-training state
    assert m._spmd_mesh is not None
    path = str(tmp_path / 'm.engine')
    export_model(m, (128, 128), precision='fp32', path=path,
                 dynamic_batch_opts=[1, 1, 1])
    assert m._spmd_mesh is None              # cleared before tracing
    eng = Engine.load(path)
    rng = np.random.RandomState(0)
    imgs = rng.randn(1, 128, 128, 3).astype(np.float32) * 0.1
    s, b, c = eng(imgs)
    assert s.shape[0] == 1
