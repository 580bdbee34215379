#!/usr/bin/env python3
"""Benchmark: ResNet50FPN batch-1 end-to-end inference latency on one chip.

Mirrors the reference's headline inference benchmark conditions
(README.md:26-33, BASELINE.md): batch 1, resize 800, post-processing
(decode+NMS) INCLUDED, half precision. Baseline to beat: 11 ms on
A100 FP16 (ResNet50FPN row). The whole pipeline is one jitted XLA
graph; we time steady-state wall clock with device sync.

Also measures the INT8 engine path (calibrated activation+weight
quantization executing int8 convs on the MXU) against the reference's
8 ms A100 INT8 row — reported as extra keys on the same JSON line.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

BASELINE_MS = 11.0        # ResNet50FPN A100 FP16 b=1 (BASELINE.md)
BASELINE_INT8_MS = 8.0    # ResNet50FPN A100 INT8 b=1 (README.md:33)
SIZE = (800, 800)
WARMUP = 5
ITERS = 30

# Transient TPU-backend failure signatures (the tunneled axon backend
# can 500 a remote compile or wedge for minutes after a killed client —
# see CLAUDE.md). One such exception must not erase a bench leg.
_TRANSIENT = ('remote_compile', 'HTTP 500', 'UNAVAILABLE', 'DEADLINE',
              'INTERNAL', 'RESOURCE_EXHAUSTED', 'Socket closed',
              'failed to connect')
_RETRY_BUDGET = [float(__import__('os').environ.get(
    'ODTK_BENCH_RETRY_BUDGET_S', '5400'))]  # total sleep across ALL legs


def _retry(fn, *args, label='', max_attempts=6, **kwargs):
    """Run a bench leg, retrying transient backend failures as a
    persistent in-process client (the CLAUDE.md protocol: do NOT
    kill-and-restart — each killed client can refresh the server-side
    wedge; wait in-process and try again). Backend wedges last up to an
    hour, so three geometric backoffs lose the leg (round 3 lost
    e2e_train, round 4 lost rotated_train exactly this way): retry
    every 1-2 min while the shared budget allows — but cap attempts
    PER LEG: a graph whose compile 500s deterministically (r3-r5
    rotated train) would otherwise eat the whole wedge budget; a real
    wedge re-triggers retries on every subsequent leg anyway, so the
    cap loses nothing. Non-transient errors re-raise immediately so
    the caller's except-with-error-key records what happened."""
    import sys
    last = None
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — classified below
            if not any(p in str(e) for p in _TRANSIENT):
                raise
            last = e
        attempt += 1
        wait = min(60.0 if attempt < 3 else 120.0, _RETRY_BUDGET[0])
        if wait <= 0 or attempt >= max_attempts:
            raise last
        print(f'bench[{label}]: transient backend error (attempt '
              f'{attempt}, {_RETRY_BUDGET[0]:.0f}s retry budget left), '
              f'retrying in {wait:.0f}s: {str(last)[:160]}',
              file=sys.stderr, flush=True)
        time.sleep(wait)
        _RETRY_BUDGET[0] -= wait


def measure(fn, *args):
    """Amortized per-call latency of fn(*args) in ms.

    block_until_ready does not synchronize over the axon tunnel, so we
    time K chained dispatches with one host fetch at the end and
    difference two K values — the fetch cost cancels, and back-to-back
    dispatches serialize on the device stream.
    """
    out = fn(*args)
    np.asarray(out[0])
    for _ in range(WARMUP):
        out = fn(*args)
    np.asarray(out[0])

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        np.asarray(o[0])
        return time.perf_counter() - t0

    k1, k2 = ITERS // 4, ITERS
    t1 = min(run(k1) for _ in range(3))
    t2 = min(run(k2) for _ in range(3))
    return float((t2 - t1) / (k2 - k1) * 1e3)


def main():
    import os
    import threading
    import jax
    import jax.numpy as jnp
    from odtk_tpu.model import Model

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    # The tunneled TPU backend can wedge for an hour+ after a client is
    # killed mid-claim; a hung jax.devices() would stall the harness
    # silently. Probe init on a daemon thread and fail loudly instead.
    ready = threading.Event()
    state = {}

    def _probe():
        try:
            jax.devices()
            state['ok'] = True
        except Exception as e:  # noqa: BLE001 — reported below
            state['err'] = str(e)[:200]
        finally:
            ready.set()

    # Host pipeline throughput first: CPU-only, reported either way.
    host = bench_host_loader()

    threading.Thread(target=_probe, daemon=True).start()
    ready.wait(float(os.environ.get('ODTK_BENCH_INIT_TIMEOUT', '900')))
    if 'ok' not in state:
        print(json.dumps({
            'metric': 'resnet50fpn_b1_800_e2e_latency', 'value': None,
            'unit': 'ms', 'vs_baseline': None,
            'error': state.get('err', 'TPU backend init timed out '
                                      '(chip claim unavailable)'),
            **host,
        }), flush=True)
        os._exit(1)   # after flush: block-buffered pipes would lose it

    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))

    fn = jax.jit(model.inference_fn)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, SIZE[0], SIZE[1], 3), jnp.float32)

    ms = _retry(measure, fn, model.variables, images, label='b1_e2e')
    result = {
        'metric': 'resnet50fpn_b1_800_e2e_latency',
        'value': round(ms, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS / ms, 3),
        **host,
    }

    # INT8 engine path (w8a16: int8 weights dequantized in-graph, bf16
    # MXU compute — full w8a8 int8 convs measured 2.3x slower through
    # XLA's current TPU conv lowering, see CLAUDE.md). Calibration on
    # noise images: latency is scale-independent.
    try:
        from odtk_tpu.quantize import (capture_activation_absmax,
                                       flatten_absmax,
                                       build_quant_variables)
        absmax = flatten_absmax(
            capture_activation_absmax(model, images))
        qvars, _ = build_quant_variables(model.variables, absmax)
        qvars = jax.device_put(qvars)     # numpy would re-upload per call
        fn8 = jax.jit(model.inference_fn)
        ms8 = _retry(measure, fn8, qvars, images, label='int8')
        result['int8_latency_ms'] = round(ms8, 3)
        result['int8_vs_baseline'] = round(BASELINE_INT8_MS / ms8, 3)
    except Exception as e:  # noqa: BLE001 — int8 extra must not kill the bench
        result['int8_error'] = str(e)[:200]

    # Batched serving throughput (same graph at b=8): the deployment
    # regime the reference serves via TRT multi-stream; decode+NMS
    # included. Reference single-stream rate: 91 FPS (A100 FP16).
    try:
        imgs8 = jnp.asarray(rng.randn(8, SIZE[0], SIZE[1], 3), jnp.float32)
        ms8b = _retry(measure, fn, model.variables, imgs8, label='serving_b8')
        result['serving_b8_im_s'] = round(8 / ms8b * 1e3, 1)
    except Exception as e:  # noqa: BLE001
        result['serving_error'] = str(e)[:200]

    # Rotated-box b=1 inference: same pipeline with 6-channel boxes and
    # the Pallas rotated NMS kernel (polygon clip in VMEM) in-graph.
    if os.environ.get('ODTK_BENCH_ROTATED', '1') != '0':
        try:
            rmodel = Model(backbones='ResNet50FPN', classes=80,
                           dtype=jnp.bfloat16, rotated_bbox=True)
            rmodel.initialize(rng=0, image_size=(256, 256))
            rvars = jax.device_put(rmodel.variables)
            rfn = jax.jit(rmodel.inference_fn)
            msr = _retry(measure, rfn, rvars, images, label='rotated_b1')
            result['rotated_b1_800_e2e_ms'] = round(msr, 3)
        except Exception as e:  # noqa: BLE001
            result['rotated_infer_error'] = str(e)[:200]

    # Training throughput (im/s/chip): full train step — fwd, anchor
    # assignment, focal+smoothL1, bwd, SGD update — at the repo's
    # recorded conditions (b=8 @832, PARITY.md). North star:
    # >=40k img/s on a v5e-256 pod = 156 im/s/chip (BASELINE.md).
    try:
        result.update(_retry(bench_train, model_cls=Model, label='train'))
    except Exception as e:  # noqa: BLE001
        result['train_error'] = str(e)[:200]

    # End-to-end training: host loader FEEDING the chip (decode ->
    # augment -> canvas -> transfer -> step, prefetch overlapped) — the
    # number real training sees. On a 1-core host this is loader-bound;
    # the host_wait diagnostic attributes it.
    try:
        result.update(_retry(bench_e2e_train, model_cls=Model,
                             label='e2e_train'))
    except Exception as e:  # noqa: BLE001
        result['e2e_train_error'] = str(e)[:200]

    # End-to-end evaluation: the same loader-fed question for infer()
    # (u8 eval feed + overlapped upload + deferred fetches).
    try:
        result.update(_retry(bench_e2e_eval, model_cls=Model,
                             label='e2e_eval'))
    except Exception as e:  # noqa: BLE001
        result['e2e_eval_error'] = str(e)[:200]

    # Rotated-box training throughput (3-angle anchors triple the head
    # channels, so the premium over axis is mostly inherent compute).
    # Skippable via ODTK_BENCH_ROTATED=0 if the compile cache is cold.
    if os.environ.get('ODTK_BENCH_ROTATED', '1') != '0':
        try:
            rot = _retry(bench_train, model_cls=Model, rotated=True,
                         label='rotated_train')
            result['rotated_train_im_s_per_chip'] = rot['train_im_s_per_chip']
            result['rotated_train_step_ms'] = rot['train_step_ms']
            # dense-small-target variant: same compiled step, data that
            # stresses the chunked polygon assignment loop
            rot_s = _retry(bench_train, model_cls=Model, rotated=True,
                           small_targets=True, label='rotated_small24')
            result['rotated_small24_step_ms'] = rot_s['train_step_ms']
        except Exception as e:  # noqa: BLE001
            result['rotated_train_error'] = str(e)[:200]

    print(json.dumps(result))


def bench_host_loader():
    """CPU-only host data-pipeline throughput (the DALI-equivalent
    path: native JPEG decode -> augment -> batch canvas), reported
    whether or not the TPU is reachable.

    Emits attribution diagnostics alongside the rates (BENCH_r02
    recorded an unexplained 8x eval-rate swing vs the repo-local run):
    whether the native decoder loaded, the thread count actually used,
    the cores visible to this process, system load at start, and a
    decode-only rate that isolates the JPEG stage from
    threading/augment/canvas overheads."""
    try:
        import os
        import sys
        import tempfile
        import time as _time
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), 'tests'))
        from synth import make_dataset
        from odtk_tpu.data import native
        from odtk_tpu.data.loader import DataIterator

        out = {'host_native': bool(native.available())}
        try:
            out['host_cores'] = len(os.sched_getaffinity(0))
            out['host_loadavg'] = round(os.getloadavg()[0], 2)
        except (AttributeError, OSError):
            pass
        with tempfile.TemporaryDirectory() as root:
            img_dir, anns = make_dataset(root, n_images=64,
                                         size=(640, 640), max_boxes=4,
                                         fmt='jpg')
            if out['host_native']:
                # decode-only rate: native JPEG decode+resize+normalize,
                # no threads, no canvas assembly. 3 passes, min AND
                # median on record: r03->r04 recorded an unexplained 2x
                # swing from a single pass (competing load / cold page
                # cache) — min is the capability number, median the
                # availability number.
                blobs = [open(os.path.join(img_dir, f), 'rb').read()
                         for f in sorted(os.listdir(img_dir))
                         if f.endswith('.jpg')]
                for blob in blobs[:4]:                       # warm
                    native.decode_jpeg(blob, 832, 1024, normalize=True)
                rates = []
                for _ in range(3):
                    t0 = _time.perf_counter()
                    for blob in blobs:
                        native.decode_jpeg(blob, 832, 1024, normalize=True)
                    rates.append(len(blobs) / (_time.perf_counter() - t0))
                rates.sort()
                out['host_decode_im_s'] = round(rates[-1], 1)   # best
                out['host_decode_im_s_median'] = round(rates[1], 1)
                # u8 decode rate (the train-feed path: no color math)
                if getattr(native._load(), '_has_u8', False):
                    t0 = _time.perf_counter()
                    for blob in blobs:
                        native.decode_jpeg_u8(blob, 832, 1024)
                    out['host_decode_u8_im_s'] = round(
                        len(blobs) / (_time.perf_counter() - t0), 1)
            for training, key in ((False, 'host_loader_eval_im_s'),
                                  (True, 'host_loader_train_im_s')):
                augs = dict(augment_brightness=0.002,
                            augment_contrast=0.002, augment_hue=0.0002,
                            augment_saturation=0.002,
                            emit='u8') if training else {}
                it = DataIterator(img_dir, resize=832, max_size=1024,
                                  batch_size=8, stride=128, world=1,
                                  annotations=anns, training=training,
                                  **augs)
                out['host_threads'] = it.num_threads
                for b in it:            # warm epoch
                    pass
                n, t0 = 0, _time.perf_counter()
                for _ in range(2):
                    for b in it:
                        n += b[0].shape[0]
                out[key] = round(n / (_time.perf_counter() - t0), 1)
        return out
    except Exception as e:  # noqa: BLE001 — host bench must not kill it
        return {'host_loader_error': str(e)[:200]}


def bench_train(model_cls, batch=8, size=832, steps=24, rotated=False,
                small_targets=False):
    import jax
    import jax.numpy as jnp
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch

    model = model_cls(backbones='ResNet50FPN', classes=80,
                      dtype=jnp.bfloat16, rotated_bbox=rotated)
    model.initialize(rng=0, image_size=(256, 256))
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)
    params = model.variables['params']
    frozen = model.variables['frozen']
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)

    rng = np.random.RandomState(0)
    data = rng.randn(batch, size, size, 3).astype(np.float32) * 0.5
    ncol = 6 if rotated else 5
    targets = np.full((batch, 32, ncol), -1.0, np.float32)
    if small_targets:
        # COCO-like dense small objects: stresses per-target anchor
        # assignment (24 in-band targets/image at the fine strides)
        nt = 24
        targets[:, :nt, :2] = rng.uniform(50, size - 80, (batch, nt, 2))
        targets[:, :nt, 2:4] = rng.uniform(10, 45, (batch, nt, 2))
    else:
        nt = 4
        targets[:, :nt, :2] = rng.uniform(100, 600, (batch, nt, 2))
        targets[:, :nt, 2:4] = rng.uniform(40, 300, (batch, nt, 2))
    if rotated:
        targets[:, :nt, 4] = rng.uniform(-0.7, 0.7, (batch, nt))
    targets[:, :nt, ncol - 1] = rng.randint(0, 80, (batch, nt))
    images, tgts = shard_batch(mesh, data, targets)

    def run(k, params, opt_state):
        t0 = time.perf_counter()
        for _ in range(k):
            params, opt_state, cl, bl = step(params, opt_state, frozen,
                                             images, tgts)
        float(cl)          # sync
        return time.perf_counter() - t0, params, opt_state

    _, params, opt_state = run(4, params, opt_state)       # warm
    k1, k2 = steps // 4, steps
    t1, params, opt_state = run(k1, params, opt_state)
    t2, params, opt_state = run(k2, params, opt_state)
    sec = (t2 - t1) / (k2 - k1)
    out = {'train_im_s_per_chip': round(batch / sec, 2),
           'train_step_ms': round(sec * 1e3, 2),
           'train_batch': batch, 'train_size': size}
    if not rotated and not small_targets:
        # MFU: XLA-counted step flops / wall time vs chip peak (v5e
        # bf16 = 197 TFLOP/s; override via ODTK_PEAK_TFLOPS) — tracks
        # efficiency across rounds, not just im/s
        try:
            import os
            ca = step.lower(params, opt_state, frozen, images,
                            tgts).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get('flops', 0.0))
            if flops > 0:
                peak = float(os.environ.get('ODTK_PEAK_TFLOPS',
                                            '197')) * 1e12
                out['train_flops_per_step_g'] = round(flops / 1e9, 1)
                out['train_mfu'] = round(flops / sec / peak, 4)
        except Exception:  # noqa: BLE001 — diagnostics only
            pass
    return out


def bench_e2e_train(model_cls, batch=8, size=832, epochs=3):
    """Loader-fed training throughput: synthetic JPEGs stream through
    the threaded host pipeline into the jitted train step — the
    overlapped whole that DALI's copy_to_external keeps fed on GPU
    (dali.py:151-157). Production configuration: u8 feed (4x fewer
    tunnel bytes, color affine in-graph) with a feeder thread
    device_putting batch N+1 while step N runs, exactly train.py's
    _device_feed. Attribution covers both threads: feeder-side
    host/put, consumer-side queue-wait/dispatch, and the final drain,
    with pct_explained = (get_wait+dispatch+sync)/wall so unexplained
    step time can't hide again (round 4: 2.4 s/step unattributed)."""
    import os
    import queue
    import sys
    import tempfile
    import threading
    import jax
    import jax.numpy as jnp
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests'))
    from synth import make_dataset
    from odtk_tpu.data.loader import DataIterator

    model = model_cls(backbones='ResNet50FPN', classes=80,
                      dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)
    params = model.variables['params']
    frozen = model.variables['frozen']
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh, feed='yuv420')

    with tempfile.TemporaryDirectory() as root:
        img_dir, anns = make_dataset(root, n_images=64, size=(640, 640),
                                     max_boxes=4, fmt='jpg')
        it = DataIterator(img_dir, resize=size, max_size=1024,
                          batch_size=batch, stride=128, world=1,
                          annotations=anns, training=True, max_det=32,
                          augment_brightness=0.002, augment_contrast=0.002,
                          augment_hue=0.0002, augment_saturation=0.002,
                          emit='yuv420')

        def put(b):
            # loader tuple (y, cbcr, targets, colors, sizes) -> step
            # argument order (y, cbcr, colors, sizes, targets)
            return shard_batch(mesh, b[0], b[1], b[3], b[4], b[2])

        for b in it:                                 # warm: compile + cache
            params, opt_state, cl, bl = step(params, opt_state, frozen,
                                             *put(b))
        float(cl)

        stats = {'host': 0.0, 'put': 0.0}
        q = queue.Queue(maxsize=2)

        def feeder():
            try:
                for _ in range(epochs):
                    tw = time.perf_counter()
                    for b in it:
                        stats['host'] += time.perf_counter() - tw
                        tt = time.perf_counter()
                        arrays = put(b)
                        stats['put'] += time.perf_counter() - tt
                        q.put((arrays, sum(a.nbytes for a in b)))
                        tw = time.perf_counter()
                q.put(None)
            except Exception as e:  # noqa: BLE001 — surfaced in consumer
                q.put(e)

        th = threading.Thread(target=feeder, daemon=True)
        n_steps, n_bytes = 0, 0
        get_wait = dispatch = 0.0
        t0 = time.perf_counter()
        th.start()
        while True:
            tg = time.perf_counter()
            item = q.get()
            get_wait += time.perf_counter() - tg
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            arrays, nbytes = item
            td = time.perf_counter()
            params, opt_state, cl, bl = step(params, opt_state, frozen,
                                             *arrays)
            dispatch += time.perf_counter() - td
            n_steps += 1
            n_bytes += nbytes
        ts = time.perf_counter()
        float(cl)                                    # drain the device
        sync = time.perf_counter() - ts
        sec = time.perf_counter() - t0
    n_im = n_steps * batch
    return {'e2e_train_im_s': round(n_im / sec, 2),
            'e2e_train_step_ms': round(sec / n_steps * 1e3, 2),
            'e2e_feed': 'yuv420',
            'e2e_mb_per_step': round(n_bytes / n_steps / 1e6, 2),
            'e2e_host_ms': round(stats['host'] / n_steps * 1e3, 2),
            'e2e_put_ms': round(stats['put'] / n_steps * 1e3, 2),
            'e2e_get_wait_ms': round(get_wait / n_steps * 1e3, 2),
            'e2e_dispatch_ms': round(dispatch / n_steps * 1e3, 2),
            'e2e_sync_ms': round(sync / n_steps * 1e3, 2),
            'e2e_pct_explained': round(
                100 * (get_wait + dispatch + sync) / sec, 1)}


def bench_e2e_eval(model_cls, batch=8, size=800, epochs=3):
    """Loader-fed inference throughput through the REAL infer() loop:
    u8 eval feed, overlapped uploads, deferred fetches, detections
    written and parsed — the serving-adjacent number an `odtk-tpu
    infer` user sees end-to-end (vs serving_b8_im_s, which times the
    compiled graph alone on device-resident input)."""
    import io
    import os
    import sys
    import tempfile
    import contextlib
    import jax.numpy as jnp
    from odtk_tpu.infer import infer
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests'))
    from synth import make_dataset

    model = model_cls(backbones='ResNet50FPN', classes=80,
                      dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    with tempfile.TemporaryDirectory() as root:
        img_dir, anns = make_dataset(root, n_images=64, size=(640, 640),
                                     max_boxes=4, fmt='jpg')
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            infer(model, img_dir, None, size, 1024, batch,
                  annotations=None, verbose=False)     # warm: compile
        n, t0 = 0, time.perf_counter()
        for _ in range(epochs):
            with contextlib.redirect_stdout(buf):
                infer(model, img_dir, None, size, 1024, batch,
                      annotations=None, verbose=False)
            n += 64
        sec = time.perf_counter() - t0
    return {'e2e_eval_im_s': round(n / sec, 2)}


if __name__ == '__main__':
    main()
