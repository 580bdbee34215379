"""Inference / evaluation workflow.

Functional parity with odtk/infer.py:18-177: batched jitted inference
(the whole backbone->decode->NMS pipeline is one XLA graph), per-host
result gathering, detection-JSON writing, and COCO evaluation — with
the native CocoEvaluator standing in for pycocotools ('bbox' for axis
models, 'segm' polygon IoU for rotated ones, infer.py:161-173).

Backends: a Model (jit path) or an exported AOT engine
(odtk_tpu.export.Engine — the TensorRT-plan equivalent, infer.py:23).
"""

import jax
import numpy as np

from .data import DataIterator, RotatedDataIterator, CocoEvaluator
from .parallel import make_mesh_for_batch, batch_sharding, \
    replicated_sharding, shard_batch, world_info, all_gather_host, \
    host_local_batch_size, host_local_array
from .utils import Profiler, rotate_box


def infer(model, path, detections_file, resize, max_size, batch_size,
          mixed_precision=True, is_master=True, world=0, annotations=None,
          is_validation=False, verbose=True, rotated_bbox=False,
          use_dali=False, max_det=None, fixed_size=None):
    'Run inference on images from path'
    del use_dali
    import jax.numpy as jnp

    from .model import Model
    backend = 'jax' if isinstance(model, Model) else 'engine'

    rank, world = world_info()
    is_master = rank == 0
    stride = model.stride

    if backend == 'engine':
        # AOT engines are compiled for a fixed input size (infer.py:34)
        fixed_size = model.input_size
        max_size = max(fixed_size)
    elif fixed_size is not None:
        # checkpoint eval at an engine's letterbox geometry (--fixed-size):
        # apples-to-apples ckpt-vs-engine AP at the same input scale
        max_size = max(fixed_size)

    if verbose:
        print('Preparing dataset...')
    iterator_cls = RotatedDataIterator if rotated_bbox else DataIterator
    # jax backend rides the transfer-thin u8 eval feed (raw pixels +
    # in-graph normalize, ops/color.eval_normalize_u8): 4x fewer bytes
    # over the host->device link. ODTK_EVAL_FEED=yuv420 halves the
    # bytes again (chroma subsampled like the source JPEGs; small
    # measured AP cost, see INFERENCE.md); ODTK_EVAL_FEED=f32 restores
    # host-side normalization (float-resize pixels, no u8 rounding).
    # Engines keep the f32 contract their graphs were exported with.
    import os
    eval_feed = 'f32'
    if backend == 'jax':
        eval_feed = os.environ.get('ODTK_EVAL_FEED', 'u8')
        if eval_feed not in ('f32', 'u8', 'yuv420'):
            eval_feed = 'u8'
    data_iterator = iterator_cls(
        path, resize, max_size, batch_size, stride, world, annotations,
        training=False, rank=rank, fixed_size=fixed_size,
        emit=eval_feed)
    eval_feed = data_iterator.emit
    if verbose:
        print(data_iterator)

    if backend == 'jax':
        if mixed_precision:
            model.set_dtype(jnp.bfloat16)
        # clean startup error on multi-host misconfiguration
        # (main.py:170-171)
        mesh = make_mesh_for_batch(host_local_batch_size(batch_size))
        # cached per (dtype, mesh, feed): periodic validation reuses the
        # compiled pipeline instead of re-tracing every val_iters
        infer_fn = model.jitted_inference_fn(mesh, feed=eval_feed)
        # upload weights ONCE: a checkpoint's numpy pytree passed to a
        # jitted fn re-transfers every weight per batch (~5 s/batch over
        # the axon tunnel for ResNet18); a no-op when already on device
        variables = jax.device_put(model.variables,
                                   replicated_sharding(mesh))
    else:
        mesh = None

    if verbose:
        print('   backend: {}'.format(backend))
        print('    device: {} {}'.format(
            len(jax.devices()), jax.devices()[0].platform.upper()))
        print('     batch: {}, precision: {}'.format(
            batch_size, 'mixed (bf16)' if mixed_precision else 'full (fp32)'))
        print(' BBOX type:', 'rotated' if rotated_bbox else 'axis aligned')
        print('Running inference...')

    results = []
    profiler = Profiler(['infer', 'fw'])
    if backend == 'jax':
        # overlapped feed: a feeder thread device_puts batch N+1 while
        # batch N computes (train._device_feed), and result fetches are
        # DEFERRED to the gather phase — per-batch np.asarray would
        # serialize every step behind a device->host roundtrip. Device
        # memory stays bounded: outputs are [B, detections] sized.
        from .train import _device_feed

        def transform(batch):
            if eval_feed == 'yuv420':
                y, c, ids, ratios, sizes = batch
                return shard_batch(mesh, y, c, sizes), ids, ratios
            if eval_feed == 'u8':
                data, ids, ratios, sizes = batch
                return shard_batch(mesh, data, sizes), ids, ratios
            data, ids, ratios = batch
            return (shard_batch(mesh, data),), ids, ratios

        feed = _device_feed(data_iterator, mesh, transform=transform)
        for i, (dev_args, ids, ratios) in enumerate(feed):
            profiler.start('fw')
            scores, boxes, classes = infer_fn(variables, *dev_args)
            profiler.stop('fw')
            results.append([scores, boxes, classes, ids, ratios])
            profiler.bump('infer')
            if verbose and (profiler.totals['infer'] > 60
                            or i == len(data_iterator) - 1):
                size = len(data_iterator.ids)
                msg = '[{:{len}}/{}]'.format(
                    min((i + 1) * batch_size, size), size,
                    len=len(str(size)))
                msg += ' {:.3f}s/{}-batch (dispatch)'.format(
                    profiler.means['infer'], batch_size)
                print(msg, flush=True)
                profiler.reset()
    else:
        for i, (data, ids, ratios) in enumerate(data_iterator):
            profiler.start('fw')
            scores, boxes, classes = model(data)
            profiler.stop('fw')
            results.append([np.asarray(scores), np.asarray(boxes),
                            np.asarray(classes), ids, ratios])
            profiler.bump('infer')
            if verbose and (profiler.totals['infer'] > 60
                            or i == len(data_iterator) - 1):
                size = len(data_iterator.ids)
                msg = '[{:{len}}/{}]'.format(
                    min((i + 1) * batch_size, size), size,
                    len=len(str(size)))
                msg += ' {:.3f}s/{}-batch'.format(profiler.means['infer'],
                                                  batch_size)
                msg += ' (fw: {:.3f}s)'.format(profiler.means['fw'])
                msg += ', {:.1f} im/s'.format(
                    batch_size / profiler.means['infer'])
                print(msg, flush=True)
                profiler.reset()

    if verbose:
        print('Gathering results...')
    if backend == 'jax':
        # deferred device->host fetch (multi-host: this host's rows;
        # all_gather_host merges below)
        results = [[host_local_array(s), host_local_array(b),
                    host_local_array(c), ids, ratios]
                   for s, b, c, ids, ratios in results]
    results = [np.concatenate(r, axis=0) for r in zip(*results)]
    if world > 1:
        gathered = [all_gather_host(r) for r in results]
        results = [g.reshape(-1, *r.shape[1:])
                   for g, r in zip(gathered, results)]

    if not is_master:
        return 0

    detections = []
    processed_ids = set()
    for scores, boxes, classes, image_id, ratio in zip(*results):
        image_id = int(image_id)
        if image_id in processed_ids:
            continue
        processed_ids.add(image_id)
        keep = scores > 0
        scores_k = scores[keep]
        boxes_k = boxes[keep]
        classes_k = classes[keep].astype(np.int64)
        if rotated_bbox:
            boxes_k = boxes_k.copy()
            boxes_k[:, :4] /= ratio
        else:
            boxes_k = boxes_k / ratio

        cat_ids = data_iterator.coco.get_cat_ids()
        for score, box, cat in zip(scores_k, boxes_k, classes_k):
            if rotated_bbox:
                x1, y1, x2, y2, sin, cos = box.tolist()
                theta = float(np.arctan2(sin, cos))
                w = x2 - x1 + 1
                h = y2 - y1 + 1
                seg = rotate_box([x1, y1, w, h, theta])
            else:
                x1, y1, x2, y2 = box.tolist()
            cat = int(cat)
            if cat_ids:
                cat = cat_ids[cat]
            this_det = {
                'image_id': image_id,
                'score': float(score),
                'category_id': cat}
            if rotated_bbox:
                this_det['bbox'] = [x1, y1, x2 - x1 + 1, y2 - y1 + 1, theta]
                this_det['segmentation'] = [seg]
            else:
                this_det['bbox'] = [x1, y1, x2 - x1 + 1, y2 - y1 + 1]
            detections.append(this_det)

    if not detections:
        print('No detections!')
        return None

    # Save detections (schema parity: infer.py:150-159)
    out = {'annotations': detections,
           'images': data_iterator.coco.dataset.get('images', [])}
    if 'categories' in data_iterator.coco.dataset:
        out['categories'] = data_iterator.coco.dataset['categories']
    if detections_file:
        if isinstance(detections_file, str):
            detections_file = [detections_file]
        for d_file in detections_file:
            if verbose:
                print('Writing {}...'.format(d_file))
            import json
            with open(d_file, 'w') as f:
                json.dump(out, f, indent=4)

    if 'annotations' in data_iterator.coco.dataset:
        if verbose:
            print('Evaluating model...')
        evaluator = CocoEvaluator(
            data_iterator.coco,
            iou_type='segm' if rotated_bbox else 'bbox')
        stats = evaluator.evaluate(detections, verbose=True)
        return stats
    return None
