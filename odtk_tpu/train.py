"""Training workflow: jitted DP train step, schedule, checkpoints, logging.

Functional parity with odtk/train.py:18-220, redesigned for TPU:
  * SGD(momentum 0.9) + L2 weight decay via optax, with the reference's
    warmup+milestone LambdaLR schedule (train.py:52-57) as an optax
    schedule — lr changes live inside the compiled graph, no recompile.
  * Mixed precision = bf16 compute, fp32 params/loss. bf16 keeps
    fp32's exponent range, so the reference's loss-scaling half of
    GradScaler/Apex (train.py:37-43,91) has no equivalent — but the
    scaler's OTHER job, silently skipping steps whose grads overflow
    fp16 (a de-facto spike guard), does: the train step skips the
    parameter/optimizer update in-graph whenever the global gradient
    norm is non-finite, and ``clip_grads`` adds the standard
    global-norm clip for recipes (rotated fine-tune) whose gradient
    spikes stay finite in bf16 but would have tripped fp16.
  * DDP gradient allreduce (implicit NCCL) -> XLA psum inserted by jit
    over the batch-sharded ``data`` mesh axis; the explicit loss
    all_reduce (train.py:127-131) is likewise free: the loss is already
    a global mean under SPMD.
  * Divergence guard, ~60 s checkpoint/log cadence, TensorBoard scalars,
    optional metrics POST, periodic validation — same observable
    behavior (train.py:136-214).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data import DataIterator, RotatedDataIterator
from .infer import infer
from .io import checkpoint as ckpt_io
from .parallel import make_mesh_for_batch, batch_sharding, \
    replicated_sharding, shard_batch, world_info, host_local_batch_size
from .utils import ignore_sigint, post_metrics, Profiler


def lr_schedule(lr, warmup, milestones, gamma):
    """Reference LambdaLR closure (train.py:52-57) as an optax schedule."""
    milestones = jnp.asarray(sorted(milestones), jnp.float32) \
        if milestones else jnp.zeros((0,), jnp.float32)

    def schedule(count):
        it = count.astype(jnp.float32) if hasattr(count, 'astype') \
            else jnp.float32(count)
        decayed = gamma ** jnp.sum(milestones <= it) if milestones.size \
            else 1.0
        if warmup:
            warm = 0.9 * it / warmup + 0.1
            return lr * jnp.where(it <= warmup, warm, decayed)
        return lr * decayed

    return schedule


def make_optimizer(lr, warmup, milestones, gamma, weight_decay=1e-4,
                   momentum=0.9, flat=False, clip_grads=0.0):
    """SGD+momentum with decoupled-from-schedule L2 (torch-SGD order:
    wd folds into the gradient before the momentum buffer).

    clip_grads > 0 clips the raw gradients by global norm BEFORE weight
    decay and momentum (torch clip_grad_norm_ order).

    flat=True runs the update on ONE raveled parameter vector instead
    of per-tensor tree ops. Measured dead end on v5e (82.7 -> 86.9
    ms/step at b=8 @832): the ~160 per-tensor update fusions looked
    like ~12 ms in the op trace, but XLA overlaps them with the conv
    backward, while the ravel/unravel concat+slice adds ~2.5 GB of
    real HBM traffic on the critical path. Kept (numerically identical,
    tested) for profiling comparisons.
    """
    schedule = lr_schedule(lr, warmup, milestones, gamma)
    if not flat:
        chain = [optax.add_decayed_weights(weight_decay),
                 optax.trace(decay=momentum),
                 optax.scale_by_learning_rate(schedule)]
        if clip_grads and clip_grads > 0:
            chain.insert(0, optax.clip_by_global_norm(clip_grads))
        return optax.chain(*chain)

    from jax.flatten_util import ravel_pytree

    def init(params):
        vec, _ = ravel_pytree(params)
        return {'trace': jnp.zeros_like(vec),
                'count': jnp.zeros([], jnp.int32)}

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        if clip_grads and clip_grads > 0:
            gn = jnp.linalg.norm(g)
            g = g * jnp.minimum(1.0, clip_grads / jnp.maximum(gn, 1e-12))
        g = g + weight_decay * p
        mu = state['trace'] * momentum + g
        upd = (-schedule(state['count'])) * mu
        return unravel(upd), {'trace': mu, 'count': state['count'] + 1}

    return optax.GradientTransformation(init, update)


# in-graph color math for the transfer-thin feeds (re-exported here
# for the train-step builders and existing callers; implementation in
# ops/color.py so model/infer can share it without import cycles)
from .ops.color import apply_color_affine, apply_color_affine_yuv  # noqa: E402,F401


def make_train_step(model, tx, mesh, u8_feed=False, feed=None):
    """Jitted SPMD train step: (params, opt, frozen, images, targets) ->
    (params, opt, cls_loss, box_loss).

    feed selects the host->device format (what crosses the link is the
    difference between feeding and starving a chip behind a thin host
    link; measured 41 MB/s through the axon tunnel):
      * 'f32' (default)  — normalized float images, 12 B/px;
      * 'u8'             — raw pixels + per-image color affine applied
                           in-graph, 3 B/px; signature (params, opt,
                           frozen, images_u8, colors, sizes, targets);
      * 'yuv420'         — chroma-subsampled planes (what the JPEG
                           itself stores), 1.5 B/px; signature (params,
                           opt, frozen, y, cbcr, colors, sizes,
                           targets).
    u8_feed=True is legacy shorthand for feed='u8'."""
    feed = 'u8' if u8_feed else (feed or 'f32')
    rep = replicated_sharding(mesh)
    img_shard = batch_sharding(mesh, 4)
    tgt_shard = batch_sharding(mesh, 3)
    # the fused focal and stem-pool kernels can't be auto-partitioned
    # by GSPMD; hand the mesh to the model so it wraps them in shard_map
    model._loss_mesh = mesh if mesh.size > 1 else None
    model.set_spmd_mesh(mesh)
    # wpack 'auto' policy: pack layer1 to full MXU lane width in the
    # training graph only (65.3 vs 67.4 ms b=8 @832; b=1 inference
    # prefers the unpacked form — see Model.__init__)
    if getattr(model, 'wpack_auto', False):
        model.set_wpack_layer1(True)

    def update(params, opt_state, frozen, images, targets):
        def loss_fn(p):
            cl, bl = model.loss_fn({'params': p, 'frozen': frozen},
                                   images, targets)
            return cl + bl, (cl, bl)

        (_, (cl, bl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # GradScaler-equivalent step skip (reference train.py:91 via
        # scaler.step): a non-finite gradient leaves params AND the
        # momentum buffers untouched, so one pathological batch can't
        # poison the run. In-graph, so no host sync; the select fuses
        # into apply_updates.
        ok = jnp.isfinite(optax.global_norm(grads))
        pick = lambda n, o: jnp.where(ok, n, o)
        params = jax.tree.map(pick, new_params, params)
        opt_state = jax.tree.map(pick, new_opt, opt_state)
        return params, opt_state, cl, bl

    if feed == 'f32':
        return jax.jit(
            update,
            in_shardings=(rep, rep, rep, img_shard, tgt_shard),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1))

    if feed == 'u8':
        def step_u8(params, opt_state, frozen, images_u8, colors, sizes,
                    targets):
            images = apply_color_affine(images_u8, colors, sizes)
            return update(params, opt_state, frozen, images, targets)

        return jax.jit(
            step_u8,
            in_shardings=(rep, rep, rep, img_shard,
                          batch_sharding(mesh, 3), batch_sharding(mesh, 2),
                          tgt_shard),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1))

    assert feed == 'yuv420', feed

    def step_yuv(params, opt_state, frozen, y, cbcr, colors, sizes,
                 targets):
        images = apply_color_affine_yuv(y, cbcr, colors, sizes)
        return update(params, opt_state, frozen, images, targets)

    return jax.jit(
        step_yuv,
        in_shardings=(rep, rep, rep, batch_sharding(mesh, 3), img_shard,
                      batch_sharding(mesh, 3), batch_sharding(mesh, 2),
                      tgt_shard),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1))


def _device_feed(data_iterator, mesh, prefetch=2, transform=None):
    """One epoch of device-resident batches, transfers overlapped.

    A feeder thread device_puts batch N+1 (and N+2) while the main
    thread dispatches step N — the host->device overlap DALI's
    copy_to_external gives the reference on GPU (dali.py:151-157).
    Without it, every step serializes behind its own upload (measured
    3.2 s/step for the fp32 feed over the axon tunnel vs 66 ms of
    compute). Exceptions in the feeder (loader errors, transfer
    failures) surface in the consumer. ``transform`` maps a host batch
    to the queued item (default: device_put every array); infer uses it
    to upload images while keeping ids/ratios host-side."""
    import queue
    import threading

    q = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()
    done = object()

    def run():
        try:
            for batch in data_iterator:
                if transform is not None:
                    arrays = transform(batch)
                else:
                    arrays = shard_batch(mesh, *batch)
                while not stop.is_set():
                    try:
                        q.put(arrays, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(done)
        except Exception as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


def train(model, state, path, annotations, val_path, val_annotations,
          resize, max_size, jitter, batch_size, iterations, val_iterations,
          lr, warmup, milestones, gamma, is_master=True, world=1,
          mixed_precision=True, verbose=True, metrics_url=None, logdir=None,
          rotate_augment=False, crop_augment=False,
          augment_brightness=0.0, augment_contrast=0.0,
          augment_hue=0.0, augment_saturation=0.0, regularization_l2=0.0001,
          rotated_bbox=False, absolute_angle=False, max_det=128,
          use_dali=False, profile_dir=None, sync_every=8, clip_grads=0.0,
          feed=None):
    'Train the model on the given dataset'
    del use_dali  # host pipeline is always the fused loader on TPU
    # transfer-thin yuv420 feed by default (ships the chroma-subsampled
    # information content the JPEGs themselves store; 8x fewer link
    # bytes than f32). ODTK_FEED=u8 keeps full-res chroma (identical
    # math to f32, tested); ODTK_FEED=f32 restores the float path.
    feed = feed or os.environ.get('ODTK_FEED', 'yuv420')
    if feed not in ('yuv420', 'u8', 'f32'):
        raise ValueError(f'unknown feed mode {feed!r}')

    rank, world = world_info()
    is_master = rank == 0
    stride = model.stride

    if mixed_precision:
        model.set_dtype(jnp.bfloat16)

    # clean startup error on multi-host misconfiguration (main.py:170-171)
    mesh = make_mesh_for_batch(host_local_batch_size(batch_size))
    tx = make_optimizer(lr, warmup, milestones, gamma, regularization_l2,
                        clip_grads=clip_grads)
    params = model.variables['params']
    frozen = model.variables['frozen']
    opt_state = tx.init(params)
    if 'optimizer' in state and state['optimizer'] is not None:
        opt_state = ckpt_io.restore_opt_state(state['optimizer'], opt_state)

    train_step = make_train_step(model, tx, mesh, feed=feed)

    if verbose:
        print('Preparing dataset...')
    iterator_cls = RotatedDataIterator if rotated_bbox else DataIterator
    data_iterator = iterator_cls(
        path, jitter, max_size, batch_size, stride, world, annotations,
        training=True, rotate_augment=rotate_augment,
        crop_augment=crop_augment,
        augment_brightness=augment_brightness,
        augment_contrast=augment_contrast, augment_hue=augment_hue,
        augment_saturation=augment_saturation, max_det=max_det, rank=rank,
        absolute_angle=absolute_angle, emit=feed)
    if verbose:
        print(data_iterator)
        print('    device: {} {}'.format(
            len(jax.devices()), jax.devices()[0].platform.upper()))
        print('     batch: {}, precision: {}'.format(
            batch_size, 'mixed (bf16)' if mixed_precision else 'full (fp32)'))
        print(' BBOX type:', 'rotated' if rotated_bbox else 'axis aligned')
        print('Training model for {} iterations...'.format(iterations))

    writer = None
    if is_master and logdir is not None:
        from tensorboardX import SummaryWriter
        if verbose:
            print('Writing TensorBoard logs to: {}'.format(logdir))
        writer = SummaryWriter(log_dir=logdir)

    def save_checkpoint(iteration):
        model.variables = {'params': jax.device_get(params),
                           'frozen': frozen}
        state.update({
            'iteration': iteration,
            'optimizer': jax.device_get(opt_state),
            'scheduler': {'last_iter': iteration},
        })
        with ignore_sigint():
            model.save(state)

    profiler = Profiler(['train', 'fw', 'bw'])
    iteration = state.get('iteration', 0)
    # Device tracing (the torch.profiler/NVTX counterpart): capture a
    # jax.profiler trace of steady-state iterations 10..20.
    profile_start = iteration + 10 if profile_dir else None
    cls_losses, box_losses = [], []
    # Losses stay on-device and are fetched every ``sync_every`` steps:
    # a per-step host sync stalls the dispatch pipeline (the reference's
    # per-iteration .item()/isfinite, train.py:126-138, is free on a
    # local GPU but costs a full host roundtrip here). The divergence
    # guard therefore fires within sync_every steps instead of one.
    pending = []

    def drain_pending():
        nonlocal pending
        for it_idx, shape, cl_dev, bl_dev in pending:
            cl, bl = float(cl_dev), float(bl_dev)
            if os.environ.get('ODTK_DEBUG'):
                print(f'  debug it{it_idx}: cl={cl:.4f} bl={bl:.4f} '
                      f'shape={shape}', flush=True)
            if is_master:
                cls_losses.append(cl)
                box_losses.append(bl)
                if not math.isfinite(cl + bl):
                    raise RuntimeError(
                        'Loss is diverging! (iteration {}: focal loss '
                        '{}, box loss {})\n{}'.format(
                            it_idx, cl, bl,
                            'Try lowering the learning rate.'))
        pending = []

    while iteration < iterations:
        for arrays in _device_feed(data_iterator, mesh):
            if iteration >= iterations:
                break
            if profile_start is not None and iteration == profile_start:
                jax.profiler.start_trace(profile_dir)
            profiler.start('fw')
            if feed == 'yuv420':
                images, cbcr, targets, colors, sizes = arrays
                params, opt_state, cls_loss, box_loss = train_step(
                    params, opt_state, frozen, images, cbcr, colors,
                    sizes, targets)
            elif feed == 'u8':
                images, targets, colors, sizes = arrays
                params, opt_state, cls_loss, box_loss = train_step(
                    params, opt_state, frozen, images, colors, sizes,
                    targets)
            else:
                images, targets = arrays
                params, opt_state, cls_loss, box_loss = train_step(
                    params, opt_state, frozen, images, targets)
            profiler.stop('fw')
            profiler.start('bw')
            pending.append((iteration, images.shape, cls_loss, box_loss))
            if len(pending) >= max(1, sync_every) \
                    or iteration + 1 >= iterations:
                drain_pending()
            profiler.stop('bw')

            iteration += 1
            if profile_start is not None and iteration == profile_start + 10:
                jax.profiler.stop_trace()
                profile_start = None
            profiler.bump('train')
            if is_master and (profiler.totals['train'] > 60
                              or iteration == iterations):
                drain_pending()
                focal_loss = float(np.mean(cls_losses))
                box_loss_m = float(np.mean(box_losses))
                learning_rate = float(lr_schedule(
                    lr, warmup, milestones, gamma)(jnp.float32(iteration)))
                if verbose:
                    msg = '[{:{len}}/{}]'.format(
                        iteration, iterations, len=len(str(iterations)))
                    msg += ' focal loss: {:.3f}'.format(focal_loss)
                    msg += ', box loss: {:.3f}'.format(box_loss_m)
                    msg += ', {:.3f}s/{}-batch'.format(
                        profiler.means['train'], batch_size)
                    msg += ' (step: {:.3f}s, sync: {:.3f}s)'.format(
                        profiler.means['fw'], profiler.means['bw'])
                    msg += ', {:.1f} im/s'.format(
                        batch_size / profiler.means['train'])
                    msg += ', lr: {:.2g}'.format(learning_rate)
                    print(msg, flush=True)
                if writer is not None:
                    writer.add_scalar('focal_loss', focal_loss, iteration)
                    writer.add_scalar('box_loss', box_loss_m, iteration)
                    writer.add_scalar('learning_rate', learning_rate,
                                      iteration)
                if metrics_url:
                    post_metrics(metrics_url, {
                        'focal loss': focal_loss,
                        'box loss': box_loss_m,
                        'im_s': batch_size / profiler.means['train'],
                        'lr': learning_rate})
                save_checkpoint(iteration)
                profiler.reset()
                del cls_losses[:], box_losses[:]

            if val_annotations and (iteration == iterations
                                    or (val_iterations
                                        and iteration % val_iterations == 0)):
                model.variables = {'params': params, 'frozen': frozen}
                stats = infer(model, val_path, None, resize, max_size,
                              batch_size, annotations=val_annotations,
                              mixed_precision=mixed_precision,
                              is_master=is_master, world=world,
                              is_validation=True, verbose=False,
                              rotated_bbox=rotated_bbox)
                if writer is not None and stats is not None:
                    names = [
                        'Validation_Precision/mAP',
                        'Validation_Precision/mAP@0.50IoU',
                        'Validation_Precision/mAP@0.75IoU',
                        'Validation_Precision/mAP (small)',
                        'Validation_Precision/mAP (medium)',
                        'Validation_Precision/mAP (large)',
                        'Validation_Recall/mAR (max 1 Dets)',
                        'Validation_Recall/mAR (max 10 Dets)',
                        'Validation_Recall/mAR (max 100 Dets)',
                        'Validation_Recall/mAR (small)',
                        'Validation_Recall/mAR (medium)',
                        'Validation_Recall/mAR (large)']
                    for n, s in zip(names, stats):
                        writer.add_scalar(n, s, iteration)

    model.variables = {'params': jax.device_get(params), 'frozen': frozen}
    if writer is not None:
        writer.close()
    return model
