#!/usr/bin/env python3
"""odtk-tpu CLI: train / infer / export.

Flag-compatible with the reference ``odtk`` CLI (odtk/main.py:15-118)
wherever the concept carries over. Differences are TPU-architectural:
no per-GPU process spawning (one JAX process per host drives all local
chips via pjit; ``--master`` becomes the jax.distributed coordinator),
``--full-precision`` toggles bf16 off, and export targets are AOT
engine packages / StableHLO instead of TensorRT plans / ONNX.
"""

import argparse
import os
import random
import sys


def parse(args):
    parser = argparse.ArgumentParser(
        description='ODTK-TPU: TPU-native Object Detection Toolkit.')
    parser.add_argument('--master', metavar='address:port', type=str,
                        help='coordinator endpoint for multi-host runs',
                        default='127.0.0.1:29500')
    parser.add_argument('--num-hosts', metavar='n', type=int, default=1,
                        help='number of host processes (multi-host DP)')
    parser.add_argument('--host-id', metavar='i', type=int, default=0,
                        help='this process index when multi-host')

    subparsers = parser.add_subparsers(help='sub-command', dest='command')
    subparsers.required = True

    import jax
    devcount = max(1, len(jax.devices()))

    parser_train = subparsers.add_parser('train', help='train a network')
    parser_train.add_argument('model', type=str,
                              help='checkpoint to write (resumes if it already exists)')
    parser_train.add_argument('--annotations', metavar='path', type=str,
                              help='COCO-JSON annotation file for the training images', required=True)
    parser_train.add_argument('--images', metavar='path', type=str,
                              help='directory containing the training images', default='.')
    parser_train.add_argument('--backbone', action='store', type=str, nargs='+',
                              help='one or more backbone names from the registry',
                              default=['ResNet50FPN'])
    parser_train.add_argument('--classes', metavar='num', type=int,
                              help='object classes in the dataset', default=80)
    parser_train.add_argument('--batch', metavar='size', type=int,
                              help='global batch size across all chips', default=2 * devcount)
    parser_train.add_argument('--resize', metavar='scale', type=int,
                              help='target shorter-side length in pixels', default=800)
    parser_train.add_argument('--max-size', metavar='max', type=int,
                              help='cap on the longer side after resizing', default=1333)
    parser_train.add_argument('--jitter', metavar='min max', type=int, nargs=2,
                              help='randomize the shorter side within this range', default=[640, 1024])
    parser_train.add_argument('--iters', metavar='number', type=int,
                              help='total optimizer steps', default=90000)
    parser_train.add_argument('--milestones', action='store', type=int, nargs='*',
                              help='steps at which the learning rate is multiplied by gamma',
                              default=[60000, 80000])
    parser_train.add_argument('--schedule', metavar='scale', type=float,
                              help='stretch/shrink factor applied to iters and milestones',
                              default=1)
    parser_train.add_argument('--full-precision', help='disable bf16 mixed precision',
                              action='store_true')
    parser_train.add_argument('--lr', metavar='value', help='base SGD learning rate',
                              type=float, default=0.01)
    parser_train.add_argument('--warmup', metavar='iterations',
                              help='steps of linear learning-rate ramp-up', type=int, default=1000)
    parser_train.add_argument('--gamma', metavar='value', type=float,
                              help='learning-rate multiplier at each milestone',
                              default=0.1)
    parser_train.add_argument('--override', help='start fresh even if the checkpoint file exists', action='store_true')
    parser_train.add_argument('--val-annotations', metavar='path', type=str,
                              help='COCO-JSON annotations for periodic validation')
    parser_train.add_argument('--val-images', metavar='path', type=str,
                              help='directory with validation images')
    parser_train.add_argument('--post-metrics', metavar='url', type=str,
                              help='HTTP endpoint to push training metrics to')
    parser_train.add_argument('--fine-tune', metavar='path', type=str,
                              help='checkpoint to warm-start from (final head layers re-initialized)')
    parser_train.add_argument('--backbone-weights', metavar='path', type=str,
                              nargs='+', default=[],
                              help='torchvision-format .pth file(s) to '
                                   'initialize the backbone(s) from '
                                   '(ImageNet init without a download path)')
    parser_train.add_argument('--feed', choices=['yuv420', 'u8', 'f32'],
                              default=None,
                              help='host->device training feed: yuv420 '
                                   '(default; 1.5 B/px, the JPEG\'s own '
                                   'chroma subsampling, color math '
                                   'in-graph), u8 (3 B/px, bit-close to '
                                   'f32), or f32 (host-side normalize). '
                                   'ODTK_FEED env is the fallback.')
    parser_train.add_argument('--no-pretrained', action='store_true',
                              help='skip the default ImageNet backbone '
                                   'init (fetch-with-cache; the reference '
                                   'loads model-zoo weights on every '
                                   'fresh model)')
    parser_train.add_argument('--logdir', metavar='logdir', type=str,
                              help='TensorBoard output directory')
    parser_train.add_argument('--val-iters', metavar='number', type=int,
                              help='run validation every this many steps',
                              default=8000)
    parser_train.add_argument('--with-dali', help='(compat no-op: the fused '
                              'host loader is always on)', action='store_true')
    parser_train.add_argument('--with-apex', help='(compat no-op: bf16 mixed '
                              'precision is the default; there is no AMP '
                              'scaler to enable)', action='store_true')
    parser_train.add_argument('--augment-rotate',
                              help='randomly rotate images by multiples of 90 degrees',
                              action='store_true')
    parser_train.add_argument('--augment-free-rotate', metavar='value value',
                              type=float, nargs=2, default=[0, 0],
                              help='(compat no-op: the reference defines this '
                                   'flag but never feeds it to training)')
    parser_train.add_argument('--augment-crop',
                              help='random IoU-constrained crops before '
                                   'resizing (axis-aligned boxes only)',
                              action='store_true')
    parser_train.add_argument('--augment-brightness', metavar='value', type=float,
                              help='stddev of the random brightness shift',
                              default=0.002)
    parser_train.add_argument('--augment-contrast', metavar='value', type=float,
                              help='stddev of the random contrast factor',
                              default=0.002)
    parser_train.add_argument('--augment-hue', metavar='value', type=float,
                              help='stddev of the random hue rotation', default=0.0002)
    parser_train.add_argument('--augment-saturation', metavar='value', type=float,
                              help='stddev of the random saturation factor',
                              default=0.002)
    parser_train.add_argument('--regularization-l2', metavar='value', type=float,
                              help='weight decay coefficient', default=0.0001)
    parser_train.add_argument('--clip-grads', metavar='norm', type=float,
                              default=0.0,
                              help='clip gradients to this global norm '
                                   '(0 disables; recommended ~25 for '
                                   'rotated fine-tunes, whose gradient '
                                   'spikes the reference AMP scaler '
                                   'absorbed by skipping fp16-overflow '
                                   'steps)')
    parser_train.add_argument('--rotated-bbox', action='store_true',
                              help='train with rotated boxes (x, y, w, h, theta)')
    parser_train.add_argument('--anchor-ious', metavar='value value', type=float,
                              nargs=2, help='background / foreground IoU cutoffs for anchor assignment',
                              default=[0.4, 0.5])
    # anchor geometry as flags — the reference requires editing
    # odtk/model.py for this (TRAINING.md:98-108); persisted in the
    # checkpoint so infer/export restore them automatically
    parser_train.add_argument('--anchor-ratios', metavar='value', type=float,
                              nargs='+', default=[1.0, 2.0, 0.5],
                              help='anchor aspect ratios per cell')
    parser_train.add_argument('--anchor-scales', metavar='value', type=float,
                              nargs='+',
                              default=[4 * 2 ** (i / 3) for i in range(3)],
                              help='anchor scales per cell (in strides)')
    parser_train.add_argument('--anchor-angles', metavar='value', type=float,
                              nargs='+', default=None,
                              help='anchor angles in radians '
                                   '(rotated-bbox models only)')
    parser_train.add_argument('--absolute-angle', action='store_true',
                              help='use the full angle range instead of folding into [-45, 45] degrees')
    parser_train.add_argument('--max-det', metavar='num', type=int, default=128,
                              help='static per-image target capacity (TPU shapes)')
    parser_train.add_argument('--profile-dir', metavar='path', type=str,
                              help='capture a jax.profiler device trace of '
                                   'steady-state iterations to this directory')
    _add_fused_stem_flag(parser_train)

    parser_infer = subparsers.add_parser('infer', help='run inference')
    parser_infer.add_argument('model', type=str, help='checkpoint or engine file to run')
    parser_infer.add_argument('--images', metavar='path', type=str,
                              help='directory of images to process', default='.')
    parser_infer.add_argument('--annotations', metavar='annotations', type=str,
                              help='COCO-JSON ground truth; enables mAP scoring')
    parser_infer.add_argument('--output', metavar='file', type=str, nargs='+',
                              help='where to write the detection JSON output',
                              default=['detections.json'])
    parser_infer.add_argument('--batch', metavar='size', type=int,
                              help='images per forward pass', default=2 * devcount)
    parser_infer.add_argument('--resize', metavar='scale', type=int,
                              help='target shorter-side length in pixels', default=800)
    parser_infer.add_argument('--max-size', metavar='max', type=int,
                              help='cap on the longer side after resizing', default=1333)
    parser_infer.add_argument('--with-dali', help='(compat no-op)',
                              action='store_true')
    parser_infer.add_argument('--with-apex', help='(compat no-op)',
                              action='store_true')
    parser_infer.add_argument('--full-precision',
                              help='disable bf16 mixed precision',
                              action='store_true')
    parser_infer.add_argument('--rotated-bbox', action='store_true',
                              help='model predicts rotated boxes')
    parser_infer.add_argument('--threshold', metavar='value', type=float,
                              default=None,
                              help='score threshold (checkpoint inference '
                                   'only; engines bake theirs at export)')
    parser_infer.add_argument('--detections', metavar='num', type=int,
                              default=None,
                              help='max detections per image (checkpoint '
                                   'inference only)')
    parser_infer.add_argument('--fixed-size', metavar='height width',
                              type=int, nargs='+', default=None,
                              help='letterbox inputs to a fixed canvas like '
                                   'an engine would (checkpoint inference '
                                   'only: one value for square, or height '
                                   'width) — for ckpt-vs-engine AP at '
                                   'matched scale')
    _add_fused_stem_flag(parser_infer)

    parser_export = subparsers.add_parser(
        'export', help='export a model into an AOT TPU engine')
    parser_export.add_argument('model', type=str, help='checkpoint to export')
    parser_export.add_argument('export', type=str,
                               help='path to exported output '
                                    '(.engine package or .stablehlo)')
    parser_export.add_argument('--size', metavar='height width', type=int,
                               nargs='+', default=[1280],
                               help='fixed engine input: one value for square, or height width')
    parser_export.add_argument('--full-precision',
                               help='keep fp32 compute instead of bf16',
                               action='store_true')
    parser_export.add_argument('--input-format', choices=['f32', 'u8'],
                               default='f32', dest='input_format',
                               help='.cppengine input contract: u8 takes '
                                    'raw letterboxed RGB bytes and '
                                    'normalizes in-graph (4x fewer '
                                    'host->device bytes per frame)')
    parser_export.add_argument('--int8', action='store_true',
                               help='run INT8 calibration and emit an int8 engine')
    parser_export.add_argument('--calibration-batches', metavar='size', type=int,
                               help='how many calibration batches to sample',
                               default=2)
    parser_export.add_argument('--calibration-images', metavar='path', type=str,
                               help='directory of images for INT8 calibration', default='')
    parser_export.add_argument('--calibration-table', metavar='path', type=str,
                               help='calibration table to reuse (or filename to create)',
                               default='')
    parser_export.add_argument('--calibration-percentile', metavar='value',
                               type=float, default=None,
                               help='clip activation ranges at this '
                                    'percentile of |input| (e.g. 99.9) '
                                    'instead of absmax — outlier-robust '
                                    'INT8 scales')
    parser_export.add_argument('--calibration-entropy', action='store_true',
                               help='pick each layer\'s INT8 clipping '
                                    'threshold by KL-divergence over '
                                    'activation histograms (the TensorRT '
                                    'IInt8EntropyCalibrator2 rule) instead '
                                    'of absmax')
    parser_export.add_argument('--verbose', help='print export progress',
                               action='store_true')
    parser_export.add_argument('--rotated-bbox', action='store_true',
                               help='model predicts rotated boxes')
    parser_export.add_argument('--dynamic-batch-opts', metavar='value value value',
                               type=int, nargs=3, default=[1, 8, 16],
                               help='compile these batch-size profiles (min, opt, max)')
    # post-processing knobs baked into the engine — the reference's TRT
    # plugins carry these as serialized params but only source edits
    # change them (odtk/model.py:49-52)
    parser_export.add_argument('--threshold', metavar='value', type=float,
                               default=None,
                               help='score threshold baked into decode')
    parser_export.add_argument('--top-n', metavar='num', type=int,
                               default=None,
                               help='per-image candidate budget before NMS')
    parser_export.add_argument('--nms', metavar='value', type=float,
                               default=None, help='NMS IoU threshold')
    parser_export.add_argument('--detections', metavar='num', type=int,
                               default=None,
                               help='max detections emitted per image')
    _add_fused_stem_flag(parser_export)

    return parser.parse_args(args)


def _add_fused_stem_flag(subparser):
    """--fused-stem / --no-fused-stem: run the 7x7/s2 ResNet stem as the
    merged space-to-depth phase conv + fused BN/ReLU/pool kernel.
    A runtime perf knob — checkpoints are identical either way. Default
    (flag absent) keeps the model's own default (on, or ODTK_FUSED_STEM)."""
    subparser.add_argument('--fused-stem', action=argparse.BooleanOptionalAction,
                           default=None, dest='fused_stem',
                           help='toggle the fused space-to-depth ResNet stem '
                                '(default: on)')
    subparser.add_argument('--wpack-layer1',
                           action=argparse.BooleanOptionalAction,
                           default=None, dest='wpack_layer1',
                           help='pin width-pair-packed layer1 on/off for '
                                'every graph (default: auto — packed for '
                                'training, unpacked for inference/export)')


CHECKPOINT_EXTS = ('.pth', '.torch', '.ckpt')
ENGINE_EXTS = ('.engine', '.plan')


def load_model(args, verbose=False):
    """Resolve args.model into a (Model | None, resume-state) pair.

    Three outcomes:
      * fresh Model — `train` with no existing checkpoint (or --override);
      * checkpoint restore — any command pointed at a checkpoint file;
      * None — `infer` on an engine package (the caller constructs the
        Engine itself so export/infer share one loading path).
    """
    from .model import Model

    ext = os.path.splitext(args.model)[1]
    starting_fresh = args.command == 'train' and (
        args.override or not os.path.exists(args.model))

    if starting_fresh:
        if verbose:
            print('Initializing model...')
        model = Model(backbones=args.backbone, classes=args.classes,
                      rotated_bbox=args.rotated_bbox,
                      anchor_ious=args.anchor_ious,
                      ratios=args.anchor_ratios, scales=args.anchor_scales,
                      angles=args.anchor_angles)
        model.initialize(rng=random.randint(0, 2 ** 31 - 1),
                         fine_tune=args.fine_tune)
        if args.backbone_weights:
            from .io.torch_import import load_backbone_weights
            for bb, w in zip(args.backbone, args.backbone_weights):
                print('Loading {} weights from {}...'.format(bb, w))
                load_backbone_weights(model, bb, w)
        elif args.fine_tune is None and not args.no_pretrained:
            # the reference's silent default: every fresh backbone gets
            # ImageNet weights (odtk/backbones/resnet.py:21-22). Warns
            # loudly and trains from scratch when unobtainable.
            from .io.model_zoo import init_pretrained
            init_pretrained(model, verbose=verbose)
        state = {}
    else:
        if not os.path.isfile(args.model):
            raise RuntimeError(
                'Model file {} does not exist!'.format(args.model))
        if ext in CHECKPOINT_EXTS:
            if verbose:
                print('Loading model from {}...'.format(
                    os.path.basename(args.model)))
            model, state = Model.load(
                filename=args.model,
                rotated_bbox=getattr(args, 'rotated_bbox', False))
        elif args.command == 'infer' and ext in ENGINE_EXTS:
            model, state = None, {}
        else:
            raise RuntimeError('Invalid model format "{}"!'.format(ext))

    if verbose and model is not None:
        print(model)
    state['path'] = args.model
    return model, state


def _find_calibration_images(directory, want, minimum):
    """Sample `want` JPEG/PNG files from a directory for INT8
    calibration; error below `minimum` (can't fill one opt batch)."""
    found = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.lower().endswith(('.jpg', '.jpeg', '.png')))
    if len(found) < minimum:
        raise RuntimeError(
            'Not enough images found for calibration. ({} < {})'.format(
                len(found), minimum))
    random.shuffle(found)
    return found[:want]


def run(args, model, state):
    'Single-process worker: drives all local devices via pjit'
    from . import infer as infer_mod
    from . import train as train_mod

    if model and getattr(model, 'angles', None) is not None:
        args.rotated_bbox = True

    if model is not None and getattr(args, 'fused_stem', None) is not None:
        model.set_fused_stem(args.fused_stem)
    if model is not None and getattr(args, 'wpack_layer1', None) is not None:
        model.set_wpack_layer1(args.wpack_layer1, pin=True)

    # compat no-op flags: accepted for reference command-line parity but
    # semantically inert here — say so once instead of silently eating them
    if getattr(args, 'with_apex', False):
        print('--with-apex ignored: bf16 mixed precision is the default '
              '(use --full-precision for fp32); non-finite steps are '
              'skipped in-graph, see also --clip-grads')
    if any(getattr(args, 'augment_free_rotate', [0, 0])):
        print('--augment-free-rotate ignored: the reference defines this '
              'flag but never feeds it to training')

    if args.command == 'train':
        train_mod.train(
            model, state, args.images, args.annotations,
            args.val_images or args.images, args.val_annotations,
            args.resize, args.max_size, args.jitter, args.batch,
            int(args.iters * args.schedule), args.val_iters, args.lr,
            args.warmup, [int(m * args.schedule) for m in args.milestones],
            args.gamma, mixed_precision=not args.full_precision,
            metrics_url=args.post_metrics, logdir=args.logdir, verbose=True,
            rotate_augment=args.augment_rotate,
            crop_augment=args.augment_crop,
            augment_brightness=args.augment_brightness,
            augment_contrast=args.augment_contrast,
            augment_hue=args.augment_hue,
            augment_saturation=args.augment_saturation,
            regularization_l2=args.regularization_l2,
            rotated_bbox=args.rotated_bbox,
            absolute_angle=args.absolute_angle, max_det=args.max_det,
            profile_dir=args.profile_dir, clip_grads=args.clip_grads,
            feed=args.feed)

    elif args.command == 'infer':
        if model is None:
            from .export import Engine
            print('Loading engine from {}...'.format(
                os.path.basename(args.model)))
            model = Engine.load(args.model)
        elif args.threshold is not None or args.detections is not None:
            if args.threshold is not None:
                model.threshold = args.threshold
            if args.detections is not None:
                model.detections = args.detections
        fixed_size = args.fixed_size
        if fixed_size is not None:
            fixed_size = tuple(fixed_size * 2 if len(fixed_size) == 1
                               else fixed_size[:2])
        infer_mod.infer(
            model, args.images, args.output, args.resize, args.max_size,
            args.batch, annotations=args.annotations,
            mixed_precision=not args.full_precision, verbose=True,
            rotated_bbox=args.rotated_bbox, fixed_size=fixed_size)

    elif args.command == 'export':
        input_size = args.size * 2 if len(args.size) == 1 else args.size

        # bake post-processing overrides into the exported graph
        for flag, attr in (('threshold', 'threshold'), ('top_n', 'top_n'),
                           ('nms', 'nms'), ('detections', 'detections')):
            value = getattr(args, flag)
            if value is not None:
                setattr(model, attr, value)
        if args.top_n is not None:
            model.fused_top_n = 2 * model.top_n  # keeps the derived default

        calibration_files = []
        if args.int8 and os.path.isdir(args.calibration_images):
            calibration_files = _find_calibration_images(
                args.calibration_images,
                want=args.calibration_batches * args.dynamic_batch_opts[1],
                minimum=args.dynamic_batch_opts[1])

        precision = 'FP32' if args.full_precision else 'FP16'
        if args.int8:
            precision = 'INT8'

        if args.export.endswith('.cppengine'):
            # self-contained C++ deployment engine (extras/cppapi)
            from .export import export_cpp_engine
            export_cpp_engine(model, tuple(input_size),
                              batch=args.dynamic_batch_opts[1],
                              path=args.export, precision=precision,
                              input_format=args.input_format,
                              verbose=args.verbose)
        else:
            model.export(input_size, args.dynamic_batch_opts, precision,
                         calibration_files, args.calibration_table,
                         args.verbose, path=args.export,
                         calibration_percentile=args.calibration_percentile,
                         calibration_entropy=args.calibration_entropy)


def main(args=None):
    'Entry point for the odtk-tpu command'
    # ODTK_PLATFORM=cpu|tpu forces the JAX backend. Needed because some
    # managed environments pre-register an accelerator at interpreter
    # start (sitecustomize), where setting JAX_PLATFORMS in the shell is
    # already too late — jax.config still works before first device use.
    platform = os.environ.get('ODTK_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)

    # persistent compile cache: on remote-compile TPU backends a cold
    # train-step compile costs minutes; cache it across CLI invocations
    # (ODTK_CACHE_DIR overrides, e.g. to share a repo-local cache)
    cache_dir = os.environ.get(
        'ODTK_CACHE_DIR', os.path.expanduser('~/.cache/odtk_tpu/jax'))
    if cache_dir and cache_dir != '0':
        import jax
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
        except Exception:     # noqa: BLE001 — cache is best-effort
            pass

    args = parse(args or sys.argv[1:])

    from .parallel import init_distributed
    init_distributed(args.master, args.num_hosts, args.host_id)

    model, state = load_model(args, verbose=True)
    run(args, model, state)


if __name__ == '__main__':
    main()
