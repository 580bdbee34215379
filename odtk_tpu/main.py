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
                        help='address and port of the multi-host coordinator',
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
                              help='path to output model or checkpoint to resume from')
    parser_train.add_argument('--annotations', metavar='path', type=str,
                              help='path to COCO style annotations', required=True)
    parser_train.add_argument('--images', metavar='path', type=str,
                              help='path to images', default='.')
    parser_train.add_argument('--backbone', action='store', type=str, nargs='+',
                              help='backbone model (or list of)',
                              default=['ResNet50FPN'])
    parser_train.add_argument('--classes', metavar='num', type=int,
                              help='number of classes', default=80)
    parser_train.add_argument('--batch', metavar='size', type=int,
                              help='batch size', default=2 * devcount)
    parser_train.add_argument('--resize', metavar='scale', type=int,
                              help='resize to given size', default=800)
    parser_train.add_argument('--max-size', metavar='max', type=int,
                              help='maximum resizing size', default=1333)
    parser_train.add_argument('--jitter', metavar='min max', type=int, nargs=2,
                              help='jitter size within range', default=[640, 1024])
    parser_train.add_argument('--iters', metavar='number', type=int,
                              help='number of iterations to train for', default=90000)
    parser_train.add_argument('--milestones', action='store', type=int, nargs='*',
                              help='list of iteration indices where learning rate decays',
                              default=[60000, 80000])
    parser_train.add_argument('--schedule', metavar='scale', type=float,
                              help='scale schedule (affecting iters and milestones)',
                              default=1)
    parser_train.add_argument('--full-precision', help='train in full precision',
                              action='store_true')
    parser_train.add_argument('--lr', metavar='value', help='learning rate',
                              type=float, default=0.01)
    parser_train.add_argument('--warmup', metavar='iterations',
                              help='numer of warmup iterations', type=int, default=1000)
    parser_train.add_argument('--gamma', metavar='value', type=float,
                              help='multiplicative factor of learning rate decay',
                              default=0.1)
    parser_train.add_argument('--override', help='override model', action='store_true')
    parser_train.add_argument('--val-annotations', metavar='path', type=str,
                              help='path to COCO style validation annotations')
    parser_train.add_argument('--val-images', metavar='path', type=str,
                              help='path to validation images')
    parser_train.add_argument('--post-metrics', metavar='url', type=str,
                              help='post metrics to specified url')
    parser_train.add_argument('--fine-tune', metavar='path', type=str,
                              help='fine tune a pretrained model')
    parser_train.add_argument('--backbone-weights', metavar='path', type=str,
                              nargs='+', default=[],
                              help='torchvision-format .pth file(s) to '
                                   'initialize the backbone(s) from '
                                   '(ImageNet init without a download path)')
    parser_train.add_argument('--logdir', metavar='logdir', type=str,
                              help='directory where to write logs')
    parser_train.add_argument('--val-iters', metavar='number', type=int,
                              help='number of iterations between each validation',
                              default=8000)
    parser_train.add_argument('--with-dali', help='(compat no-op: the fused '
                              'host loader is always on)', action='store_true')
    parser_train.add_argument('--augment-rotate',
                              help='use four-fold rotational augmentation',
                              action='store_true')
    parser_train.add_argument('--augment-brightness', metavar='value', type=float,
                              help='adjust the brightness of the image.',
                              default=0.002)
    parser_train.add_argument('--augment-contrast', metavar='value', type=float,
                              help='adjust the contrast of the image.',
                              default=0.002)
    parser_train.add_argument('--augment-hue', metavar='value', type=float,
                              help='adjust the hue of the image.', default=0.0002)
    parser_train.add_argument('--augment-saturation', metavar='value', type=float,
                              help='adjust the saturation of the image.',
                              default=0.002)
    parser_train.add_argument('--regularization-l2', metavar='value', type=float,
                              help='L2 regularization for optim', default=0.0001)
    parser_train.add_argument('--rotated-bbox', action='store_true',
                              help='detect rotated bounding boxes [x, y, w, h, theta]')
    parser_train.add_argument('--anchor-ious', metavar='value value', type=float,
                              nargs=2, help='anchor/bbox overlap threshold',
                              default=[0.4, 0.5])
    parser_train.add_argument('--absolute-angle', action='store_true',
                              help='regress absolute angle (rather than -45 to 45 degrees.')
    parser_train.add_argument('--max-det', metavar='num', type=int, default=128,
                              help='static per-image target capacity (TPU shapes)')
    parser_train.add_argument('--profile-dir', metavar='path', type=str,
                              help='capture a jax.profiler device trace of '
                                   'steady-state iterations to this directory')

    parser_infer = subparsers.add_parser('infer', help='run inference')
    parser_infer.add_argument('model', type=str, help='path to model')
    parser_infer.add_argument('--images', metavar='path', type=str,
                              help='path to images', default='.')
    parser_infer.add_argument('--annotations', metavar='annotations', type=str,
                              help='evaluate using provided annotations')
    parser_infer.add_argument('--output', metavar='file', type=str, nargs='+',
                              help='save detections to specified JSON file(s)',
                              default=['detections.json'])
    parser_infer.add_argument('--batch', metavar='size', type=int,
                              help='batch size', default=2 * devcount)
    parser_infer.add_argument('--resize', metavar='scale', type=int,
                              help='resize to given size', default=800)
    parser_infer.add_argument('--max-size', metavar='max', type=int,
                              help='maximum resizing size', default=1333)
    parser_infer.add_argument('--with-dali', help='(compat no-op)',
                              action='store_true')
    parser_infer.add_argument('--full-precision',
                              help='inference in full precision',
                              action='store_true')
    parser_infer.add_argument('--rotated-bbox', action='store_true',
                              help='inference using a rotated bounding box model')

    parser_export = subparsers.add_parser(
        'export', help='export a model into an AOT TPU engine')
    parser_export.add_argument('model', type=str, help='path to model')
    parser_export.add_argument('export', type=str,
                               help='path to exported output '
                                    '(.engine package or .stablehlo)')
    parser_export.add_argument('--size', metavar='height width', type=int,
                               nargs='+', default=[1280],
                               help='input size (square) or sizes (h w) '
                                    'to use when generating engine')
    parser_export.add_argument('--full-precision',
                               help='export in full instead of half precision',
                               action='store_true')
    parser_export.add_argument('--int8', action='store_true',
                               help='calibrate model and export in int8 precision')
    parser_export.add_argument('--calibration-batches', metavar='size', type=int,
                               help='number of batches to use for int8 calibration',
                               default=2)
    parser_export.add_argument('--calibration-images', metavar='path', type=str,
                               help='path to calibration images', default='')
    parser_export.add_argument('--calibration-table', metavar='path', type=str,
                               help='path of existing calibration table to '
                                    'load from, or name of new calibration table',
                               default='')
    parser_export.add_argument('--verbose', help='enable verbose logging',
                               action='store_true')
    parser_export.add_argument('--rotated-bbox', action='store_true',
                               help='export using a rotated bounding box model')
    parser_export.add_argument('--dynamic-batch-opts', metavar='value value value',
                               type=int, nargs=3, default=[1, 8, 16],
                               help='batch-size profiles to compile (min, opt, max)')

    return parser.parse_args(args)


def load_model(args, verbose=False):
    from .model import Model
    if args.command != 'train' and not os.path.isfile(args.model):
        raise RuntimeError('Model file {} does not exist!'.format(args.model))

    model = None
    state = {}
    _, ext = os.path.splitext(args.model)

    if args.command == 'train' and (not os.path.exists(args.model)
                                    or args.override):
        if verbose:
            print('Initializing model...')
        model = Model(backbones=args.backbone, classes=args.classes,
                      rotated_bbox=args.rotated_bbox,
                      anchor_ious=args.anchor_ious)
        model.initialize(rng=random.randint(0, 2 ** 31 - 1),
                         fine_tune=args.fine_tune)
        for bb, w in zip(args.backbone, getattr(args, 'backbone_weights', [])):
            from .io.torch_import import load_backbone_weights
            print('Loading {} weights from {}...'.format(bb, w))
            load_backbone_weights(model, bb, w)
        if verbose:
            print(model)

    elif ext in ('.pth', '.torch', '.ckpt'):
        if verbose:
            print('Loading model from {}...'.format(
                os.path.basename(args.model)))
        model, state = Model.load(
            filename=args.model,
            rotated_bbox=getattr(args, 'rotated_bbox', False))
        if verbose:
            print(model)

    elif args.command == 'infer' and ext in ('.engine', '.plan'):
        model = None

    else:
        raise RuntimeError('Invalid model format "{}"!'.format(ext))

    state['path'] = args.model
    return model, state


def run(args, model, state):
    'Single-process worker: drives all local devices via pjit'
    from . import infer as infer_mod
    from . import train as train_mod

    if model and getattr(model, 'angles', None) is not None:
        args.rotated_bbox = True

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
            augment_brightness=args.augment_brightness,
            augment_contrast=args.augment_contrast,
            augment_hue=args.augment_hue,
            augment_saturation=args.augment_saturation,
            regularization_l2=args.regularization_l2,
            rotated_bbox=args.rotated_bbox,
            absolute_angle=args.absolute_angle, max_det=args.max_det,
            profile_dir=args.profile_dir)

    elif args.command == 'infer':
        if model is None:
            from .export import Engine
            print('Loading engine from {}...'.format(
                os.path.basename(args.model)))
            model = Engine.load(args.model)
        infer_mod.infer(
            model, args.images, args.output, args.resize, args.max_size,
            args.batch, annotations=args.annotations,
            mixed_precision=not args.full_precision, verbose=True,
            rotated_bbox=args.rotated_bbox)

    elif args.command == 'export':
        input_size = args.size * 2 if len(args.size) == 1 else args.size

        calibration_files = []
        if args.int8:
            if os.path.isdir(args.calibration_images):
                import glob
                exts = ['.jpg', '.JPG', '.jpeg', '.JPEG', '.png', '.PNG']
                for ex in exts:
                    calibration_files += glob.glob(
                        '{}/*{}'.format(args.calibration_images, ex))
                need = args.calibration_batches * args.dynamic_batch_opts[1]
                if len(calibration_files) >= need:
                    calibration_files = calibration_files[:need]
                elif len(calibration_files) < args.dynamic_batch_opts[1]:
                    raise RuntimeError(
                        'Not enough images found for calibration. ({} < {})'
                        .format(len(calibration_files),
                                args.dynamic_batch_opts[1]))
                random.shuffle(calibration_files)

        precision = 'FP32' if args.full_precision else 'FP16'
        if args.int8:
            precision = 'INT8'

        if args.export.endswith('.cppengine'):
            # self-contained C++ deployment engine (extras/cppapi)
            from .export import export_cpp_engine
            export_cpp_engine(model, tuple(input_size),
                              batch=args.dynamic_batch_opts[1],
                              path=args.export, precision=precision,
                              verbose=args.verbose)
        else:
            model.export(input_size, args.dynamic_batch_opts, precision,
                         calibration_files, args.calibration_table,
                         args.verbose, path=args.export)


def main(args=None):
    'Entry point for the odtk-tpu command'
    args = parse(args or sys.argv[1:])

    from .parallel import init_distributed
    init_distributed(args.master, args.num_hosts, args.host_id)

    model, state = load_model(args, verbose=True)
    run(args, model, state)


if __name__ == '__main__':
    main()
