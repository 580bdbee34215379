#!/usr/bin/env python3
"""Host data-pipeline throughput: can the loader keep a chip fed?

The reference publishes its input-pipeline story via DALI (odtk/dali.py
— GPU JPEG decode keeps 8 V100s fed). Our equivalent is the native
libjpeg path (native/host_decode.cpp, DCT prescale + fused normalize)
driven by the threaded prefetch loader (data/loader.py). This bench
quantifies it end to end on the actual host:

  1. raw decode+resize+normalize (single thread, in-memory JPEG)
  2. full DataIterator epochs, eval mode (decode -> bucketed batch)
  3. full DataIterator epochs, train mode (adds jitter/flip/color augs)

and prints the margin over the chip's measured training consumption
rate (PARITY.md: 105.9 im/s/chip at b=8 @832). Pure host code — never
touches jax or the TPU.

Usage: python extras/bench_loader.py [--images 64] [--size 640]
       [--resize 832] [--batch 8] [--workers 2]
"""

import argparse
import io
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

CHIP_RATE = 105.9   # im/s/chip, axis train b=8 @832 (PARITY.md)


def bench_raw_decode(jpeg_bytes, resize, max_size, iters=60):
    from odtk_tpu.data import native
    if not native.available():
        return None
    native.decode_jpeg(jpeg_bytes, resize, max_size)          # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        native.decode_jpeg(jpeg_bytes, resize, max_size)
    return iters / (time.perf_counter() - t0)


def bench_iterator(it, epochs=3):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in it:
            n += batch[0].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=64)
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--resize', type=int, default=832)
    ap.add_argument('--max-size', type=int, default=1024)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--workers', type=int, default=2)
    args = ap.parse_args()

    from synth import make_dataset
    from odtk_tpu.data.loader import DataIterator

    with tempfile.TemporaryDirectory() as root:
        img_dir, anns = make_dataset(root, n_images=args.images,
                                     size=(args.size, args.size),
                                     max_boxes=4, fmt='jpg')

        with open(os.path.join(img_dir, sorted(os.listdir(img_dir))[0]),
                  'rb') as f:
            sample = f.read()
        raw = bench_raw_decode(sample, args.resize, args.max_size)
        if raw:
            print(f'raw native decode+resize+norm @{args.size}->{args.resize}:'
                  f' {raw:7.1f} im/s (1 thread)')
        else:
            print('native lib unavailable — PIL fallback only')

        for training, tag in ((False, 'eval '), (True, 'train')):
            augs = dict(augment_brightness=0.002, augment_contrast=0.002,
                        augment_hue=0.0002,
                        augment_saturation=0.002) if training else {}
            it = DataIterator(img_dir, resize=args.resize,
                              max_size=args.max_size,
                              batch_size=args.batch, stride=128, world=1,
                              annotations=anns, rank=0, training=training,
                              num_threads=args.workers, **augs)
            rate = bench_iterator(it)
            margin = rate / CHIP_RATE
            print(f'{tag} pipeline b={args.batch} x{args.workers} workers: '
                  f'{rate:7.1f} im/s ({margin:4.1f}x chip demand '
                  f'{CHIP_RATE} im/s)')


if __name__ == '__main__':
    main()
