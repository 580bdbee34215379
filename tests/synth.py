"""Synthetic COCO dataset generator for tests and the smoke harness.

Creates images containing solid colored rectangles on dark noise, with
matching COCO-JSON annotations — class = rectangle color. Detection of
these is learnable in a few hundred iterations, giving the e2e harness
a real mAP signal (the role extras/test.sh plays in the reference).
"""

import json
import os

import numpy as np
from PIL import Image

COLORS = [(255, 60, 60), (60, 255, 60), (60, 60, 255)]


def make_dataset(root, n_images=8, size=(160, 200), max_boxes=3, seed=0,
                 rotated=False, fmt='png'):
    """Returns (images_dir, annotations_path)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = size
        arr = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        im = Image.fromarray(arr)
        from PIL import ImageDraw
        draw = ImageDraw.Draw(im)
        n = rng.randint(1, max_boxes + 1)
        for _ in range(n):
            bw, bh = int(rng.randint(24, 60)), int(rng.randint(24, 60))
            x = int(rng.randint(8, max(9, w - bw - 8)))
            y = int(rng.randint(8, max(9, h - bh - 8)))
            cls = int(rng.randint(0, len(COLORS)))
            if rotated:
                theta = float(rng.uniform(-np.pi / 6, np.pi / 6))
                cx, cy = x + (bw - 1) / 2, y + (bh - 1) / 2
                cs, sn = np.cos(theta), np.sin(theta)
                base = np.array([[x, y], [x, y + bh - 1],
                                 [x + bw - 1, y + bh - 1], [x + bw - 1, y]])
                poly = (base - [cx, cy]) @ np.array([[cs, sn], [-sn, cs]]) \
                    + [cx, cy]
                draw.polygon([tuple(p) for p in poly], fill=COLORS[cls])
                bbox = [x, y, bw, bh, theta]
            else:
                draw.rectangle([x, y, x + bw - 1, y + bh - 1],
                               fill=COLORS[cls])
                bbox = [x, y, bw, bh]
            annotations.append({
                'id': ann_id, 'image_id': i, 'category_id': cls + 1,
                'bbox': bbox, 'area': bw * bh, 'iscrowd': 0})
            ann_id += 1
        name = f'img_{i:03d}.{fmt}'
        im.save(os.path.join(img_dir, name),
                **({'quality': 90} if fmt == 'jpg' else {}))
        images.append({'id': i, 'file_name': name, 'width': w, 'height': h})
    dataset = {
        'images': images, 'annotations': annotations,
        'categories': [{'id': c + 1, 'name': f'color{c}'}
                       for c in range(len(COLORS))]}
    ann_path = os.path.join(root, 'annotations.json')
    with open(ann_path, 'w') as f:
        json.dump(dataset, f)
    return img_dir, ann_path
