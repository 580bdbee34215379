"""Data pipeline: COCO datasets, host-side transforms, prefetching loaders,
and a pycocotools-free COCO evaluator."""

from .coco import CocoDataset, RotatedCocoDataset, CocoIndex
from .loader import DataIterator, RotatedDataIterator
from .coco_eval import CocoEvaluator

__all__ = ['CocoDataset', 'RotatedCocoDataset', 'CocoIndex',
           'DataIterator', 'RotatedDataIterator', 'CocoEvaluator']
