"""odtk_tpu — TPU-native object-detection toolkit (RetinaNet family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NVIDIA/retinanet-examples (ODTK): single-shot detection with
axis-aligned and rotated boxes, COCO datasets, data-parallel training
over TPU meshes, bf16 mixed precision, and AOT-compiled deployment.

Layering (TPU-first — see SURVEY.md §7):
  cli (odtk-tpu train/infer/export)
   └ workflows (train loop / eval loop / aot export)
      └ model: flax RetinaNet (backbone registry, FPN, heads)
      └ ops:   anchors, codecs, target assignment, focal/smooth-L1 (jnp)
               decode + NMS + rotated polygon IoU (jnp reference + Pallas)
      └ data:  COCO pipeline (host decode/augment → bucketed device batches)
      └ parallel: mesh/pjit DP, psum/all_gather over ICI/DCN
   └ io: checkpoint codec (.pth-compatible schema), COCO evaluation
"""

__version__ = '0.1.0'
