"""Pallas rotated polygon-IoU best-match kernel.

TPU-native equivalent of the training-time assignment kernel
(csrc/cuda/nms_iou.cu:324-375): for every anchor quad, the best
(IoU, index) over the M target quads. Anchor corner planes stream
through VMEM in [8, TB, 128] tiles; the M boxes sit in SMEM and the
kernel loops over them with the plane-parallel Sutherland-Hodgman
clipper (ops.iou_rotated._soa_clip_iou — the exact same function runs
in the jnp reference path, so parity is by construction).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..iou_rotated import _soa_clip_iou

LANES = 128


def _kernel(m_boxes, anchors_ref, boxes_ref, out_iou_ref, out_idx_ref):
    # anchors_ref: [8, TB, 128] corner planes (x0,y0,x1,y1,x2,y2,x3,y3)
    sx_raw = [anchors_ref[2 * k] for k in range(4)]
    sy_raw = [anchors_ref[2 * k + 1] for k in range(4)]
    zeros = jnp.zeros_like(sx_raw[0])

    # Tile bounding box: consecutive flat anchor indices are spatially
    # local, so a whole tile can reject a far-away target box with four
    # scalar compares instead of the ~1.4k-op clip. A fully-skipped
    # anchor keeps best_iou at the -2 sentinel (vs 0 via clipping) —
    # both land strictly below the background threshold, so assignment
    # semantics are unchanged.
    tx1 = jnp.min(jnp.minimum(jnp.minimum(sx_raw[0], sx_raw[1]),
                              jnp.minimum(sx_raw[2], sx_raw[3])))
    tx2 = jnp.max(jnp.maximum(jnp.maximum(sx_raw[0], sx_raw[1]),
                              jnp.maximum(sx_raw[2], sx_raw[3])))
    ty1 = jnp.min(jnp.minimum(jnp.minimum(sy_raw[0], sy_raw[1]),
                              jnp.minimum(sy_raw[2], sy_raw[3])))
    ty2 = jnp.max(jnp.maximum(jnp.maximum(sy_raw[0], sy_raw[1]),
                              jnp.maximum(sy_raw[2], sy_raw[3])))

    def body(m, carry):
        cx = [boxes_ref[m, 2 * k] for k in range(4)]
        cy = [boxes_ref[m, 2 * k + 1] for k in range(4)]
        valid = boxes_ref[m, 8] > 0.0
        bx1 = jnp.minimum(jnp.minimum(cx[0], cx[1]),
                          jnp.minimum(cx[2], cx[3]))
        bx2 = jnp.maximum(jnp.maximum(cx[0], cx[1]),
                          jnp.maximum(cx[2], cx[3]))
        by1 = jnp.minimum(jnp.minimum(cy[0], cy[1]),
                          jnp.minimum(cy[2], cy[3]))
        by2 = jnp.maximum(jnp.maximum(cy[0], cy[1]),
                          jnp.maximum(cy[2], cy[3]))
        hit = valid & (bx1 <= tx2) & (bx2 >= tx1) \
            & (by1 <= ty2) & (by2 >= ty1)

        @pl.when(hit)                      # real scalar branch: skipped
        def _():                           # tiles pay 4 compares, not the clip
            sx = [jnp.where(sx_raw[k] == cx[k], sx_raw[k] + 0.001,
                            sx_raw[k]) for k in range(4)]
            sy = [jnp.where(sy_raw[k] == cy[k], sy_raw[k] + 0.001,
                            sy_raw[k]) for k in range(4)]
            iou = _soa_clip_iou(sx + [zeros] * 4, sy + [zeros] * 4,
                                sx_raw, sy_raw, cx, cy)
            upd = iou > out_iou_ref[:]
            out_idx_ref[:] = jnp.where(upd, m, out_idx_ref[:])
            out_iou_ref[:] = jnp.where(upd, iou, out_iou_ref[:])

        return carry

    out_iou_ref[:] = jnp.full_like(sx_raw[0], -2.0)
    out_idx_ref[:] = jnp.zeros_like(sx_raw[0], dtype=jnp.int32)
    jax.lax.fori_loop(0, m_boxes, body, 0)


def rotated_best_match_pallas(subject_quads, clip_quads, valid,
                              tile_rows=16, interpret=False):
    """Pallas twin of ops.iou_rotated.rotated_best_match.

    subject_quads [N, 8], clip_quads [M, 8], valid [M] ->
    (best_iou [N], best_idx [N]).
    """
    subj = subject_quads.reshape(-1, 8).astype(jnp.float32)
    n = subj.shape[0]
    clips = clip_quads.reshape(-1, 8).astype(jnp.float32)
    m = clips.shape[0]

    tile = tile_rows * LANES
    n_pad = (n + tile - 1) // tile * tile
    # [8, R, 128] corner planes
    planes = jnp.pad(subj, ((0, n_pad - n), (0, 0))).T.reshape(
        8, n_pad // LANES, LANES)
    boxes = jnp.concatenate(
        [clips, valid.astype(jnp.float32)[:, None]], axis=1)  # [M, 9]

    grid = (n_pad // tile,)
    out_iou, out_idx = pl.pallas_call(
        functools.partial(_kernel, m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_rows, LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(planes, boxes)
    return out_iou.reshape(-1)[:n], out_idx.reshape(-1)[:n]
