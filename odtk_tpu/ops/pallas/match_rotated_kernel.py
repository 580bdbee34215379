"""Batched Pallas rotated best-match kernel: fused clip + merge + skip.

One launch replaces the XLA chunk-streaming matcher's whole while_loop
(ops.iou_rotated.rotated_best_match_batched): an anchor block's 8
corner planes stay VMEM-resident while a dynamic fori_loop walks that
image's packed active targets (SMEM scalar reads), running the
plane-parallel Sutherland-Hodgman clip — the same ``_soa_clip_iou`` the
jnp path uses, so IoU parity is by construction — and folding the
running (best_iou, best_slot) maximum in the VMEM output block. The
streamed form paid ~0.57 ms of dispatch + [chunk, N] HBM round-trips
per 8-target chunk; here HBM sees one write of the two output planes.

Two skip levels compose (both exact, csrc/cuda/nms_iou.cu:324-375 is
the CUDA counterpart being matched):
  * stream packing: padding slots and out-of-size-band targets never
    enter the loop (``n_act`` bounds it) — the caller packs per image;
  * tile AABB rejection: consecutive flat anchor indices are spatially
    local, so a [rows, 128] anchor tile spans a thin horizontal strip;
    a target whose AABB misses the tile's AABB skips the ~1.4k-op clip
    behind a real scalar branch (``pl.when``). Dense-small targets hit
    ~15% of stride-8 tiles, so this is where the small24 win lives
    (whole-row XLA windowing could never shrink the dispatched shape).

A fully-skipped anchor keeps the -2.0 IoU sentinel and slot 0 — the
streamed form's convention for anchors no active target ever touched
(both land strictly below the background threshold). Tie-break parity:
targets arrive packed in ascending-slot order per image and the merge
uses strict ``>``, so the first maximal target wins, exactly like the
one-at-a-time stream.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..iou_rotated import _soa_clip_iou

LANES = 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def _match_kernel(nact_ref, tgt_ref, anch_ref, iou_ref, slot_ref):
    # anch_ref: [8, R, 128] corner planes (x0,y0,...,x3,y3)
    ax_raw = [anch_ref[2 * k] for k in range(4)]
    ay_raw = [anch_ref[2 * k + 1] for k in range(4)]
    zeros = jnp.zeros_like(ax_raw[0])

    # tile AABB (scalars): anchors in this block
    tx1 = jnp.min(jnp.minimum(jnp.minimum(ax_raw[0], ax_raw[1]),
                              jnp.minimum(ax_raw[2], ax_raw[3])))
    tx2 = jnp.max(jnp.maximum(jnp.maximum(ax_raw[0], ax_raw[1]),
                              jnp.maximum(ax_raw[2], ax_raw[3])))
    ty1 = jnp.min(jnp.minimum(jnp.minimum(ay_raw[0], ay_raw[1]),
                              jnp.minimum(ay_raw[2], ay_raw[3])))
    ty2 = jnp.max(jnp.maximum(jnp.maximum(ay_raw[0], ay_raw[1]),
                              jnp.maximum(ay_raw[2], ay_raw[3])))

    iou_ref[0] = jnp.full_like(zeros, -2.0)
    slot_ref[0] = jnp.zeros(zeros.shape, jnp.int32)

    def body(m, carry):
        # packed target row: quad corners + original slot id (SMEM)
        cx = [tgt_ref[0, m, 2 * k] for k in range(4)]
        cy = [tgt_ref[0, m, 2 * k + 1] for k in range(4)]
        slot = tgt_ref[0, m, 8].astype(jnp.int32)

        bx1 = jnp.minimum(jnp.minimum(cx[0], cx[1]),
                          jnp.minimum(cx[2], cx[3]))
        bx2 = jnp.maximum(jnp.maximum(cx[0], cx[1]),
                          jnp.maximum(cx[2], cx[3]))
        by1 = jnp.minimum(jnp.minimum(cy[0], cy[1]),
                          jnp.minimum(cy[2], cy[3]))
        by2 = jnp.maximum(jnp.maximum(cy[0], cy[1]),
                          jnp.maximum(cy[2], cy[3]))
        hit = (bx1 <= tx2) & (bx2 >= tx1) & (by1 <= ty2) & (by2 >= ty1)

        @pl.when(hit)          # scalar branch: a miss pays 4 compares
        def _():
            # +0.001 coincidence pad vs THIS target (nms_iou.cu:209-219)
            sx = [jnp.where(ax_raw[k] == cx[k], ax_raw[k] + 0.001,
                            ax_raw[k]) for k in range(4)]
            sy = [jnp.where(ay_raw[k] == cy[k], ay_raw[k] + 0.001,
                            ay_raw[k]) for k in range(4)]
            iou = _soa_clip_iou(sx + [zeros] * 4, sy + [zeros] * 4,
                                ax_raw, ay_raw, cx, cy)   # [R, 128]
            upd = iou > iou_ref[0]
            slot_ref[0] = jnp.where(upd, slot, slot_ref[0])
            iou_ref[0] = jnp.where(upd, iou, iou_ref[0])

        return carry

    # nact arrives as the FULL [B, 1] SMEM array (a (1,1) block would
    # violate Mosaic's last-two-dims rule — caught on-chip only, the
    # interpret-mode tests never see it); index the grid's batch row
    jax.lax.fori_loop(0, nact_ref[pl.program_id(0), 0], body, 0)


def rotated_match_pallas(subject_quads, packed_rows, n_act,
                         block_rows=16, interpret=False):
    """(best_iou [B, N], best_slot [B, N]) of anchors vs packed targets.

    subject_quads [N, 8] f32 — shared anchor quads (translated grid).
    packed_rows   [B, M, 9] f32 — per-image (quad[8], original_slot)
        rows, actives first in ascending original-slot order.
    n_act         [B] int32 — how many leading rows are active per image.
    """
    subj = subject_quads.reshape(-1, 8).astype(jnp.float32)
    n = subj.shape[0]
    bsz, max_det = packed_rows.shape[0], packed_rows.shape[1]

    tile = block_rows * LANES
    n_pad = _round_up(n, tile)
    rows = n_pad // LANES
    # [8, rows, LANES] corner planes; padding anchors are zero quads
    # (never beat the -2 sentinel: zero-area clip yields IoU 0 at most,
    # and they are sliced away below anyway)
    planes = jnp.pad(subj, ((0, n_pad - n), (0, 0))).T.reshape(
        8, rows, LANES)

    grid = (bsz, rows // block_rows)
    out_iou, out_slot = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max_det, 9), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, block_rows, LANES), lambda b, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_rows, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(n_act.reshape(bsz, 1).astype(jnp.int32),
      packed_rows.astype(jnp.float32), planes)
    return (out_iou.reshape(bsz, -1)[:, :n],
            out_slot.reshape(bsz, -1)[:, :n])
