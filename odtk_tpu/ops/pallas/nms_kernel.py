"""Pallas greedy NMS kernel (axis-aligned boxes).

TPU-native equivalent of the CUDA single-block suppression kernel
(csrc/cuda/nms.cu:44-80). The whole working set (top_n*levels = 5120
candidates) fits in VMEM as [R, 128] planes, so the D selection rounds
run entirely on-chip: each round is a handful of VPU reductions
(masked argmax + mask-extract of the winner) and one vectorized IoU +
suppression update — no HBM traffic after the initial load, no per-
iteration XLA loop overhead.

Layout notes:
  * candidates live as six [R, 128] planes (score, x1, y1, x2, y2, cls);
  * the winner is extracted by an equality mask against its linear
    index (built with 2-D broadcasted_iota — 1-D iota is not legal on
    TPU), avoiding dynamic lane indexing entirely;
  * outputs accumulate in [1, 128]/[4, 128]-shaped registers updated
    with a lane mask per round, written once at the end.

Greedy semantics match nms.cu exactly: a suppressed candidate (score
zeroed) can never suppress others; ties resolve to the lowest index.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def _nms_kernel(ndetections, nms_thresh, score_ref, x1_ref, y1_ref,
                x2_ref, y2_ref, cls_ref, out_s_ref, out_b_ref, out_c_ref):
    r = score_ref.shape[0]
    idx = (jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1))
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    x1, y1 = x1_ref[:], y1_ref[:]
    x2, y2 = x2_ref[:], y2_ref[:]
    cls = cls_ref[:]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)

    def round_fn(d, state):
        scores, acc_s, acc_x1, acc_y1, acc_x2, acc_y2, acc_c = state
        m_val = jnp.max(scores)
        m_idx = jnp.min(jnp.where(scores == m_val, idx, jnp.int32(2 ** 30)))
        sel = (idx == m_idx).astype(jnp.float32)

        mx1 = jnp.sum(x1 * sel)
        my1 = jnp.sum(y1 * sel)
        mx2 = jnp.sum(x2 * sel)
        my2 = jnp.sum(y2 * sel)
        mc = jnp.sum(cls * sel)
        marea = (mx2 - mx1 + 1.0) * (my2 - my1 + 1.0)

        ix1 = jnp.maximum(x1, mx1)
        iy1 = jnp.maximum(y1, my1)
        ix2 = jnp.minimum(x2, mx2)
        iy2 = jnp.minimum(y2, my2)
        inter = (jnp.maximum(ix2 - ix1 + 1.0, 0.0)
                 * jnp.maximum(iy2 - iy1 + 1.0, 0.0))
        iou = inter / (area + marea - inter)

        picked = m_val > 0.0
        suppress = (iou > nms_thresh) & (cls == mc) | (sel > 0)
        scores = jnp.where(picked & suppress, 0.0, scores)

        lane = (out_lane == d) & picked
        acc_s = jnp.where(lane, m_val, acc_s)
        acc_x1 = jnp.where(lane, mx1, acc_x1)
        acc_y1 = jnp.where(lane, my1, acc_y1)
        acc_x2 = jnp.where(lane, mx2, acc_x2)
        acc_y2 = jnp.where(lane, my2, acc_y2)
        acc_c = jnp.where(lane, mc, acc_c)
        return scores, acc_s, acc_x1, acc_y1, acc_x2, acc_y2, acc_c

    zeros = jnp.zeros((1, LANES), jnp.float32)
    state = (score_ref[:], zeros, zeros, zeros, zeros, zeros, zeros)
    state = jax.lax.fori_loop(0, ndetections, round_fn, state)
    _, acc_s, acc_x1, acc_y1, acc_x2, acc_y2, acc_c = state

    out_s_ref[:] = acc_s
    out_b_ref[0:1, :] = acc_x1
    out_b_ref[1:2, :] = acc_y1
    out_b_ref[2:3, :] = acc_x2
    out_b_ref[3:4, :] = acc_y2
    out_c_ref[:] = acc_c


def nms_pallas(all_scores, all_boxes, all_classes, nms_thresh=0.5,
               ndetections=100):
    """Batched Pallas NMS; same contract as ops.nms (zero-padded,
    score-descending). ndetections must be <= 128."""
    assert ndetections <= LANES, 'pallas NMS emits into one lane vector'
    b, n = all_scores.shape
    n_pad = _round_up(n, LANES)
    r = n_pad // LANES

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - n)))

    scores = pad(all_scores).reshape(b, r, LANES)
    boxes = all_boxes.astype(jnp.float32)
    planes = [pad(boxes[..., i]).reshape(b, r, LANES) for i in range(4)]
    classes = pad(all_classes).reshape(b, r, LANES)

    kernel = functools.partial(_nms_kernel, ndetections, nms_thresh)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((4, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
    )

    def single(s, p0, p1, p2, p3, c):
        out_s, out_b, out_c = call(s, p0, p1, p2, p3, c)
        return (out_s[0, :ndetections],
                out_b[:, :ndetections].T,
                out_c[0, :ndetections])

    return jax.vmap(single)(scores, *planes, classes)
