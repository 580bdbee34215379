"""Box decoding + filtering per FPN level — static-shape XLA formulation.

TPU-native equivalent of csrc/cuda/decode.cu / decode_rotate.cu: where
the CUDA path does data-dependent compaction (threshold select + radix
sort), XLA wants static shapes, so we take a fixed ``top_n`` with
``lax.top_k`` and zero out entries below threshold — the reference's own
output convention already pads unused slots with zero scores
(decode.cu:161-167), so downstream semantics are identical.

Head layout: NHWC with channel = a * K + k (anchor-major, class-minor),
matching the reference conv-channel semantics (model.py:64-68) so that
imported checkpoints decode identically.
"""

import jax
import jax.numpy as jnp


def decode(cls_head, box_head, stride, threshold=0.05, top_n=1000,
           anchors=None, rotated=False, exact=False, recall_target=0.95,
           from_logits=False):
    """Decode one level's heads into (scores, boxes, classes).

    cls_head: [B, H, W, A*K] sigmoid probabilities — or raw logits with
    ``from_logits=True``, the fast path: top-k is monotonic in logits,
    so selection runs on the bf16 logit map (half the HBM traffic, no
    full-map fp32 sigmoid) and only the selected top_n scores are
    sigmoided, in fp32. Bit-identical outputs.
    box_head: [B, H, W, A*nb] regression deltas (nb = 4, or 6 rotated).
    anchors:  [A, 4] table (axis-aligned; for rotated pass the axis
              member of the pair, cf. odtk/box.py:258-259).
    Returns scores [B, top_n], boxes [B, top_n, nb], classes [B, top_n];
    slots below threshold have score/class/box zeroed.

    The top-n selection uses the TPU-native ``approx_max_k`` (the CUDA
    path's cub radix sort has no cheap XLA analogue — a full top_k sort
    over the ~7M stride-8 score map costs ~6 ms/level on v5e vs ~0.2 ms
    approximate at recall 0.95+; misses are confined to near-tied
    low scores, which NMS would discard anyway). Pass exact=True for
    bit-parity with the reference ordering.
    """
    nb = 6 if rotated else 4
    b, h, w, chans = cls_head.shape
    a = box_head.shape[-1] // nb
    k = chans // a

    n_total = h * w * chans
    top_n = min(top_n, n_total)
    if exact or top_n >= n_total:
        scores_flat = cls_head.reshape(b, -1)                  # (h,w,a,k) order
        if not from_logits:
            scores_flat = scores_flat.astype(jnp.float32)
        scores, idx = jax.lax.top_k(scores_flat, top_n)        # [B, top_n]
    elif n_total >= (1 << 20) and chans % 128:
        # Lane-pad the big (stride-8/16) levels before flattening: the
        # NHWC head is (8,128)-tiled over (W, C), and with C=A*K (e.g.
        # 720) not a lane multiple the flat [B, N] view forces a
        # physical depad — XLA lowers it as a ~0.5 ms serial copy loop
        # at 7M elements. Padding C up to the next 128 multiple with
        # -inf keeps the flatten layout-compatible (one vectorized pad
        # instead of the loop); -inf slots can never be selected, and
        # the index math just uses the padded channel count.
        cp = -(-chans // 128) * 128
        rows = cls_head.reshape(b, h * w, chans)               # bitcast
        if not from_logits:
            rows = rows.astype(jnp.float32)
        neg = jnp.asarray(-jnp.inf, rows.dtype)
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, cp - chans)),
                       constant_values=neg)
        scores, idxp = jax.lax.approx_max_k(
            rows.reshape(b, -1), top_n, recall_target=recall_target)
        idx = (idxp // cp) * chans + (idxp % cp)
    else:
        scores_flat = cls_head.reshape(b, -1)
        if not from_logits:
            scores_flat = scores_flat.astype(jnp.float32)
        scores, idx = jax.lax.approx_max_k(
            scores_flat, top_n, recall_target=recall_target)
    if from_logits:
        scores = jax.nn.sigmoid(scores.astype(jnp.float32))
    else:
        scores = scores.astype(jnp.float32)

    kk = idx % k
    aa = (idx // k) % a
    ww = (idx // (k * a)) % w
    hh = idx // (k * a * w)

    boxes_flat = box_head.reshape(b, h * w * a, nb).astype(jnp.float32)
    deltas = jnp.take_along_axis(boxes_flat, (idx // k)[..., None], axis=1)

    if anchors is not None:
        table = jnp.asarray(anchors, jnp.float32)              # [A, 4]
        cell = jnp.stack([ww, hh, ww, hh], axis=-1).astype(jnp.float32) * stride
        box = _boxes_from_deltas(deltas, cell + table[aa], rotated, w, h,
                                 stride)
    else:
        box = deltas

    keep = scores > threshold
    scores = jnp.where(keep, scores, 0.0)
    classes = jnp.where(keep, kk, 0).astype(jnp.float32)
    box = jnp.where(keep[..., None], box, 0.0)
    return scores, box, classes


def _boxes_from_deltas(deltas, anc, rotated, w, h, stride):
    """Shared delta->box math (decode.cu:136-160): anchor-relative
    center/size decode with one-sided clamping; rotated carries raw
    (sin, cos) through (decode_rotate.cu:158-160)."""
    aw = anc[..., 2:4] - anc[..., 0:2] + 1
    actr = anc[..., 0:2] + 0.5 * aw
    pred_ctr = deltas[..., 0:2] * aw + actr
    pred_wh = jnp.exp(deltas[..., 2:4]) * aw
    lim = jnp.asarray([w * stride - 1, h * stride - 1], jnp.float32)
    lo = jnp.maximum(pred_ctr - 0.5 * pred_wh, 0.0)
    hi = jnp.minimum(pred_ctr + 0.5 * pred_wh - 1.0, lim)
    box = jnp.concatenate([lo, hi], axis=-1)
    if rotated:
        box = jnp.concatenate([box, deltas[..., 4:6]], axis=-1)
    return box


def decode_fused(cls_heads, box_heads, strides, anchor_tables,
                 threshold=0.05, top_n=1000, rotated=False,
                 from_logits=False, exact=False, total_top_n=None):
    """All-levels decode with ONE global top-k — the TPU fast path.

    Per-level ``decode`` launches one ``approx_max_k`` per FPN level and
    the small levels are pure per-call overhead (measured b=1 @800 on
    v5e: 1.44 ms across 5 levels in one graph). Here every level's
    lane-padded score map is flattened into one [B, N_total] row and a
    single global selection runs over it, then candidates are mapped
    back to (level, cell, anchor, class) and their deltas gathered per
    level under masks. ``approx_max_k`` cost grows steeply with k
    (measured: k=1000 0.72 ms, k=2000 0.87 ms, k=5000 2.11 ms over the
    same 10.2M rows), so the global budget ``total_top_n`` defaults to
    2 x top_n at the model layer rather than top_n x levels.

    Semantics note (deliberate divergence, cf. README): the reference
    caps candidates per level (decode.cu top_n per call); this path
    takes one global budget. Whenever fewer candidates score above
    threshold than the budget — every practical trained-network
    regime — the candidate sets are identical and NMS output matches
    bit-for-bit (tested); under candidate overflow the global form
    keeps higher-scored boxes. The per-level path remains the
    parity/export-exact form.

    cls_heads/box_heads: lists of NHWC maps (logits with from_logits).
    strides/anchor_tables: per level; tables are the axis [A, 4] form.
    Returns the same (scores, boxes, classes) contract as ``decode``.
    """
    nb = 6 if rotated else 4
    b = cls_heads[0].shape[0]
    k = cls_heads[0].shape[-1] // (box_heads[0].shape[-1] // nb)

    rows, offs, metas = [], [], []
    off = 0
    for ch in cls_heads:
        _, h, w, chans = ch.shape
        cp = -(-chans // 128) * 128
        r = ch.reshape(b, h * w, chans)
        if not from_logits:
            r = r.astype(jnp.float32)
        neg = jnp.asarray(-jnp.inf, r.dtype)
        if cp != chans:
            r = jnp.pad(r, ((0, 0), (0, 0), (0, cp - chans)),
                        constant_values=neg)
        rows.append(r.reshape(b, h * w * cp))
        offs.append(off)
        metas.append((h, w, chans, cp))
        off += h * w * cp

    flat = jnp.concatenate(rows, axis=1)                    # [B, N_total]
    total = min(total_top_n or top_n * len(cls_heads), flat.shape[1])
    if exact:
        scores, idx = jax.lax.top_k(flat, total)
    else:
        scores, idx = jax.lax.approx_max_k(flat, total)
    scores = scores.astype(jnp.float32)
    if from_logits:
        scores = jax.nn.sigmoid(scores)

    out_box = jnp.zeros((b, total, nb), jnp.float32)
    out_cls = jnp.zeros((b, total), jnp.float32)
    for (h, w, chans, cp), off, bh, stride, table in zip(
            metas, offs, box_heads, strides, anchor_tables):
        a = chans // k
        local = idx - off
        in_level = (local >= 0) & (local < h * w * cp)
        local = jnp.where(in_level, local, 0)
        c = local % cp                                      # < chans if hit
        row = local // cp
        kk = c % k
        aa = c // k
        ww = row % w
        hh = row // w

        deltas = jnp.take_along_axis(
            bh.reshape(b, h * w * a, nb).astype(jnp.float32),
            (row * a + aa)[..., None], axis=1)

        tbl = jnp.asarray(table, jnp.float32)
        cell = jnp.stack([ww, hh, ww, hh], -1).astype(jnp.float32) * stride
        box = _boxes_from_deltas(deltas, cell + tbl[aa], rotated, w, h,
                                 stride)
        out_box = jnp.where(in_level[..., None], box, out_box)
        out_cls = jnp.where(in_level, kk.astype(jnp.float32), out_cls)

    keep = scores > threshold
    return (jnp.where(keep, scores, 0.0),
            jnp.where(keep[..., None], out_box, 0.0),
            jnp.where(keep, out_cls, 0.0))
