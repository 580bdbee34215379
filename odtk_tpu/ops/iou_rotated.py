"""Rotated-box (convex quad) IoU via vectorized Sutherland-Hodgman clipping.

TPU-native reformulation of the reference CUDA polygon kernels
(csrc/cuda/nms_iou.cu:114-169 ``IntersectionArea``, :324-375
``iou_cuda_kernel``): the branchy per-thread clipping loop becomes a
fixed-8-slot buffer with masked emission and a cumsum-compaction
scatter, so the whole [N, M] IoU matrix vectorizes under vmap/jit with
static shapes.

Conventions preserved from the reference:
  * subject polygon is the first argument, clipped against the second
    (a convex quad), with a +0.001 pad on coordinates that exactly
    coincide with the clip quad's matching corner (nms_iou.cu:209-219);
  * ``iou = inter / (union - inter)`` where ``union = areaA + areaB``;
  * NaN rules: inter NaN and union NaN -> 1.0; inter NaN alone -> 0.0
    (nms_iou.cu:242-248, :367-373).
"""

import os

import jax
import jax.numpy as jnp

_SLOTS = 8  # max vertices of quad-quad intersection


def _next_onehot(count):
    """[S, S] matrix M with M[j, (j+1) mod count] = 1 (0 past count).

    Ring-successor as a dense one-hot so that successor values come
    from a tiny matmul instead of a dynamic gather — gathers/scatters
    inside nested vmap lower to scalar loops on TPU and blow up both
    compile and run time.
    """
    idx = jnp.arange(_SLOTS)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    return (nxt[:, None] == idx[None, :]).astype(jnp.float32)


def _clip_once(pts, count, v1, v2):
    """Clip polygon (pts, count) against the directed line v1->v2."""
    a = v2[1] - v1[1]
    b = v1[0] - v2[0]
    c = v2[0] * v1[1] - v2[1] * v1[0]

    idx = jnp.arange(_SLOTS)
    valid = idx < count
    lv = a * pts[:, 0] + b * pts[:, 1] + c
    ring = _next_onehot(count)                     # [S, S]
    pts_n = ring @ pts                             # successor points
    lv_n = ring @ lv

    emit_vertex = valid & (lv <= 0)
    emit_inter = valid & (lv * lv_n <= 0)

    # Infinite-line intersection of the clip line with segment's line
    a2 = pts_n[:, 1] - pts[:, 1]
    b2 = pts[:, 0] - pts_n[:, 0]
    c2 = pts_n[:, 0] * pts[:, 1] - pts_n[:, 1] * pts[:, 0]
    w = a * b2 - b * a2
    ipt = jnp.stack([(b * c2 - c * b2) / w, (c * a2 - a * c2) / w], axis=-1)

    # Interleave (vertex_j, inter_j) candidates; compact via cumsum
    # positions expressed as a one-hot scatter matrix (matmul, not .at[]).
    # Unkept candidates are zeroed so a NaN from a parallel-line ipt we
    # never emit cannot leak through the 0*NaN matmul; a NaN in a *kept*
    # candidate still propagates (reference NaN convention,
    # nms_iou.cu:242-248).
    cand = jnp.stack([pts, ipt], axis=1).reshape(2 * _SLOTS, 2)
    keep = jnp.stack([emit_vertex, emit_inter], axis=1).reshape(2 * _SLOTS)
    cand = jnp.where(keep[:, None], cand, 0.0)
    pos = jnp.where(keep, jnp.cumsum(keep) - 1, -1)
    scatter = (jnp.arange(_SLOTS)[:, None] == pos[None, :]).astype(cand.dtype)
    new_pts = scatter @ cand                       # [S, 2]
    new_count = jnp.sum(keep).astype(jnp.int32)
    return new_pts, new_count


def _shoelace(pts, count):
    idx = jnp.arange(pts.shape[0])
    pts_n = _next_onehot(count) @ pts
    cross = pts[:, 0] * pts_n[:, 1] - pts[:, 1] * pts_n[:, 0]
    area = jnp.where(idx < count, cross, 0.0).sum()
    return jnp.where(count > 2, jnp.abs(area) / 2.0, 0.0)


def _quad_area(q):
    """Shoelace area of a quad [4, 2]."""
    nxt = jnp.roll(q, -1, axis=0)
    return jnp.abs((q[:, 0] * nxt[:, 1] - q[:, 1] * nxt[:, 0]).sum()) / 2.0


def _pair_iou(subject, clip):
    """IoU of two quads, each [4, 2]; subject is clipped against clip."""
    pad = jnp.where(subject == clip, 0.001, 0.0)
    init = jnp.concatenate(
        [subject + pad, jnp.full((_SLOTS - 4, 2), -1.0, subject.dtype)], axis=0)
    pts, count = init, jnp.int32(4)
    for i in range(4):
        pts, count = _clip_once(pts, count, clip[i], clip[(i + 1) % 4])
    inter = _shoelace(pts, count)
    union = _quad_area(subject) + _quad_area(clip)
    iou = inter / (union - inter)
    both_nan = jnp.isnan(inter) & jnp.isnan(union)
    return jnp.where(both_nan, 1.0, jnp.where(jnp.isnan(inter), 0.0, iou))


def polygon_iou(subject_quads, clip_quads):
    """Pairwise IoU of matched quads. Both [..., 8] -> [...]."""
    s = subject_quads.reshape(*subject_quads.shape[:-1], 4, 2)
    c = clip_quads.reshape(*clip_quads.shape[:-1], 4, 2)
    fn = _pair_iou
    for _ in range(s.ndim - 2):
        fn = jax.vmap(fn)
    return fn(s, c)


def rotated_pair_iou(subject_quads, clip_quads):
    """All-pairs IoU matrix: subject [N, 8] x clip [M, 8] -> [N, M].

    Matches the training-time assignment kernel's orientation
    (nms_iou.cu:324-375: rows are anchors/subjects, cols are boxes).
    Materializes the full matrix — fine for NMS-sized inputs; use
    rotated_best_match for assignment-scale N (bounded memory).
    """
    s = subject_quads.reshape(-1, 4, 2)
    c = clip_quads.reshape(-1, 4, 2)
    return jax.vmap(lambda sq: jax.vmap(lambda cq: _pair_iou(sq, cq))(c))(s)


def _soa_clip_iou(sx, sy, sx_raw, sy_raw, cx, cy):
    """Plane-parallel quad-vs-quad IoU: subjects as 8 slot planes.

    sx, sy: lists of 8 arrays [N] (slots 0-3 = subject corners with the
    coincidence pad applied; 4-7 unused at entry). sx_raw/sy_raw: the
    4 unpadded corners (area term, nms_iou.cu:231-240). cx, cy:
    clip-quad corner scalars [4].
    All operations are [N]-wide elementwise with the slot dimension
    statically unrolled — the TPU-friendly ("struct of planes") form of
    IntersectionArea (nms_iou.cu:114-169). Key trick: the ring
    successor of slot j is statically either slot j+1 or slot 0
    (``j + 1 < count`` decides), so successor values are one select,
    not a gather. Compaction positions come from a running unrolled
    cumsum; each output slot gathers its candidate by position-equality
    selects. Runs unchanged inside jnp (vmap-free) or a Pallas kernel.
    """
    n_like = sx[0]
    count = jnp.full_like(n_like, 4.0)

    subj_area2 = jnp.zeros_like(n_like)   # 2x signed area of subject
    for j in range(4):
        k = (j + 1) % 4
        subj_area2 += sx_raw[j] * sy_raw[k] - sy_raw[j] * sx_raw[k]

    for e in range(4):
        v1x, v1y = cx[e], cy[e]
        v2x, v2y = cx[(e + 1) % 4], cy[(e + 1) % 4]
        a = v2y - v1y
        b = v1x - v2x
        c = v2x * v1y - v2y * v1x

        lv = [a * sx[j] + b * sy[j] + c for j in range(_SLOTS)]
        # successor slot values: j+1 if j+1 < count else 0
        succ = [(jnp.where(j + 1 < count, sx[(j + 1) % _SLOTS], sx[0]),
                 jnp.where(j + 1 < count, sy[(j + 1) % _SLOTS], sy[0]),
                 jnp.where(j + 1 < count, lv[(j + 1) % _SLOTS], lv[0]))
                for j in range(_SLOTS)]

        cand_x, cand_y, keep = [], [], []
        for j in range(_SLOTS):
            in_poly = j < count
            keep.append(in_poly & (lv[j] <= 0))
            cand_x.append(sx[j])
            cand_y.append(sy[j])
            nx, ny, nlv = succ[j]
            keep.append(in_poly & (lv[j] * nlv <= 0))
            a2 = ny - sy[j]
            b2 = sx[j] - nx
            c2 = nx * sy[j] - ny * sx[j]
            w = a * b2 - b * a2
            cand_x.append((b * c2 - c * b2) / w)
            cand_y.append((c * a2 - a * c2) / w)

        # positions via running cumsum; zero unkept candidates so a
        # parallel-line NaN we never emit can't leak (kept NaN still
        # propagates — reference convention nms_iou.cu:242-248)
        pos, run = [], jnp.zeros_like(n_like)
        for kf in keep:
            kfv = kf.astype(n_like.dtype)
            pos.append(jnp.where(kf, run, -1.0))
            run = run + kfv
        new_sx = [jnp.zeros_like(n_like) for _ in range(_SLOTS)]
        new_sy = [jnp.zeros_like(n_like) for _ in range(_SLOTS)]
        for ci in range(2 * _SLOTS):
            safe_x = jnp.where(keep[ci], cand_x[ci], 0.0)
            safe_y = jnp.where(keep[ci], cand_y[ci], 0.0)
            for o in range(min(_SLOTS, ci + 1)):
                sel = pos[ci] == o
                new_sx[o] = jnp.where(sel, safe_x, new_sx[o])
                new_sy[o] = jnp.where(sel, safe_y, new_sy[o])
        sx, sy, count = new_sx, new_sy, run

    inter2 = jnp.zeros_like(n_like)
    for j in range(_SLOTS):
        nx = jnp.where(j + 1 < count, sx[(j + 1) % _SLOTS], sx[0])
        ny = jnp.where(j + 1 < count, sy[(j + 1) % _SLOTS], sy[0])
        inter2 += jnp.where(j < count, sx[j] * ny - sy[j] * nx, 0.0)
    inter = jnp.where(count > 2, jnp.abs(inter2) / 2.0, 0.0)

    clip_area2 = 0.0
    for j in range(4):
        k = (j + 1) % 4
        clip_area2 = clip_area2 + cx[j] * cy[k] - cy[j] * cx[k]
    union = jnp.abs(subj_area2) / 2.0 + jnp.abs(clip_area2) / 2.0
    iou = inter / (union - inter)
    both_nan = jnp.isnan(inter) & jnp.isnan(union)
    return jnp.where(both_nan, 1.0, jnp.where(jnp.isnan(inter), 0.0, iou))


def quad_iou_one_vs_all(subject_quads, clip_quad):
    """IoU of N subject quads vs one clip quad: [N, 8], [8] -> [N].

    Plane-parallel fast path (used per NMS round, nms_iou.cu:171-251).
    """
    subj = subject_quads.reshape(-1, 8).astype(jnp.float32)
    clip = clip_quad.reshape(8).astype(jnp.float32)
    return _clip_iou_one(subj, clip)


def rotated_best_match(subject_quads, clip_quads, valid):
    """(best_iou [N], best_idx [N]) of each subject vs M clip quads.

    Equivalent to argmax over rotated_pair_iou with invalid columns
    forced to -1, but runs as a fori_loop over the M boxes with
    plane-parallel clipping, so the workspace stays O(N) — the full
    [N, M, 16, 2] buffers at ~300k anchors x 32+ targets would blow
    HBM (the CUDA kernel streams the same way, nms_iou.cu:324-339).
    """
    subj = subject_quads.reshape(-1, 8).astype(jnp.float32)
    n = subj.shape[0]
    clips = clip_quads.reshape(-1, 8).astype(jnp.float32)
    m = clips.shape[0]

    def step(i, carry):
        best_iou, best_idx = carry
        iou = _clip_iou_one(subj, clips[i])
        iou = jnp.where(valid[i], iou, -1.0)
        upd = iou > best_iou
        return (jnp.where(upd, iou, best_iou),
                jnp.where(upd, i, best_idx))

    init = (jnp.full((n,), -2.0, jnp.float32), jnp.zeros((n,), jnp.int32))
    return jax.lax.fori_loop(0, m, step, init)


def _clip_iou_one(subj, quad):
    """Plane-parallel IoU of N subject quads [N, 8] vs one quad [8]."""
    n = subj.shape[0]
    cx = [quad[2 * k] for k in range(4)]
    cy = [quad[2 * k + 1] for k in range(4)]
    # 0.001 pad on coincident coordinates (nms_iou.cu:209-219); area
    # uses the raw corners (nms_iou.cu:231-240)
    sx_raw = [subj[:, 2 * k] for k in range(4)]
    sy_raw = [subj[:, 2 * k + 1] for k in range(4)]
    sx = [jnp.where(sx_raw[k] == cx[k], sx_raw[k] + 0.001, sx_raw[k])
          for k in range(4)]
    sy = [jnp.where(sy_raw[k] == cy[k], sy_raw[k] + 0.001, sy_raw[k])
          for k in range(4)]
    zeros = [jnp.zeros((n,), jnp.float32)] * 4
    return _soa_clip_iou(sx + zeros, sy + zeros, sx_raw, sy_raw, cx, cy)


def quad_areas(quads):
    """Shoelace areas of quads [..., 8] -> [...]."""
    q = quads.reshape(*quads.shape[:-1], 4, 2)
    nxt = jnp.roll(q, -1, axis=-2)
    return jnp.abs((q[..., 0] * nxt[..., 1]
                    - q[..., 1] * nxt[..., 0]).sum(-1)) / 2.0


def _tpu_backend():
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except RuntimeError:
        return False


def rotated_best_match_batched(subject_quads, clip_quads, valid,
                               skip_ratio=None, payload=None, chunk=8,
                               use_pallas=None):
    """Batched chunk-streaming best-match with real per-target skipping.

    subject_quads [N, 8] (shared across the batch — translated anchor
    grid), clip_quads [B, M, 8], valid [B, M] ->
    (best_iou [B, N], best_idx [B, N]) — or, when ``payload`` [B, M, D]
    is given, (best_iou [B, N], best_payload [B, N, D]).

    Equivalent to ``jax.vmap(rotated_best_match)`` but the batch axis is
    explicit in the packed (b, m) stream, so inactive target slots are
    actually skipped (under vmap a ``lax.cond`` would lower to ``select``
    and both branches would always execute). A slot is skipped when

      * it is padding (``valid`` false), or
      * ``skip_ratio`` (the assignment's ``lo`` IoU threshold) is given
        and the target's area is outside ``[lo * min(Sa), max(Sa) / lo]``
        — since IoU <= min(Sa, Sb) / max(Sa, Sb), such a target cannot
        reach ``lo`` against ANY anchor of this level, so every anchor
        stays background w.r.t. it and the skip is exact.

    Survivors are processed ``chunk`` at a time: one vmapped clip pass
    computes [chunk, N] IoUs in a single wide fusion, then an
    elementwise [B, N] masked-max merge folds them in packed (b, m)
    order (strict >, so winner tie-breaks match the one-at-a-time
    stream exactly) — one fused pass, no serialized per-row updates.
    Profiled on v5e: the one-target-per-iteration while loop cost
    ~2.3 ms per target *independent of clip span* (AABB-windowing the
    pass to 1/3 of the anchors changed nothing) — per-iteration
    overhead, not clip arithmetic, dominated, and chunking amortizes
    it ~chunk-fold.

    The winner's attributes come back as the original slot id; the
    caller-facing ``payload`` form contracts a slot-one-hot against the
    payload rows ([B, N, M] @ [B, M, D] — generated inside the matmul
    fusion, never a gather: batched gathers by best-index lower to
    ~ms-scale scatter-loop custom calls on TPU at N~300k). Anchors no
    active target ever touched keep the -2 IoU sentinel and slot 0
    (payload row 0) — the documented classification-equivalent
    convention (only sub-``lo`` background anchors can differ from the
    vmapped reference).
    """
    subj = subject_quads.reshape(-1, 8).astype(jnp.float32)
    n = subj.shape[0]
    clips = clip_quads.astype(jnp.float32)
    bsz, m = clips.shape[0], clips.shape[1]

    if skip_ratio is not None:
        areas = quad_areas(subj)                       # [N]
        amin, amax = jnp.min(areas), jnp.max(areas)
        clip_areas = quad_areas(clips)                 # [B, M]
        band = ((clip_areas >= skip_ratio * amin)
                & (clip_areas * skip_ratio <= amax))
        active = valid & band
    else:
        active = valid

    env_chunk = os.environ.get('ODTK_ROTATED_CHUNK')
    if env_chunk:
        chunk = int(env_chunk)
    if use_pallas is None:
        # Pallas matcher on TPU (measured r5 at b=8 @832 RN50:
        # 87.5 ms/step vs the stream twin's 89.6, and 90.9 vs 117.1
        # with 24 dense small targets — the tile-AABB skip earns its
        # keep exactly there). NB the rounds-3..5 rotated compile
        # failures blamed on this kernel were actually the joint loss
        # kernel's 512-row block at box_dim=6 (focal_kernel._pick_block
        # cap). ODTK_ROTATED_MATCH=stream|pallas overrides.
        env = os.environ.get('ODTK_ROTATED_MATCH', '')
        if env in ('stream', 'pallas'):
            use_pallas = env == 'pallas'
        else:
            use_pallas = _tpu_backend()
    if use_pallas:
        # one-launch Pallas matcher: VMEM-resident anchor planes, a
        # dynamic loop over per-image packed actives, tile-AABB skip
        # (ops/pallas/match_rotated_kernel.py) — replaces the whole
        # while_loop below on TPU; the stream below stays the portable
        # reference twin
        from .pallas.match_rotated_kernel import rotated_match_pallas
        order_b = jnp.argsort(~active, axis=1, stable=True)   # [B, M]
        packed_b = jnp.take_along_axis(clips, order_b[..., None], axis=1)
        rows_b = jnp.concatenate(
            [packed_b, order_b[..., None].astype(jnp.float32)], axis=-1)
        n_act_b = active.sum(axis=1).astype(jnp.int32)
        best_iou, best_slot = rotated_match_pallas(subj, rows_b, n_act_b)
        return _with_payload(best_iou, best_slot, payload, m)

    # Pack the active (b, m) slots into a dense prefix so the loop runs
    # ceil(n_act / chunk) times instead of dispatching B*M lax.cond
    # iterations (profiled: *skipped* iterations still cost ~20 us of
    # loop/cond overhead each — ~50 ms/step over 5 levels at B*M=256).
    # The stable argsort keeps actives in (b, m) order. The [B*M]-sized
    # gathers here are tiny (max_det rows, not anchors) and run once,
    # outside the loop.
    flat_active = active.reshape(-1)
    order = jnp.argsort(~flat_active, stable=True)     # actives first
    packed_quads = clips.reshape(-1, 8)[order]         # [B*M, 8]
    packed_bi = (order // m).astype(jnp.int32)
    packed_slot = (order % m).astype(jnp.int32)        # original slot id
    n_act = flat_active.sum().astype(jnp.int32)
    chunk = min(int(chunk), bsz * m)
    # Pad the packed stream to a chunk multiple so the loop's
    # dynamic_slice never clamps its start (a clamped window would
    # apply the wrong rows under the activity mask).
    pad = (-bsz * m) % chunk
    if pad:
        packed_quads = jnp.pad(packed_quads, ((0, pad), (0, 0)))
        packed_bi = jnp.pad(packed_bi, (0, pad))
        packed_slot = jnp.pad(packed_slot, (0, pad))

    def body(carry):
        j, best_iou, best_slot = carry
        base = j * chunk
        quads = jax.lax.dynamic_slice(packed_quads, (base, 0), (chunk, 8))
        bis = jax.lax.dynamic_slice(packed_bi, (base,), (chunk,))
        slots = jax.lax.dynamic_slice(packed_slot, (base,), (chunk,))
        act = base + jnp.arange(chunk, dtype=jnp.int32) < n_act
        # one wide fusion for the whole chunk's clip arithmetic
        ious = jax.vmap(lambda q: _clip_iou_one(subj, q))(quads)
        # Elementwise [B, N] masked-max merge: each chunk element is
        # broadcast-selected into its batch row and folded with strict >
        # in packed order (first max wins, matching the one-at-a-time
        # stream). No per-row dynamic updates — the whole unroll fuses
        # into one pass over [B, N] instead of a serialized chain of
        # 2*chunk [1, N] slice/update kernels.
        rows = bis[:, None] == jnp.arange(bsz, dtype=jnp.int32)[None, :]
        chunk_iou = jnp.full((bsz, n), -jnp.inf, jnp.float32)
        chunk_slot = jnp.zeros((bsz, n), jnp.int32)
        for i in range(chunk):                         # static unroll
            iou_i = jnp.where(act[i], ious[i], -jnp.inf)   # [N]
            cand = jnp.where(rows[i][:, None], iou_i[None, :], -jnp.inf)
            upd = cand > chunk_iou
            chunk_slot = jnp.where(upd, slots[i], chunk_slot)
            chunk_iou = jnp.maximum(chunk_iou, cand)
        upd = chunk_iou > best_iou
        best_slot = jnp.where(upd, chunk_slot, best_slot)
        best_iou = jnp.maximum(best_iou, chunk_iou)
        return j + 1, best_iou, best_slot

    init = (jnp.int32(0), jnp.full((bsz, n), -2.0, jnp.float32),
            jnp.zeros((bsz, n), jnp.int32))
    _, best_iou, best_slot = jax.lax.while_loop(
        lambda c: c[0] * chunk < n_act, body, init)
    return _with_payload(best_iou, best_slot, payload, m)


def _with_payload(best_iou, best_slot, payload, m):
    if payload is None:
        return best_iou, best_slot
    onehot = (best_slot[..., None]
              == jnp.arange(m, dtype=jnp.int32)).astype(jnp.float32)
    best_pay = jnp.einsum('bnm,bmd->bnd', onehot,
                          payload.astype(jnp.float32))
    return best_iou, best_pay


def sincos_box_corners(boxes):
    """Corners [..., 8] of (x1,y1,x2,y2,sin,cos) boxes, NMS convention.

    Mirrors nms_iou.cu:199-228: the axis-aligned rect is rotated about
    its center by R = [[cos, -sin], [sin, cos]].
    """
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    s, c = boxes[..., 4], boxes[..., 5]
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    xs = jnp.stack([x1, x2, x2, x1], axis=-1) - cx[..., None]
    ys = jnp.stack([y1, y1, y2, y2], axis=-1) - cy[..., None]
    rx = xs * c[..., None] - ys * s[..., None] + cx[..., None]
    ry = ys * c[..., None] + xs * s[..., None] + cy[..., None]
    return jnp.stack([rx, ry], axis=-1).reshape(*boxes.shape[:-1], 8)
