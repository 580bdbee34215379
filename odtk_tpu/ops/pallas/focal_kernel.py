"""Fused sigmoid-focal-loss sum: Pallas forward + custom-VJP backward.

The dense-one-hot focal path materializes several [B, N, K] f32/s32
buffers on the way to the loss (one-hot construction, fg broadcasts,
layout copies between the [B, N, K] target form and the [B, H, W, A*K]
head form) — measured ~10 ms/step of pure HBM traffic at 832 px on
v5e, in a step that is bandwidth-bound. This kernel instead reads the
class head in its NATIVE [B, H, W, A*K] layout plus the tiny
index-form targets (cls [B, N] + depth [B, N], N = H*W*A) and emits
only per-block partial sums — the one-hot never exists in memory. The
backward kernel recomputes elementwise and writes dlogits in the head's
dtype. No gather and no scatter anywhere, which is what killed the
earlier XLA-level fusion attempt (take_along_axis differentiates into
a scatter; see the measured-dead-ends list).

Math (per element; t in {0,1} from k == cls and depth > 0, masked by
depth >= 0 — odtk/loss.py:5-18 + model.py:196-207 semantics):
    s = sigmoid(x);  p_t = t s + (1-t)(1-s);  q = 1 - p_t
    ce = max(x,0) - x t + log1p(exp(-|x|))          # = -log p_t, stable
    loss = alpha_t q^gamma ce
    dloss/dx = -alpha_t (2t-1) q^gamma (gamma p_t ce + q)
The d(p_t)/dx = s(1-s)(2t-1) factor contracts with 1/p_t into p_t*q,
keeping the gradient finite as p_t -> 0.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_block(m, cap=512):
    """Largest row-block <= cap that divides m (avoids a pad-copy of
    the whole operand); falls back to 256-with-padding for awkward
    sizes. ODTK_FOCAL_BLOCK overrides the cap (diagnostic)."""
    env = os.environ.get('ODTK_FOCAL_BLOCK')
    if env:
        cap = int(env)
    for b in (512, 256, 128, 64, 32, 16, 8):
        if b <= cap and m % b == 0:
            return b
    return min(256, cap)


def _terms(xa, ca, da, classes, alpha, gamma):
    """Shared per-(row, class) focal terms for one anchor slot.

    xa [R, K] f32 logits; ca/da [R, 1] f32 class index / depth.
    Returns (valid, a_t, t, p_t, q^gamma, ce), all [R, K] f32.
    """
    r = xa.shape[0]
    # int32 iota: Mosaic's tpu.iota only produces integers
    kidx = jax.lax.broadcasted_iota(jnp.int32, (r, classes), 1)
    fg = (da > 0).astype(jnp.float32)
    t = (kidx == ca.astype(jnp.int32)).astype(jnp.float32) * fg
    valid = (da >= 0).astype(jnp.float32)
    s = jax.nn.sigmoid(xa)
    ce = jnp.maximum(xa, 0.0) - xa * t + jnp.log1p(jnp.exp(-jnp.abs(xa)))
    p_t = t * s + (1.0 - t) * (1.0 - s)
    q = 1.0 - p_t
    qg = q * q if gamma == 2.0 else q ** gamma
    a_t = t * alpha + (1.0 - t) * (1.0 - alpha)
    return valid, a_t, t, p_t, q, qg, ce


def _fwd_kernel(x_ref, cls_ref, dep_ref, out_ref, *, anchors, classes,
                alpha, gamma):
    # single shared (1,1) SMEM accumulator: TPU grids run sequentially,
    # so init at step 0 then += (a (grid,1) VMEM partials array would
    # need a (1,1) block over a >1-row array — Mosaic's 8x128 rule
    # rejects that, and scalar stores must target SMEM anyway)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:].astype(jnp.float32)
    total = jnp.float32(0.0)
    for a in range(anchors):
        xa = x[:, a * classes:(a + 1) * classes]
        valid, a_t, _, _, _, qg, ce = _terms(
            xa, cls_ref[:, a:a + 1], dep_ref[:, a:a + 1],
            classes, alpha, gamma)
        total = total + jnp.sum(valid * a_t * qg * ce)
    out_ref[0, 0] += total


def _bwd_kernel(g_ref, x_ref, cls_ref, dep_ref, dx_ref, *, anchors,
                classes, alpha, gamma):
    g = g_ref[0, 0]
    x = x_ref[:].astype(jnp.float32)
    for a in range(anchors):
        sl = slice(a * classes, (a + 1) * classes)
        valid, a_t, t, p_t, q, qg, ce = _terms(
            x[:, sl], cls_ref[:, a:a + 1], dep_ref[:, a:a + 1],
            classes, alpha, gamma)
        dx = -a_t * (2.0 * t - 1.0) * qg * (gamma * p_t * ce + q)
        dx_ref[:, sl] = (g * valid * dx).astype(dx_ref.dtype)


def _pad_rows(arr, m_pad, fill):
    m = arr.shape[0]
    if m == m_pad:
        return arr
    return jnp.pad(arr, ((0, m_pad - m), (0, 0)), constant_values=fill)


@functools.lru_cache(maxsize=None)
def _build(anchors, classes, alpha, gamma, block, interpret):
    """custom-VJP focal-sum over 2-D operands, statics baked in."""
    c = anchors * classes
    fwd_k = functools.partial(_fwd_kernel, anchors=anchors,
                              classes=classes, alpha=alpha, gamma=gamma)
    bwd_k = functools.partial(_bwd_kernel, anchors=anchors,
                              classes=classes, alpha=alpha, gamma=gamma)

    def run_fwd(x2d, cls2d, dep2d):
        m = x2d.shape[0]
        m_pad = -(-m // block) * block
        grid = m_pad // block
        total = pl.pallas_call(
            fwd_k,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, c), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            interpret=interpret,
        )(_pad_rows(x2d, m_pad, 0.0),
          _pad_rows(cls2d, m_pad, 0.0),
          _pad_rows(dep2d, m_pad, -1.0))        # pad rows are invalid
        return total[0, 0]

    def run_bwd(g, x2d, cls2d, dep2d):
        m = x2d.shape[0]
        m_pad = -(-m // block) * block
        grid = m_pad // block
        dx = pl.pallas_call(
            bwd_k,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((block, c), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, c), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, c), x2d.dtype),
            interpret=interpret,
        )(jnp.reshape(g.astype(jnp.float32), (1, 1)),
          _pad_rows(x2d, m_pad, 0.0),
          _pad_rows(cls2d, m_pad, 0.0),
          _pad_rows(dep2d, m_pad, -1.0))
        return dx[:m]

    @jax.custom_vjp
    def focal_sum_2d(x2d, cls2d, dep2d):
        return run_fwd(x2d, cls2d, dep2d)

    def fwd(x2d, cls2d, dep2d):
        return run_fwd(x2d, cls2d, dep2d), (x2d, cls2d, dep2d)

    def bwd(res, g):
        x2d, cls2d, dep2d = res
        return (run_bwd(g, x2d, cls2d, dep2d),
                jnp.zeros_like(cls2d), jnp.zeros_like(dep2d))

    focal_sum_2d.defvjp(fwd, bwd)
    return focal_sum_2d


def _loss_fwd_kernel(x_ref, bx_ref, bt_ref, cls_ref, dep_ref, out_ref,
                     *dx_refs, anchors, classes, box_dim, alpha, gamma,
                     beta, want_dx, planar_bt):
    """Full-lane-width joint (focal, smooth-L1) forward; optionally also
    emits the unit gradients (dloss/dx before the cotangent scale).

    The earlier form looped the anchor axis in [block, classes] slabs —
    80-lane slices of a 128-lane register, so every transcendental ran
    at 62% lane utilization AND each slab needed a lane-rotation to
    realign (non-128-multiple offsets). Here the whole [block, A*K]
    operand is processed at once: the per-column class/depth values are
    expanded from [block, A] via one tiny MXU contraction against a
    trace-time block-diagonal constant ([A, A*K] with E[a, c] = (c//K
    == a)), and the per-column class index is a trace-time iota%K
    constant. Emitting dx in the forward makes the backward a plain
    XLA scale (the kernel is VPU-transcendental-bound, so recomputing
    every term in a second pass — the old backward kernel — cost more
    than the extra VMEM->HBM write).
    """
    # out_ref is a (1, 2) SMEM accumulator: [cls_sum, box_sum]
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[0, 0] = jnp.float32(0.0)
        out_ref[0, 1] = jnp.float32(0.0)

    ck = anchors * classes
    cb = anchors * box_dim
    # in-kernel constants (pallas_call rejects closed-over arrays):
    # per-column class index and the block-diagonal anchor expanders
    col_k = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
    kmod = col_k - classes * (col_k // classes)            # iota % K
    e_cls = (jax.lax.broadcasted_iota(jnp.int32, (anchors, ck), 1)
             // classes
             == jax.lax.broadcasted_iota(jnp.int32, (anchors, ck), 0)) \
        .astype(jnp.float32)                               # [A, A*K]
    e_box = (jax.lax.broadcasted_iota(jnp.int32, (anchors, cb), 1)
             // box_dim
             == jax.lax.broadcasted_iota(jnp.int32, (anchors, cb), 0)) \
        .astype(jnp.float32)                               # [A, A*D]

    x = x_ref[:].astype(jnp.float32)                       # [R, A*K]
    ca = jnp.dot(cls_ref[:], e_cls,
                 preferred_element_type=jnp.float32)       # [R, A*K]
    da = jnp.dot(dep_ref[:], e_cls,
                 preferred_element_type=jnp.float32)       # [R, A*K]

    fg = (da > 0.0).astype(jnp.float32)
    t = (kmod == ca.astype(jnp.int32)).astype(jnp.float32) * fg
    valid = (da >= 0.0).astype(jnp.float32)
    s = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = t * s + (1.0 - t) * (1.0 - s)
    q = 1.0 - p_t
    qg = q * q if gamma == 2.0 else q ** gamma
    a_t = t * alpha + (1.0 - t) * (1.0 - alpha)
    cls_total = jnp.sum(valid * a_t * qg * ce)

    bx = bx_ref[:].astype(jnp.float32)                     # [R, A*D]
    if planar_bt:
        # bt arrives as D planes [D, R, A] (the assignment's free
        # bitcast layout, assign.py _finalize); interleave to the
        # head's a-major/coord-minor column order in VMEM with D tiny
        # MXU scatters E_j[a, c] = (c//D == a) & (c%D == j) — the XLA
        # alternative is a ~1.25 ms/step [B, N, D] relayout copy.
        ci = jax.lax.broadcasted_iota(jnp.int32, (anchors, cb), 1)
        ai = jax.lax.broadcasted_iota(jnp.int32, (anchors, cb), 0)
        bt = jnp.float32(0.0)
        for j in range(box_dim):
            e_j = ((ci // box_dim == ai)
                   & (ci - box_dim * (ci // box_dim) == j)) \
                .astype(jnp.float32)                       # [A, A*D]
            bt = bt + jnp.dot(bt_ref[j].astype(jnp.float32), e_j,
                              preferred_element_type=jnp.float32)
    else:
        bt = bt_ref[:].astype(jnp.float32)
    fgb = (jnp.dot(dep_ref[:], e_box,
                   preferred_element_type=jnp.float32) > 0.0) \
        .astype(jnp.float32)
    d = bx - bt
    ad = jnp.abs(d)
    sl1 = jnp.where(ad >= beta, ad - 0.5 * beta, 0.5 * ad * ad / beta)
    box_total = jnp.sum(fgb * sl1)

    out_ref[0, 0] += cls_total
    out_ref[0, 1] += box_total

    if want_dx:
        dx_ref, dbx_ref = dx_refs
        dx = -a_t * (2.0 * t - 1.0) * qg * (gamma * p_t * ce + q)
        dx_ref[:] = (valid * dx).astype(dx_ref.dtype)
        # d smooth_l1 / d pred = clamp(diff / beta, -1, 1)
        dbx_ref[:] = (fgb * jnp.clip(d / beta, -1.0, 1.0)) \
            .astype(dbx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_joint(anchors, classes, box_dim, alpha, gamma, beta, block,
                 interpret, planar_bt=False):
    """custom-VJP (focal_sum, smooth_l1_sum) over 2-D operands.

    planar_bt: box targets arrive as [D, M, A] planes instead of the
    interleaved [M, A*D] (see _loss_fwd_kernel)."""
    ck = anchors * classes
    cb = anchors * box_dim

    def _pad_bt(bt, m_pad):
        if not planar_bt:
            return _pad_rows(bt, m_pad, 0.0)
        m = bt.shape[1]
        if m == m_pad:
            return bt
        return jnp.pad(bt, ((0, 0), (0, m_pad - m), (0, 0)))

    def run_fwd(x2d, bx2d, bt2d, cls2d, dep2d, want_dx):
        m = x2d.shape[0]
        m_pad = -(-m // block) * block
        grid = m_pad // block
        kern = functools.partial(
            _loss_fwd_kernel, anchors=anchors, classes=classes,
            box_dim=box_dim, alpha=alpha, gamma=gamma, beta=beta,
            want_dx=want_dx, planar_bt=planar_bt)
        out_specs = [pl.BlockSpec((1, 2), lambda g: (0, 0),
                                  memory_space=pltpu.SMEM)]
        out_shape = [jax.ShapeDtypeStruct((1, 2), jnp.float32)]
        if want_dx:
            out_specs += [
                pl.BlockSpec((block, ck), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, cb), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((m_pad, ck), x2d.dtype),
                jax.ShapeDtypeStruct((m_pad, cb), bx2d.dtype),
            ]
        outs = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, ck), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, cb), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                (pl.BlockSpec((box_dim, block, anchors),
                              lambda g: (0, g, 0),
                              memory_space=pltpu.VMEM) if planar_bt else
                 pl.BlockSpec((block, cb), lambda g: (g, 0),
                              memory_space=pltpu.VMEM)),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, anchors), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(_pad_rows(x2d, m_pad, 0.0),
          _pad_rows(bx2d, m_pad, 0.0),
          _pad_bt(bt2d, m_pad),
          _pad_rows(cls2d, m_pad, 0.0),
          _pad_rows(dep2d, m_pad, -1.0))       # pad rows are invalid
        sums = outs[0]
        if want_dx:
            return (sums[0, 0], sums[0, 1]), outs[1][:m], outs[2][:m]
        return sums[0, 0], sums[0, 1]

    @jax.custom_vjp
    def loss_sums_2d(x2d, bx2d, bt2d, cls2d, dep2d):
        return run_fwd(x2d, bx2d, bt2d, cls2d, dep2d, False)

    def fwd(x2d, bx2d, bt2d, cls2d, dep2d):
        sums, dx_unit, dbx_unit = run_fwd(x2d, bx2d, bt2d, cls2d, dep2d,
                                          True)
        return sums, (dx_unit, dbx_unit)

    def bwd(res, gs):
        dx_unit, dbx_unit = res
        m = dx_unit.shape[0]
        # the cotangent scale is the whole backward — plain XLA ops that
        # fuse into whatever consumes the gradients (bt/cls/dep operands
        # are always f32 in flat_call; their cotangents are unused)
        dx = (gs[0] * dx_unit.astype(jnp.float32)).astype(dx_unit.dtype)
        dbx = (gs[1] * dbx_unit.astype(jnp.float32)).astype(dbx_unit.dtype)
        zbt = (jnp.zeros((box_dim, m, anchors), jnp.float32) if planar_bt
               else jnp.zeros((m, cb), jnp.float32))
        return (dx, dbx, zbt,
                jnp.zeros((m, anchors), jnp.float32),
                jnp.zeros((m, anchors), jnp.float32))

    loss_sums_2d.defvjp(fwd, bwd)
    return loss_sums_2d


def detection_loss_sums_fused(cls_head, box_head, cls_idx, box_t, depth,
                              classes, alpha=0.25, gamma=2.0, beta=0.11,
                              mesh=None, interpret=False):
    """(focal_sum, smooth_l1_sum) for one level in ONE fused kernel pass.

    Extends focal_sum_fused with the box term: box_head [B, H, W, A*D]
    in its native layout and box_t are read in the same grid as the
    class head, sharing the depth-mask loads. box_t comes in one of
    two forms: interleaved [B, N, D] (flat assignment output,
    anchor-major — a bitcast of the same [BHW, A*D] layout), or planar
    [D, B, HW, A] (the assignment's free-bitcast layout; the kernel
    interleaves in VMEM, saving a ~1.25 ms/step XLA relayout). The
    separate XLA smooth-L1 materialized fp32 [B, N, D] temporaries in
    forward AND backward; here the diff never leaves VMEM. Semantics:
    smooth-L1(beta) summed over fg anchors (odtk/loss.py:20-31,
    odtk/model.py:186-210); caller normalizes both sums by fg count.
    """
    b, h, w, chan = cls_head.shape
    anchors = chan // classes
    box_dim = box_head.shape[-1] // anchors
    planar = box_t.ndim == 4

    def flat_call(chd, bhd, ci, bt, dp):
        x2d = chd.reshape(-1, chan)
        bx2d = bhd.reshape(-1, anchors * box_dim)
        if planar:
            bt2d = bt.astype(jnp.float32).reshape(box_dim, -1, anchors)
        else:
            bt2d = bt.astype(jnp.float32).reshape(-1, anchors * box_dim)
        cls2d = ci.astype(jnp.float32).reshape(-1, anchors)
        dep2d = dp.astype(jnp.float32).reshape(-1, anchors)
        # rotated (6-delta) joint kernels cap the row block at 256:
        # at block 512 the Mosaic compiler itself crashes
        # (tpu_compile_helper exit 1 / HTTP 500 through the axon remote
        # backend) on the b=8 @832 graph — bisected r5; block 256
        # compiles and runs. Axis (4-delta) keeps 512, proven on
        # hardware since round 3.
        fn2d = _build_joint(anchors, classes, box_dim, float(alpha),
                            float(gamma), float(beta),
                            _pick_block(x2d.shape[0],
                                        cap=256 if box_dim == 6 else 512),
                            bool(interpret),
                            planar_bt=planar)
        return fn2d(x2d, bx2d, bt2d, cls2d, dep2d)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        # check_vma=False: see focal_sum_fused
        bt_spec = P(None, axis) if planar else P(axis)
        local = jax.shard_map(
            lambda *ops: jax.tree.map(
                lambda s: jax.lax.psum(s, axis), flat_call(*ops)),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), bt_spec, P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return local(cls_head, box_head, cls_idx, box_t, depth)
    return flat_call(cls_head, box_head, cls_idx, box_t, depth)


def focal_sum_fused(cls_head, cls_idx, depth, classes, alpha=0.25,
                    gamma=2.0, mesh=None, interpret=False):
    """Masked focal-loss SUM over one level, fused (no dense one-hot).

    cls_head [B, H, W, A*K] (any float dtype — grads come back in the
    same dtype); cls_idx [B, N] float class indices (index-form
    assignment output); depth [B, N] float (-1 ignore / 0 background /
    c+1 foreground). Returns the f32 sum of focal losses over valid
    anchors — the caller normalizes by the foreground count
    (odtk/model.py:207-209).

    mesh: when given and spanning >1 device, the kernel runs under
    shard_map over the 'data' batch axis with a psum of the partial
    sums — pallas_call does not auto-partition under GSPMD.
    """
    b, h, w, chan = cls_head.shape
    anchors = chan // classes

    def flat_call(head, cls_i, dep):
        x2d = head.reshape(-1, chan)                     # [BHW, A*K] bitcast
        cls2d = cls_i.astype(jnp.float32).reshape(-1, anchors)
        dep2d = dep.astype(jnp.float32).reshape(-1, anchors)
        fn2d = _build(anchors, classes, float(alpha), float(gamma),
                      _pick_block(x2d.shape[0]), bool(interpret))
        return fn2d(x2d, cls2d, dep2d)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        # check_vma=False: pallas_call can't annotate how its output
        # varies across mesh axes, so shard_map's varying-mesh-axes
        # checker rejects it; the psum makes the result replicated.
        local = jax.shard_map(
            lambda hd, ci, dp: jax.lax.psum(flat_call(hd, ci, dp), axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
        return local(cls_head, cls_idx, depth)
    return flat_call(cls_head, cls_idx, depth)
