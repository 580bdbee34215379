"""Fused stem tail: BN + ReLU + 3x3/s2 max pool as one Pallas kernel.

The reference stem (conv1 7x7/s2 -> BN -> ReLU -> maxpool 3x3/s2,
torchvision resnet via odtk/backbones/resnet.py:7-39) does ~0.26 ms of
FLOPs at b=8 @832 on v5e but cost ~11 ms through XLA: the 3-channel
7x7 conv runs at 7 TFLOP/s (Cin=3 pads to a 128-deep MXU contraction),
the [B,416,416,64] activation is materialized by a dual-output BN+ReLU
fusion, re-read by the pool, and routed back by a select-and-scatter
pool backward. This kernel consumes the stem conv's output in its
MERGED PHASE layout — [B, Hc, Wp, 2C] with even/odd output columns
lane-packed in the channel axis, exactly what the merged space-to-depth
phase conv emits (backbones/layers.py:merged_phase_conv) — and writes
the pooled [B, Hc/2, Wp, C] map directly: the post-BN/ReLU activation
never exists in HBM, forward or backward, and NO relayout runs between
the conv and the pool (the earlier two-tensor flat-lane design spent
~3.4 ms/step on [B,Hc,Wp,C]->[rows,2WpC] retilings + copies that this
layout makes free rank-preserving reshapes).

Geometry: pooled (p, q) takes the max over conv rows 2p-1, 2p, 2p+1
and conv cols 2q-1, 2q, 2q+1. In the merged layout conv col 2q lives
at (w=q, lane<C) ("e") and 2q+1 at (w=q, lane>=C) ("o"), so the three
column candidates of window col q are e[q], o[q], and o[q-1] — one
sublane shift along W, no lane math. Rows interleave phases along the
leading (untiled) dim: even rows 2p and odd rows 2p+1 split with a
free leading-dim reshape, and the row-(2p-1) candidates are the odd
rows shifted down by one pooled row. The one cross-block dependency
(the previous block's last conv row; in the backward also the next
block's first rows and pooled-grad row) is pre-gathered OUTSIDE the
kernel as strided row slices fed through 1-block side inputs.

The forward also emits the window ARGMAX as an int8 plane (candidate
index 0..8 in the forward's reduction order, sentinel 9 when the
post-ReLU max is 0 — i.e. when the ReLU kills every gradient in the
window). The backward is then pure index routing: it reads ONLY the
idx plane and the pooled cotangent (no conv output, no BN/ReLU
recompute — a routed candidate's activation equals the window max > 0,
so the ReLU mask is implied by the sentinel), scatters each cotangent
to its candidate's merged-layout position, and scales by the BN
weight. That drops the backward from ~90 VPU ops/element over the
conv-shaped tensor (9 candidate constructions + first-max prefix
routing, measured 1.51 ms/step at b=8 @832) to ~9 compare-selects over
the HALF-sized pooled tensor plus data movement (~0.3 ms HBM floor).

jnp twin (`_twin`) keeps CPU/debug paths exact; tests pin the kernel
to it in interpret mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38     # python float: jnp scalars would be captured consts


def _bn_relu(y, sc, sh):
    return jnp.maximum(y.astype(jnp.float32) * sc + sh, 0.0)


def _shift_w(z):
    """out[:, q] = z[:, q-1] along the W (sublane) axis; col 0 = -inf
    (pool pad: window col 0's left candidate is conv col -1). Call on
    the FULL 2c-lane rows, slice after: concatenating a lane-sliced
    operand (layout offset 64) with a fresh fill (offset 0) is an
    unimplemented Mosaic relayout."""
    return jnp.concatenate(
        [jnp.full_like(z[:, :1], _NEG), z[:, :-1]], axis=1)


def _unshift_w(a):
    """Inverse routing of _shift_w for gradients: the contribution
    computed at window col q belongs to conv col q-1; out[:, q] =
    a[:, q+1], the contribution of col 0 (to pool-pad col -1) drops.
    Roll + iota mask rather than slice + concat: the operands here
    carry lane-offset layouts (inherited from the lane-sliced window
    candidates), and tpu.concatenate can't mix those with a fresh
    zero fill."""
    rolled = pltpu.roll(a, a.shape[1] - 1, axis=1)   # = roll by -1
    q = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(q >= a.shape[1] - 1, 0.0, rolled)


def _phases(a):
    """[2R, W, c] conv rows -> (even rows 2p, odd rows 2p+1), each
    [R, W, c]. Leading-dim reshape + index: free (untiled dims)."""
    a4 = a.reshape(a.shape[0] // 2, 2, *a.shape[1:])
    return a4[:, 0], a4[:, 1]


def _colmax(z, c):
    """Per conv row, max over a pool window's three column candidates:
    out[:, q] = max(e[q], o[q], o[q-1]). z: [R, W, 2c] -> [R, W, c]."""
    e, o = z[..., :c], z[..., c:]
    return jnp.maximum(jnp.maximum(_shift_w(z)[..., c:], e), o)


def _fwd_kernel(y_ref, p_ref, sc_ref, sh_ref, out_ref, *, c, bpi):
    """Primal-only forward (no argmax plane): what inference graphs
    trace — the idx-emitting variant below runs only under autodiff."""
    g = pl.program_id(0)
    sc = sc_ref[:]
    sh = sh_ref[:]
    z = _bn_relu(y_ref[:], sc, sh)                  # [2RP, W, 2c]
    first = jax.lax.rem(g, bpi) == 0                # image top: pad row
    zp = jnp.where(first, _NEG, _bn_relu(p_ref[:], sc, sh))

    m = _colmax(z, c)                               # [2RP, W, c]
    mp = _colmax(zp, c)                             # prev conv row 2p-1
    me, mo = _phases(m)
    mo_prev = jnp.concatenate([mp, mo[:-1]], axis=0)
    out = jnp.maximum(jnp.maximum(mo_prev, me), mo)
    out_ref[:] = out.astype(out_ref.dtype)


def _fwd_idx_kernel(y_ref, p_ref, sc_ref, sh_ref, out_ref, idx_ref,
                    *, c, bpi):
    g = pl.program_id(0)
    sc = sc_ref[:]
    sh = sh_ref[:]
    z = _bn_relu(y_ref[:], sc, sh)                  # [2RP, W, 2c]
    first = jax.lax.rem(g, bpi) == 0                # image top: pad row
    zp = jnp.where(first, _NEG, _bn_relu(p_ref[:], sc, sh))

    # hierarchical first-max (half the VPU ops of a 9-way scan, same
    # routing decisions): candidate order (k0..k8) is row-major —
    # row groups (prev 2p-1, even 2p, odd 2p+1) each with cols
    # (v, e, o) — so "first row group achieving the window max, then
    # first col achieving it within that group" IS the global
    # first-max. Per conv row: col max + col idx; then a 3-way row
    # pick on the pooled shape.
    e, o = z[..., :c], z[..., c:]
    v = _shift_w(z)[..., c:]                        # col 2q-1 candidate
    mrow = jnp.maximum(jnp.maximum(v, e), o)        # [2RP, W, c]
    cidx = jnp.where(v >= mrow, 0,
                     jnp.where(e >= mrow, 1, 2))
    ep, op = zp[..., :c], zp[..., c:]
    vp = _shift_w(zp)[..., c:]
    mp = jnp.maximum(jnp.maximum(vp, ep), op)       # prev conv row 2p-1
    cp = jnp.where(vp >= mp, 0, jnp.where(ep >= mp, 1, 2))

    me, mo = _phases(mrow)
    ce, co = _phases(cidx)
    mo_prev = jnp.concatenate([mp, mo[:-1]], axis=0)
    co_prev = jnp.concatenate([cp, co[:-1]], axis=0)
    m = jnp.maximum(jnp.maximum(mo_prev, me), mo)
    idx = jnp.where(mo_prev >= m, co_prev,
                    jnp.where(me >= m, 3 + ce, 6 + co))
    # sentinel 9 when the post-ReLU max is 0: the ReLU kills every
    # gradient in the window (see _bwd_kernel)
    idx = jnp.where(m > 0.0, idx, 9)
    out_ref[:] = m.astype(out_ref.dtype)
    idx_ref[:] = idx.astype(jnp.int8)


def _bwd_kernel(idx_ref, nidx_ref, g_ref, gn_ref, sc_ref, dy_ref,
                *, c, bpi):
    """Pure index routing: dy = scatter of the pooled cotangent to its
    window's stored first-max candidate, times the BN scale. Candidate
    order (k0..k8) and the layout algebra match the forward:
    k4/k7 -> even cols of conv rows 2p/2p+1; k5/k8 -> odd cols;
    k3/k6 -> odd cols one packed column LEFT (the 2q-1 candidates);
    k0..k2 live on conv row 2p-1 = the PREVIOUS pooled row's odd conv
    row, so they arrive via the next pooled row's picks (shift_up)."""
    g = pl.program_id(0)
    idx = idx_ref[:].astype(jnp.int32)              # [RP, W, c]
    gq = g_ref[:].astype(jnp.float32)
    last = jax.lax.rem(g + 1, bpi) == 0             # next row = new image
    nidx = nidx_ref[:].astype(jnp.int32)            # [1, W, c]
    gn = jnp.where(last, 0.0, gn_ref[:].astype(jnp.float32))

    def r(k):
        return jnp.where(idx == k, gq, 0.0)

    def rn(k):
        return jnp.where(nidx == k, gn, 0.0)

    def shift_up(a, fill):                          # a[p] -> a[p+1]
        return jnp.concatenate([a[1:], fill], axis=0)

    de0 = r(4)
    de1 = r(7) + shift_up(r(1), rn(1))
    do0 = _unshift_w(r(3)) + r(5)
    do1 = (_unshift_w(r(6)) + r(8)
           + shift_up(_unshift_w(r(0)) + r(2), _unshift_w(rn(0)) + rn(2)))

    def interleave(a0, a1):                         # phases -> conv rows
        return jnp.stack([a0, a1], axis=1).reshape(
            2 * a0.shape[0], *a0.shape[1:])

    sc = sc_ref[:]
    dy = jnp.concatenate([interleave(de0, de1) * sc[..., :c],
                          interleave(do0, do1) * sc[..., c:]], axis=-1)
    dy_ref[:] = dy.astype(dy_ref.dtype)


def _pick_rp(hp, cap=16):
    # pooled rows per block; any divisor works (blocks stride the
    # untiled leading dim), larger amortizes grid overhead
    for rp in (16, 8, 4):
        if rp <= cap and hp % rp == 0:
            return rp
    return None


def _prev_rows(y3, rows_per_block):
    """S with S[g] = y3[g*rows_per_block - 1] (the conv row just above
    block g; S[0] is a dummy — kernels mask the first block of each
    image)."""
    r = rows_per_block
    return jnp.concatenate([y3[:1], y3[r - 1::r][:-1]], axis=0)


def _next_grad(gq3, rp):
    """S with S[g] = gq3[(g+1)*rp] (first pooled-grad row of block g+1;
    last entry dummy, masked)."""
    f = gq3.reshape(-1, rp, *gq3.shape[1:])[:, 0]
    return jnp.concatenate([f[1:], f[:1]], axis=0)


@functools.lru_cache(maxsize=None)
def _build(rows, hp, wp, chans, dtype_name, interpret):
    """custom-VJP pooled = maxpool3x3s2(relu(bn(col-interleave(y))))
    over merged-layout conv rows. rows = B*Hc (conv rows); y3 is
    [rows, wp, 2*chans], pooled [rows/2, wp, chans]."""
    # plain fwd fits 16 pooled rows/block in scoped VMEM (A/B on chip:
    # fwd at rp=8 is 0.4 ms/step slower than rp=16); the idx-emitting
    # variant's extra live set (col-idx planes) overflows 16M scoped
    # VMEM at 16 (by ~0.8M, measured) so it runs at 8; the
    # index-routing backward's live set is tiny, 16 works
    rp = _pick_rp(hp)
    rpi = _pick_rp(hp, cap=8)
    rpb = _pick_rp(hp)
    dtype = jnp.dtype(dtype_name)
    c2 = 2 * chans

    def blk_spec(r, width):
        return pl.BlockSpec((r, wp, width), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec():
        return pl.BlockSpec((1, 1, c2), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    fwd_k = functools.partial(_fwd_kernel, c=chans, bpi=hp // rp)
    fwd_idx_k = functools.partial(_fwd_idx_kernel, c=chans, bpi=hp // rpi)
    bwd_k = functools.partial(_bwd_kernel, c=chans, bpi=hp // rpb)

    def run_fwd(y3, sc3, sh3):
        return pl.pallas_call(
            fwd_k, grid=(rows // (2 * rp),),
            in_specs=[blk_spec(2 * rp, c2), blk_spec(1, c2),
                      tile_spec(), tile_spec()],
            out_specs=blk_spec(rp, chans),
            out_shape=jax.ShapeDtypeStruct((rows // 2, wp, chans), dtype),
            interpret=interpret,
        )(y3, _prev_rows(y3, 2 * rp), sc3, sh3)

    def run_fwd_idx(y3, sc3, sh3):
        return pl.pallas_call(
            fwd_idx_k, grid=(rows // (2 * rpi),),
            in_specs=[blk_spec(2 * rpi, c2), blk_spec(1, c2),
                      tile_spec(), tile_spec()],
            out_specs=[blk_spec(rpi, chans), blk_spec(rpi, chans)],
            out_shape=[
                jax.ShapeDtypeStruct((rows // 2, wp, chans), dtype),
                jax.ShapeDtypeStruct((rows // 2, wp, chans), jnp.int8)],
            interpret=interpret,
        )(y3, _prev_rows(y3, 2 * rpi), sc3, sh3)

    def run_bwd(idx3, sc3, gq3):
        return pl.pallas_call(
            bwd_k, grid=(rows // (2 * rpb),),
            in_specs=[blk_spec(rpb, chans), blk_spec(1, chans),
                      blk_spec(rpb, chans), blk_spec(1, chans),
                      tile_spec()],
            out_specs=blk_spec(2 * rpb, c2),
            out_shape=jax.ShapeDtypeStruct((rows, wp, c2), dtype),
            interpret=interpret,
        )(idx3, _next_grad(idx3, rpb), gq3, _next_grad(gq3, rpb), sc3)

    @jax.custom_vjp
    def pool2d(y3, sc3, sh3):
        return run_fwd(y3, sc3, sh3)

    def fwd(y3, sc3, sh3):
        out, idx3 = run_fwd_idx(y3, sc3, sh3)
        return out, (idx3, sc3, sh3)

    def bwd(res, gq3):
        idx3, sc3, sh3 = res
        dy = run_bwd(idx3, sc3, gq3)
        return dy, jnp.zeros_like(sc3), jnp.zeros_like(sh3)

    pool2d.defvjp(fwd, bwd)
    return pool2d


def _twin(y, scale, shift, out_dtype):
    """jnp reference: interleave the column phases, BN+ReLU in fp32,
    3x3/s2/pad-1 max pool. Grad flows by plain autodiff (XLA
    select-and-scatter — same first-max routing as the kernel)."""
    b, hc, wp, c2 = y.shape
    c = c2 // 2
    z = jnp.maximum(y.astype(jnp.float32) * jnp.tile(scale, 2)
                    + jnp.tile(shift, 2), 0.0)
    z = jnp.stack([z[..., :c], z[..., c:]], axis=3).reshape(
        b, hc, 2 * wp, c)
    pooled = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pooled.astype(out_dtype)


def fused_bn_relu_pool(y, scale, shift, mesh=None, interpret=False,
                       force_pallas=False):
    """pooled [B, Hp, Wp, C] from the merged-phase stem conv output.

    y: [B, Hc, Wp, 2C] — the stride-2 stem conv with output columns
    de-interleaved into channels [even C | odd C] (Hc = 2*Hp conv rows;
    Wc = 2*Wp conv cols), as emitted by merged_phase_conv.
    scale, shift: [C] folded BN affine (f32).
    mesh: >1-device mesh -> kernel runs under shard_map over the batch
    (pallas_call is opaque to GSPMD; same pattern as the fused loss).
    """
    b, hc, wp, c2 = y.shape
    c = c2 // 2
    hp = hc // 2
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    if (not (on_tpu or force_pallas or interpret)
            or _pick_rp(hp) is None):
        return _twin(y, scale, shift, y.dtype)

    sc3 = jnp.tile(scale.astype(jnp.float32), 2).reshape(1, 1, c2)
    sh3 = jnp.tile(shift.astype(jnp.float32), 2).reshape(1, 1, c2)

    def flat_call(y4):
        rows = y4.shape[0] * hc
        fn = _build(rows, hp, wp, c, jnp.dtype(y4.dtype).name,
                    bool(interpret))
        out3 = fn(y4.reshape(rows, wp, c2), sc3, sh3)
        return out3.reshape(y4.shape[0], hp, wp, c)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        return jax.shard_map(flat_call, mesh=mesh,
                             in_specs=P(axis),
                             out_specs=P(axis), check_vma=False)(y)
    return flat_call(y)
