"""Fused BN+ReLU+maxpool(3x3/s2) over the ResNet stem — Pallas TPU.

The reference stem (conv1 7x7/s2 -> BN -> ReLU -> maxpool 3x3/s2,
torchvision resnet via odtk/backbones/resnet.py:7-39) does ~0.26 ms of
FLOPs at b=8 @832 on v5e but cost ~8.6 ms through XLA: the
[B,416,416,64] activation is materialized by a dual-output BN+ReLU
fusion (3.6 ms), re-read by the pool, routed back by a
select-and-scatter pool backward (1.4 ms), and bracketed by layout
copies. This kernel consumes the stem conv's output in its PHASE-SPLIT
form (even/odd output columns from the space-to-depth phase convs,
backbones/layers.py) and emits the pooled [B,208,208,64] map directly:
the post-BN/ReLU activation never exists in HBM, forward or backward.

Geometry: with conv rows split into (pooled row, phase) pairs and conv
columns split into even/odd tensors, every pool window is reachable
with lane rolls (columns) and one-row sublane shifts (rows):

    pooled[p, q] = max over conv rows {2p-1, 2p, 2p+1}
                       x cols {2q-1, 2q, 2q+1} of relu(y*scale+shift)
    row 2p-1 = phase 1 of pooled row p-1   (sublane shift)
    col 2q-1 = odd-col tensor, column q-1  (lane roll by C)

Cross-block boundary rows (the previous pooled row's phase-1 line, and
in the backward the next window's inputs) are fetched with explicit
HBM->VMEM `make_async_copy` DMAs — Mosaic block specs can't express
single-row overlapping windows (sublane blocks must be 8-aligned).

The backward kernel recomputes the window candidates (cheaper than
storing them: the op is bandwidth-bound), routes each pooled cotangent
to the FIRST maximum in row-major window order (XLA select-and-scatter
/ torch semantics), folds the ReLU mask and BN scale, and writes the
phase-conv cotangents — so the whole stem backward is two small weight-
gradient convolutions plus this one pass.

Inputs are 2-D row-pair views ([B*208 rows, 2*208*64 lanes] — free
bitcasts of the conv outputs), so lanes are fully packed (the XLA ops
on [.., 64]-channel stem tensors waste half of every 128-wide lane
tile, one reason the XLA stem runs ~20x off roofline).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38     # python float: jnp scalars would be captured consts


def _bn_relu(y, sc, sh):
    return jnp.maximum(y.astype(jnp.float32) * sc + sh, 0.0)


def _roll_prev_col(x, c):
    """out[:, q] = x[:, q-1] (64-lane column groups), col 0 = -inf
    (pool pad)."""
    rolled = pltpu.roll(x, c, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < c, _NEG, rolled)


def _unroll_col(x, c):
    """Inverse routing of _roll_prev_col for gradients: contribution
    computed at col q belongs at col q-1; out[:, q] = x[:, q+1],
    contribution of col 0 (to pool-pad col -1) is dropped."""
    rolled = pltpu.roll(x, x.shape[1] - c, axis=1)   # = roll by -c
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= x.shape[1] - c, 0.0, rolled)


def _fwd_kernel(ye_ref, yo_ref, yef_ref, yof_ref, sc_ref, sh_ref, out_ref,
                pe_scr, po_scr, sems, *, rp, l, c, bpi, rows):
    g = pl.program_id(0)
    # HBM slices must be 8-sublane aligned; rp % 8 == 0, so the row we
    # need (g*rp - 1) is always the LAST row of the aligned 8-row group
    # starting at g*rp - 8 — copy the group, take row 7 statically.
    # (written as 8*k so Mosaic can PROVE the 8-divisibility)
    prev = 8 * jnp.maximum(g * (rp // 8) - 1, 0)
    cpe = pltpu.make_async_copy(yef_ref.at[pl.ds(prev, 8), :], pe_scr,
                                sems.at[0])
    cpo = pltpu.make_async_copy(yof_ref.at[pl.ds(prev, 8), :], po_scr,
                                sems.at[1])
    cpe.start()
    cpo.start()

    sc = sc_ref[:]
    sh = sh_ref[:]
    ze = _bn_relu(ye_ref[:], sc, sh)               # [RP, 2L]
    zo = _bn_relu(yo_ref[:], sc, sh)
    first = jax.lax.rem(g, bpi) == 0               # image top: pad row
    cpe.wait()
    cpo.wait()
    pe = jnp.where(first, _NEG, _bn_relu(pe_scr[7:8], sc, sh)[:, l:])
    po = jnp.where(first, _NEG, _bn_relu(po_scr[7:8], sc, sh)[:, l:])

    ze0, ze1 = ze[:, :l], ze[:, l:]
    zo0, zo1 = zo[:, :l], zo[:, l:]
    ze1s = jnp.concatenate([pe, ze1[:-1]], axis=0)  # phase-1 of row p-1
    zo1s = jnp.concatenate([po, zo1[:-1]], axis=0)

    erow = jnp.maximum(jnp.maximum(ze1s, ze0), ze1)  # even-col row max
    orow = jnp.maximum(jnp.maximum(zo1s, zo0), zo1)  # odd-col row max
    out = jnp.maximum(jnp.maximum(_roll_prev_col(orow, c), erow), orow)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(ye_ref, yo_ref, yef_ref, yof_ref, g_ref, gf_ref,
                sc_ref, sh_ref, dye_ref, dyo_ref,
                pe_scr, po_scr, ne_scr, no_scr, gn_scr, sems,
                *, rp, l, c, bpi, rows):
    g = pl.program_id(0)
    # aligned-group DMAs (see _fwd_kernel): prev row = group row 7,
    # next rows = group row 0 (8*k form proves divisibility to Mosaic)
    prev = 8 * jnp.maximum(g * (rp // 8) - 1, 0)
    nxt = 8 * jnp.minimum((g + 1) * (rp // 8), rows // 8 - 1)
    copies = (
        pltpu.make_async_copy(yef_ref.at[pl.ds(prev, 8), :], pe_scr,
                              sems.at[0]),
        pltpu.make_async_copy(yof_ref.at[pl.ds(prev, 8), :], po_scr,
                              sems.at[1]),
        pltpu.make_async_copy(yef_ref.at[pl.ds(nxt, 8), :], ne_scr,
                              sems.at[2]),
        pltpu.make_async_copy(yof_ref.at[pl.ds(nxt, 8), :], no_scr,
                              sems.at[3]),
        pltpu.make_async_copy(gf_ref.at[pl.ds(nxt, 8), :], gn_scr,
                              sems.at[4]),
    )
    for cp in copies:
        cp.start()

    sc = sc_ref[:]
    sh = sh_ref[:]
    ze = _bn_relu(ye_ref[:], sc, sh)
    zo = _bn_relu(yo_ref[:], sc, sh)
    first = jax.lax.rem(g, bpi) == 0
    for cp in copies:
        cp.wait()
    pe = jnp.where(first, _NEG, _bn_relu(pe_scr[7:8], sc, sh)[:, l:])
    po = jnp.where(first, _NEG, _bn_relu(po_scr[7:8], sc, sh)[:, l:])
    ze0, ze1 = ze[:, :l], ze[:, l:]
    zo0, zo1 = zo[:, :l], zo[:, l:]
    ze1s = jnp.concatenate([pe, ze1[:-1]], axis=0)
    zo1s = jnp.concatenate([po, zo1[:-1]], axis=0)

    # window candidates, row-major order (first-max wins the gradient)
    cands = (_roll_prev_col(zo1s, c), ze1s, zo1s,
             _roll_prev_col(zo0, c), ze0, zo0,
             _roll_prev_col(zo1, c), ze1, zo1)
    m = functools.reduce(jnp.maximum, cands)
    gq = g_ref[:].astype(jnp.float32)

    picked = []
    prefix = jnp.full_like(m, _NEG)
    for z_k in cands:
        picked.append(jnp.where((z_k >= m) & (prefix < m), gq, 0.0))
        prefix = jnp.maximum(prefix, z_k)
    (p0, p1, p2, p3, p4, p5, p6, p7, p8) = picked

    # next image-row's window (its row-2p-1 candidates are OUR last
    # phase-1 row); compute its first-max choice for k0..k2 only
    last = jax.lax.rem(g + 1, bpi) == 0             # next row = new image
    zen = jnp.where(last, _NEG, _bn_relu(ne_scr[0:1], sc, sh))
    zon = jnp.where(last, _NEG, _bn_relu(no_scr[0:1], sc, sh))
    ncands = (_roll_prev_col(zo1[-1:], c), ze1[-1:], zo1[-1:],
              _roll_prev_col(zon[:, :l], c), zen[:, :l], zon[:, :l],
              _roll_prev_col(zon[:, l:], c), zen[:, l:], zon[:, l:])
    mn = functools.reduce(jnp.maximum, ncands)
    gn = jnp.where(last, 0.0, gn_scr[0:1].astype(jnp.float32))
    npick = []
    prefix = jnp.full_like(mn, _NEG)
    for z_k in ncands[:3]:
        npick.append(jnp.where((z_k >= mn) & (prefix < mn), gn, 0.0))
        prefix = jnp.maximum(prefix, z_k)
    n0, n1, n2 = npick

    def shift_up(a, fill):
        return jnp.concatenate([a[1:], fill], axis=0)

    dze0 = p4
    dze1 = p7 + shift_up(p1, n1)
    dzo0 = _unroll_col(p3, c) + p5
    dzo1 = (_unroll_col(p6, c) + p8
            + shift_up(_unroll_col(p0, c) + p2,
                       _unroll_col(n0, c) + n2))

    sc0, sc1 = sc[:, :l], sc[:, l:]
    dye = jnp.concatenate([dze0 * (ze0 > 0.0) * sc0,
                           dze1 * (ze1 > 0.0) * sc1], axis=1)
    dyo = jnp.concatenate([dzo0 * (zo0 > 0.0) * sc0,
                           dzo1 * (zo1 > 0.0) * sc1], axis=1)
    dye_ref[:] = dye.astype(dye_ref.dtype)
    dyo_ref[:] = dyo.astype(dyo_ref.dtype)


def _pick_rp(hp, cap=16):
    # must be a multiple of 8: the boundary-row DMAs rely on g*rp being
    # 8-aligned (HBM slice granularity); canvas heights are padded to
    # the model stride, so Hp = H/4 is always a multiple of 8
    for rp in (16, 8):
        if rp <= cap and hp % rp == 0:
            return rp
    return None


@functools.lru_cache(maxsize=None)
def _build(rows, hp, wp, chans, dtype_name, interpret):
    """custom-VJP pooled = maxpool3x3s2(relu(bn(interleave(ye, yo))))
    over 2-D row-pair views. rows = B*Hp; lanes 2L = 2*Wp*C."""
    # fwd fits 16 rows/block in scoped VMEM; the backward's live set
    # (9 window candidates + routing masks) needs 8-row blocks
    rp = _pick_rp(hp)
    rpb = _pick_rp(hp, cap=8)
    bpi = hp // rp
    grid = rows // rp
    l = wp * chans
    dtype = jnp.dtype(dtype_name)

    def row_spec(width, r=None):
        r = rp if r is None else r
        return pl.BlockSpec((r, width), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    def any_spec():
        # explicit HBM (not ANY): the compiler would happily place the
        # whole aliased operand in VMEM, where 1-row DMA slices must be
        # 8-sublane aligned; HBM refs slice at row granularity
        return pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)

    def tile_spec(width):
        return pl.BlockSpec((1, width), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)

    fwd_k = functools.partial(_fwd_kernel, rp=rp, l=l, c=chans, bpi=bpi,
                              rows=rows)
    bwd_k = functools.partial(_bwd_kernel, rp=rpb, l=l, c=chans,
                              bpi=hp // rpb, rows=rows)

    def run_fwd(ye2, yo2, sc2, sh2):
        return pl.pallas_call(
            fwd_k, grid=(grid,),
            in_specs=[row_spec(2 * l), row_spec(2 * l),
                      any_spec(), any_spec(),
                      tile_spec(2 * l), tile_spec(2 * l)],
            out_specs=row_spec(l),
            out_shape=jax.ShapeDtypeStruct((rows, l), dtype),
            scratch_shapes=[pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.SemaphoreType.DMA((2,))],
            interpret=interpret,
        )(ye2, yo2, ye2, yo2, sc2, sh2)

    def run_bwd(ye2, yo2, sc2, sh2, gq):
        return pl.pallas_call(
            bwd_k, grid=(rows // rpb,),
            in_specs=[row_spec(2 * l, rpb), row_spec(2 * l, rpb),
                      any_spec(), any_spec(),
                      row_spec(l, rpb), any_spec(),
                      tile_spec(2 * l), tile_spec(2 * l)],
            out_specs=[row_spec(2 * l, rpb), row_spec(2 * l, rpb)],
            out_shape=[jax.ShapeDtypeStruct((rows, 2 * l), dtype),
                       jax.ShapeDtypeStruct((rows, 2 * l), dtype)],
            scratch_shapes=[pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.VMEM((8, 2 * l), dtype),
                            pltpu.VMEM((8, l), gq.dtype),
                            pltpu.SemaphoreType.DMA((5,))],
            interpret=interpret,
        )(ye2, yo2, ye2, yo2, gq, gq, sc2, sh2)

    @jax.custom_vjp
    def pool2d(ye2, yo2, sc2, sh2):
        return run_fwd(ye2, yo2, sc2, sh2)

    def fwd(ye2, yo2, sc2, sh2):
        return run_fwd(ye2, yo2, sc2, sh2), (ye2, yo2, sc2, sh2)

    def bwd(res, gq):
        ye2, yo2, sc2, sh2 = res
        dye, dyo = run_bwd(ye2, yo2, sc2, sh2, gq)
        return dye, dyo, jnp.zeros_like(sc2), jnp.zeros_like(sh2)

    pool2d.defvjp(fwd, bwd)
    return pool2d


def _twin(ye, yo, scale, shift, out_dtype):
    """jnp reference: interleave the column phases, BN+ReLU in fp32,
    3x3/s2/pad-1 max pool. Grad flows by plain autodiff (XLA
    select-and-scatter — same first-max routing as the kernel)."""
    b, hc, wp, c = ye.shape
    z_e = jnp.maximum(ye.astype(jnp.float32) * scale + shift, 0.0)
    z_o = jnp.maximum(yo.astype(jnp.float32) * scale + shift, 0.0)
    z = jnp.stack([z_e, z_o], axis=3).reshape(b, hc, 2 * wp, c)
    pooled = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pooled.astype(out_dtype)


def fused_bn_relu_pool(ye, yo, scale, shift, mesh=None, interpret=False,
                       force_pallas=False):
    """pooled [B, Hp, Wp, C] from phase-split stem conv outputs.

    ye, yo: [B, 2*Hp, Wp, C] — even/odd-column phases of the stride-2
    stem conv (Hc = 2*Hp conv rows; Wc = 2*Wp conv cols).
    scale, shift: [C] folded BN affine (f32).
    mesh: >1-device mesh -> kernel runs under shard_map over the batch
    (pallas_call is opaque to GSPMD; same pattern as the fused loss).
    """
    b, hc, wp, c = ye.shape
    hp = hc // 2
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    if (not (on_tpu or force_pallas or interpret)
            or _pick_rp(hp) is None):
        return _twin(ye, yo, scale, shift, ye.dtype)

    l = wp * c
    sc2 = jnp.tile(scale.astype(jnp.float32), 2 * wp).reshape(1, 2 * l)
    sh2 = jnp.tile(shift.astype(jnp.float32), 2 * wp).reshape(1, 2 * l)

    def flat_call(ye4, yo4):
        rows = ye4.shape[0] * hp
        fn = _build(rows, hp, wp, c, jnp.dtype(ye4.dtype).name,
                    bool(interpret))
        out2 = fn(ye4.reshape(rows, 2 * l), yo4.reshape(rows, 2 * l),
                  sc2, sh2)
        return out2.reshape(ye4.shape[0], hp, wp, c)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        return jax.shard_map(flat_call, mesh=mesh,
                             in_specs=(P(axis), P(axis)),
                             out_specs=P(axis), check_vma=False)(ye, yo)
    return flat_call(ye, yo)
