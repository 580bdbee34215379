#!/usr/bin/env python3
"""Per-stage roofline attribution for a jax.profiler TPU trace.

Usage:
    python extras/roofline.py <logdir> [--steps N] [--size 832] [--md]

<logdir> is a directory passed to ``jax.profiler.trace`` (the newest
``*.trace.json.gz`` under ``plugins/profile`` is read).  Device ops are
bucketed into pipeline stages keyed on the feature-map extents in each
op's ``long_name`` (for a detector trained at ``--size S`` the stages
are the S/2 .. S/128 maps, plus loss/optimizer buckets), and each
stage reports:

    ms/step     device time
    GB/s        achieved HBM bandwidth (XLA's own bytes_accessed)
    TFLOP/s     achieved compute (XLA's model_flops)
    bound       which roofline wall the stage sits against, as a
                fraction of the v5e peaks (197 bf16 TFLOP/s, 819 GB/s)

An op pinned at ~100% of one wall is at speed-of-light; a stage far
from both walls is latency/overhead-bound (many small dispatches).
This is the measurement half of the roofline table in PARITY.md; the
reference keeps this in nvprof, outside the repo.
"""
import argparse
import glob
import gzip
import json
import re
from collections import defaultdict

PEAK_TFLOPS = 197.0      # v5e bf16 MXU peak
PEAK_GBS = 819.0         # v5e HBM bandwidth


def make_stager(size, classes=80, anchors=9, rotated=False):
    """Stage classifier for a trace of THIS detector family.

    Head channel signatures are derived from classes/anchors/rotated
    (cls head = classes*A, box head = {4|6}*A) instead of hardcoding the
    ResNet50FPN@80 values; ops matching nothing land in 'other', whose
    share is reported so misattribution stays visible."""
    s2, s4 = size // 2, size // 4
    s8, s16, s32 = size // 8, size // 16, size // 32
    s64, s128 = -(-size // 64), -(-size // 128)    # ceil: P6/P7 pad up
    hw = s8 * s8 + s16 * s16 + s32 * s32 + s64 * s64 + s128 * s128
    cls_ch = classes * anchors
    box_ch = (6 if rotated else 4) * anchors

    def pair(a, b, s):
        # anchored: '208,104' must be a full dim pair ([...208,104,...] or
        # [...,208,104]), not a substring of e.g. [8,208,1040,...]
        return re.search(rf'[\[,]{a},{b}[,\]]', s) is not None

    def stage(name, ln):
        s = name + ' ' + ln
        if 'jvp' in name or str(hw) in s:
            return 'loss/assign'
        if pair(size, size, s):
            return f'input({size})'
        if pair(s2, s2, s) or pair(s2, s4, s):
            # s2,s4: merged-phase stem layout [B, H/2, W/4, 2C]
            return f'stem({s2})'
        if pair(s4, s4, s) or pair(s4, s8, s):
            # s4,s8: width-pair-packed layer1 [B, H/4, W/8, 2C]
            # (wpack auto policy packs layer1 in train graphs)
            return f'layer1({s4})'
        if f'{s8},{s8},256]' in s or f'{s8},{s8},{cls_ch}' in s \
                or f'{s8},{s8},{box_ch}' in s:
            return f'p3/heads({s8})'
        if pair(s8, s8, s):
            return f'layer2({s8})'
        if pair(s16, s16, s):
            return f'layer3/p4({s16})'
        if pair(s32, s32, s):
            return f'layer4/p5({s32})'
        if pair(s64, s64, s) or pair(s128, s128, s):
            return f'p6/p7({s64}/{s128})'
        if re.match(r'^%?(multiply_add_fusion|copy_add_fusion)', name) or \
                (re.search(r'=\s*\(f32\[', ln)
                 and not re.search(r'\[\d+,\d{3,}', ln)):
            return 'weights/opt'
        return 'other'

    return stage


def load_events(logdir):
    files = glob.glob(logdir + '/plugins/profile/*/*.trace.json.gz')
    if not files:
        raise SystemExit(f'no trace under {logdir}/plugins/profile')
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace['traceEvents']
    names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            names[e['pid']] = e['args'].get('name', '')
    device_pids = {pid for pid, n in names.items()
                   if 'TPU' in n or 'device' in n.lower()}
    return events, device_pids


def collect(events, device_pids, stage_of):
    st = defaultdict(lambda: [0.0, 0.0, 0.0])     # ms, bytes, flops
    ops = defaultdict(lambda: [0.0, 0.0, 0.0, ''])
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        if name.startswith('jit_') or name.isdigit():
            continue
        a = e.get('args', {})
        dur = e.get('dur', 0) / 1e3
        ln = str(a.get('long_name', ''))
        s = stage_of(name, ln)
        nb = float(a.get('bytes_accessed', 0) or 0)
        fl = float(a.get('model_flops', 0) or 0)
        for rec in (st[s], ops[(s, name)]):
            rec[0] += dur
            rec[1] += nb
            rec[2] += fl
        ops[(s, name)][3] = a.get('source', '')
        total += dur
    return st, ops, total


def rates(ms, nb, fl):
    gbs = nb / 1e9 / (ms / 1e3) if ms else 0.0
    tfs = fl / 1e12 / (ms / 1e3) if ms else 0.0
    return gbs, tfs


def bound_str(gbs, tfs):
    bw, cp = gbs / PEAK_GBS, tfs / PEAK_TFLOPS
    if max(bw, cp) < 0.25:
        return f'overhead ({100 * max(bw, cp):.0f}%)'
    if bw >= cp:
        return f'HBM {100 * bw:.0f}%'
    return f'MXU {100 * cp:.0f}%'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('logdir')
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--size', type=int, default=832)
    ap.add_argument('--classes', type=int, default=80,
                    help='detector classes (derives cls-head channels)')
    ap.add_argument('--anchors', type=int, default=9,
                    help='anchors per cell (9 axis, 27 rotated default)')
    ap.add_argument('--rotated', action='store_true',
                    help='6-channel box head (rotated detector)')
    ap.add_argument('--md', action='store_true')
    ap.add_argument('--top', type=int, default=8)
    args = ap.parse_args()

    events, device_pids = load_events(args.logdir)
    st, ops, total = collect(events, device_pids,
                             make_stager(args.size, args.classes,
                                         args.anchors, args.rotated))
    k = args.steps
    rows = sorted(st.items(), key=lambda kv: -kv[1][0])
    other_pct = 100 * st['other'][0] / total if total else 0.0
    if other_pct > 10:
        import sys
        print(f"WARNING: {other_pct:.1f}% of device time fell in 'other' "
              "— check --size/--classes/--anchors match the trace",
              file=sys.stderr)

    tot_b = sum(v[1] for v in st.values())
    tot_f = sum(v[2] for v in st.values())
    g_all, t_all = rates(total, tot_b, tot_f)
    if args.md:
        print('| stage | ms/step | % | GB/s | TFLOP/s | bound |')
        print('|---|---|---|---|---|---|')
        for s, (ms, nb, fl) in rows:
            gbs, tfs = rates(ms, nb, fl)
            print(f'| {s} | {ms / k:.2f} | {100 * ms / total:.1f}% '
                  f'| {gbs:.0f} | {tfs:.1f} | {bound_str(gbs, tfs)} |')
        print(f'| **total** | **{total / k:.2f}** | | {g_all:.0f} '
              f'| {t_all:.1f} | {bound_str(g_all, t_all)} |')
        return

    print(f'total {total / k:.2f} ms/step  {g_all:.0f} GB/s  '
          f'{t_all:.1f} TFLOP/s  [{bound_str(g_all, t_all)}]')
    for s, (ms, nb, fl) in rows:
        gbs, tfs = rates(ms, nb, fl)
        print(f'{ms / k:8.3f}  {100 * ms / total:5.1f}%  {gbs:6.0f} GB/s '
              f'{tfs:6.1f} TF/s  [{bound_str(gbs, tfs):>13}]  {s}')
    print()
    for s in [x for x, _ in rows[:6]]:
        print(f'--- {s}')
        items = sorted(((n, v) for (s2, n), v in ops.items() if s2 == s),
                       key=lambda kv: -kv[1][0])[:args.top]
        for n, (ms, nb, fl, src) in items:
            gbs, tfs = rates(ms, nb, fl)
            srcs = src.split('/')[-1] if src else ''
            print(f'  {ms / k:8.3f}  {gbs:6.0f} GB/s {tfs:6.1f} TF/s  '
                  f'{n[:48]:48s} {srcs}')


if __name__ == '__main__':
    main()
