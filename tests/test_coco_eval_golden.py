"""Golden pinning for CocoEvaluator against an independent oracle.

pycocotools cannot be installed in this environment, so the evaluator
(odtk_tpu/data/coco_eval.py) is pinned two ways instead:

1. An ORACLE reimplementation below that follows pycocotools'
   cocoeval.py control flow exactly (computeIoU per image/category cut
   at maxDets[-1]; evaluateImg matching ONCE at maxDet=100 per area
   range; accumulate applying maxDets 1/10/100 by per-image truncation
   and a global mergesort; 101-point interpolated precision).  It is
   structurally different from the production evaluator, which
   re-matches per maxDet and fuses accumulate into the category loop —
   agreement on randomized data pins the protocol, not the code.
2. A committed golden fixture (tests/fixtures/coco_eval_golden.json)
   holding the 12 bbox and 12 segm stats for the deterministic
   20-image / 3-class dataset generated here — so any future numeric
   drift in EITHER implementation fails loudly.

Reference anchor: the mAP the reference reports flows through
pycocotools in odtk/infer.py:161-173.
"""

import json
import os

import numpy as np
import pytest

from odtk_tpu.data.coco import CocoIndex
from odtk_tpu.data.coco_eval import CocoEvaluator

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'coco_eval_golden.json')

# --------------------------------------------------------------- oracle
# Follows pycocotools cocoeval.py structure; independent of coco_eval.py.

# np.linspace, NOT [i/100]: pycocotools uses linspace and its values
# differ in ULPs (linspace(0,1,101)[30] == 0.30000000000000004 != 0.3),
# which flips searchsorted at exact-rational recall points
_THRS = list(np.linspace(0.5, 0.95, 10))
_RECS = list(np.linspace(0.0, 1.0, 101))
_AREAS = [(0.0, 1e10), (0.0, 1024.0), (1024.0, 9216.0), (9216.0, 1e10)]
_MAXD = [1, 10, 100]


def _iou_bbox(dt, gt, crowd):
    out = [[0.0] * len(gt) for _ in dt]
    for i, d in enumerate(dt):
        dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
        da = d[2] * d[3]
        for j, g in enumerate(gt):
            gx2, gy2 = g[0] + g[2], g[1] + g[3]
            iw = min(dx2, gx2) - max(dx1, g[0])
            ih = min(dy2, gy2) - max(dy1, g[1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            u = da if crowd[j] else da + g[2] * g[3] - inter
            out[i][j] = inter / u if u > 0 else 0.0
    return out


def _ccw(pts):
    s = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        s += x1 * y2 - x2 * y1
    return pts if s >= 0 else pts[::-1]


def _parea(pts):
    s = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def _clip_convex(P, Q):
    """Intersection of convex polygons via cross-product inside tests
    (vs the production clipper's precomputed line coefficients)."""
    P, Q = _ccw(P), _ccw(Q)
    out = list(P)
    for k in range(len(Q)):
        ax, ay = Q[k]
        bx, by = Q[(k + 1) % len(Q)]
        src, out = out, []
        if not src:
            return []
        for i in range(len(src)):
            px, py = src[i]
            qx, qy = src[(i + 1) % len(src)]
            pin = (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
            qin = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax) >= 0
            if pin:
                out.append((px, py))
            if pin != qin:
                # segment crosses the edge line: solve for t
                dx, dy = qx - px, qy - py
                den = (bx - ax) * dy - (by - ay) * dx
                if den != 0:
                    t = ((bx - ax) * (ay - py) - (by - ay) * (ax - px)) / den
                    out.append((px + t * dx, py + t * dy))
    return out


def _iou_poly(dt, gt, crowd):
    out = [[0.0] * len(gt) for _ in dt]
    for i, d in enumerate(dt):
        dp = [(d[k], d[k + 1]) for k in range(0, len(d), 2)]
        da = _parea(dp)
        for j, g in enumerate(gt):
            gp = [(g[k], g[k + 1]) for k in range(0, len(g), 2)]
            ix = _clip_convex(dp, gp)
            inter = _parea(ix) if len(ix) > 2 else 0.0
            u = da if crowd[j] else da + _parea(gp) - inter
            out[i][j] = inter / u if u > 0 else 0.0
    return out


def oracle_eval(dataset, detections, iou_type):
    imgs = [im['id'] for im in dataset['images']]
    cats = sorted(c['id'] for c in dataset['categories'])
    gts = {}
    for a in dataset['annotations']:
        gts.setdefault((a['image_id'], a['category_id']), []).append(a)
    dts = {}
    for i, d in enumerate(detections):
        d = dict(d, id=i + 1)
        dts.setdefault((d['image_id'], d['category_id']), []).append(d)

    def gt_area(g):
        return float(g['area'])

    def dt_area(d):
        if iou_type == 'segm':
            p = d['segmentation'][0]
            return _parea([(p[k], p[k + 1]) for k in range(0, len(p), 2)])
        return float(d['bbox'][2] * d['bbox'][3])

    # computeIoU: dt score-sorted (stable), cut at maxDets[-1]
    ious = {}
    for img in imgs:
        for cat in cats:
            dt = dts.get((img, cat), [])
            gt = gts.get((img, cat), [])
            order = sorted(range(len(dt)), key=lambda i: -dt[i]['score'])
            dt = [dt[i] for i in order][:_MAXD[-1]]
            dts[(img, cat)] = dt
            crowd = [int(g.get('iscrowd', 0)) for g in gt]
            if iou_type == 'bbox':
                ious[(img, cat)] = _iou_bbox([d['bbox'] for d in dt],
                                             [g['bbox'] for g in gt], crowd)
            else:
                ious[(img, cat)] = _iou_poly(
                    [d['segmentation'][0] for d in dt],
                    [g['segmentation'][0] for g in gt], crowd)

    # evaluateImg at maxDet = maxDets[-1] per area range
    T = len(_THRS)
    evalimgs = {}
    for img in imgs:
        for cat in cats:
            for ai, rng in enumerate(_AREAS):
                dt = dts.get((img, cat), [])
                gt = gts.get((img, cat), [])
                if not dt and not gt:
                    evalimgs[(img, cat, ai)] = None
                    continue
                gig = [1 if (g.get('iscrowd', 0) or gt_area(g) < rng[0]
                             or gt_area(g) > rng[1]) else 0 for g in gt]
                gorder = sorted(range(len(gt)), key=lambda i: gig[i])
                gt_s = [gt[i] for i in gorder]
                gig = [gig[i] for i in gorder]
                crowd = [int(g.get('iscrowd', 0)) for g in gt_s]
                iou = ious[(img, cat)]
                iou = [[row[i] for i in gorder] for row in iou]
                D, G = len(dt), len(gt_s)
                dtm = [[0] * D for _ in range(T)]
                gtm = [[0] * G for _ in range(T)]
                dig = [[0] * D for _ in range(T)]
                for ti, t in enumerate(_THRS):
                    for di in range(D):
                        best = min(t, 1 - 1e-10)
                        m = -1
                        for gi in range(G):
                            if gtm[ti][gi] > 0 and not crowd[gi]:
                                continue
                            if m > -1 and gig[m] == 0 and gig[gi] == 1:
                                break
                            if iou[di][gi] < best:
                                continue
                            best = iou[di][gi]
                            m = gi
                        if m == -1:
                            continue
                        dig[ti][di] = gig[m]
                        dtm[ti][di] = m + 1
                        gtm[ti][m] = di + 1
                aout = [dt_area(d) < rng[0] or dt_area(d) > rng[1]
                        for d in dt]
                for ti in range(T):
                    for di in range(D):
                        if dtm[ti][di] == 0 and aout[di]:
                            dig[ti][di] = 1
                evalimgs[(img, cat, ai)] = {
                    'dtm': dtm, 'dig': dig, 'gig': gig,
                    'scores': [d['score'] for d in dt]}

    # accumulate
    K, A, M, R = len(cats), len(_AREAS), len(_MAXD), len(_RECS)
    prec = np.full((T, R, K, A, M), -1.0)
    rec = np.full((T, K, A, M), -1.0)
    for ki in range(K):
        for ai in range(A):
            for mi, maxd in enumerate(_MAXD):
                E = [evalimgs[(img, cats[ki], ai)] for img in imgs]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                scores = np.array([s for e in E
                                   for s in e['scores'][:maxd]])
                order = np.argsort(-scores, kind='mergesort')
                # build [T, sumD] matrices in image order, then reorder
                cols_m, cols_i = [], []
                for e in E:
                    d = min(maxd, len(e['scores']))
                    for di in range(d):
                        cols_m.append([e['dtm'][ti][di] for ti in range(T)])
                        cols_i.append([e['dig'][ti][di] for ti in range(T)])
                if cols_m:
                    Mt = np.array(cols_m).T[:, order]
                    Ig = np.array(cols_i).T[:, order].astype(bool)
                else:
                    Mt = np.zeros((T, 0))
                    Ig = np.zeros((T, 0), bool)
                gig = np.array([g for e in E for g in e['gig']])
                npig = int((gig == 0).sum())
                if npig == 0:
                    continue
                tp = np.cumsum((Mt > 0) & ~Ig, axis=1, dtype=np.float64)
                fp = np.cumsum((Mt == 0) & ~Ig, axis=1, dtype=np.float64)
                for ti in range(T):
                    nd = tp.shape[1]
                    rc = tp[ti] / npig
                    pr = tp[ti] / (tp[ti] + fp[ti] + np.spacing(1))
                    rec[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    pr = pr.tolist()
                    q = [0.0] * R
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, _RECS, side='left')
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    prec[ti, :, ki, ai, mi] = q

    def _ap(iou=None, ai=0, mi=2):
        p = prec[:, :, :, ai, mi]
        if iou is not None:
            p = p[[_THRS.index(iou)]]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def _ar(ai=0, mi=2):
        r = rec[:, :, ai, mi]
        r = r[r > -1]
        return float(r.mean()) if r.size else -1.0

    return np.array([
        _ap(), _ap(iou=0.5), _ap(iou=0.75), _ap(ai=1), _ap(ai=2),
        _ap(ai=3), _ar(mi=0), _ar(mi=1), _ar(mi=2), _ar(ai=1),
        _ar(ai=2), _ar(ai=3)])


# -------------------------------------------------------------- fixture

def _rot_rect(cx, cy, w, h, theta):
    c, s = np.cos(theta), np.sin(theta)
    pts = []
    for dx, dy in ((-w / 2, -h / 2), (w / 2, -h / 2),
                   (w / 2, h / 2), (-w / 2, h / 2)):
        pts += [cx + dx * c - dy * s, cy + dx * s + dy * c]
    return [round(float(v), 4) for v in pts]


def make_fixture(seed=7, n_images=20, n_cats=3):
    """Deterministic randomized dataset + detections, bbox and segm.

    Covers: crowd gts, all three area bands (incl. one box at exactly
    32x32 to freeze the inclusive-boundary rule), per-image det counts
    crossing the 1/10 maxDets cuts, false positives, duplicate dets,
    category confusion, images with no gts and images with no dets.
    """
    rng = np.random.RandomState(seed)
    images = [{'id': i + 1} for i in range(n_images)]
    cats = [{'id': c + 1} for c in range(n_cats)]
    anns, dets = [], []
    aid = 0
    for img in range(1, n_images + 1):
        if img == n_images:          # image with gts but no dets
            pass
        n_gt = 0 if img == 1 else rng.randint(1, 7)
        for _ in range(n_gt):
            aid += 1
            band = rng.randint(0, 3)
            side = [rng.uniform(6, 30), rng.uniform(34, 94),
                    rng.uniform(98, 220)][band]
            w = side * rng.uniform(0.6, 1.6)
            h = side * side / w
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 640 - h)
            theta = rng.uniform(-0.6, 0.6)
            cat = int(rng.randint(1, n_cats + 1))
            crowd = int(rng.rand() < 0.08)
            poly = _rot_rect(x + w / 2, y + h / 2, w, h, theta)
            anns.append({'id': aid, 'image_id': img, 'category_id': cat,
                         'iscrowd': crowd,
                         'bbox': [round(float(v), 4)
                                  for v in (x, y, w, h)],
                         'area': round(float(w * h), 4),
                         'segmentation': [poly]})
            if img == n_images:
                continue
            # matched detection(s) with jitter; sometimes duplicates,
            # sometimes wrong category
            for _ in range(1 + (rng.rand() < 0.15)):
                if rng.rand() < 0.8:
                    jx, jy = rng.normal(0, 0.06 * w), rng.normal(0, 0.06 * h)
                    jw, jh = w * rng.uniform(0.85, 1.15), \
                        h * rng.uniform(0.85, 1.15)
                    dcat = cat if rng.rand() > 0.1 else \
                        int(rng.randint(1, n_cats + 1))
                    dpoly = _rot_rect(x + jx + jw / 2, y + jy + jh / 2,
                                      jw, jh, theta + rng.normal(0, 0.05))
                    px = dpoly[0::2]
                    py = dpoly[1::2]
                    bx, by = min(px), min(py)
                    dets.append({
                        'image_id': img, 'category_id': dcat,
                        'score': round(float(rng.uniform(0.3, 0.99)), 6),
                        'bbox': [round(float(v), 4) for v in
                                 (x + jx, y + jy, jw, jh)],
                        'segmentation': [dpoly]})
        # false positives (also in the gt-free image)
        for _ in range(rng.randint(0, 4)):
            w = rng.uniform(8, 150)
            h = rng.uniform(8, 150)
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 640 - h)
            dets.append({
                'image_id': img, 'category_id': int(rng.randint(1, 4)),
                'score': round(float(rng.uniform(0.05, 0.6)), 6),
                'bbox': [round(float(v), 4) for v in (x, y, w, h)],
                'segmentation': [_rot_rect(x + w / 2, y + h / 2, w, h,
                                           rng.uniform(-0.6, 0.6))]})
    # exact 32x32 boundary case: counts as small AND medium (inclusive)
    aid += 1
    anns.append({'id': aid, 'image_id': 2, 'category_id': 1, 'iscrowd': 0,
                 'bbox': [100.0, 100.0, 32.0, 32.0], 'area': 1024.0,
                 'segmentation': [_rot_rect(116.0, 116.0, 32.0, 32.0, 0.0)]})
    dets.append({'image_id': 2, 'category_id': 1, 'score': 0.77,
                 'bbox': [101.0, 99.0, 32.0, 32.0],
                 'segmentation': [_rot_rect(117.0, 115.0, 32.0, 32.0, 0.0)]})
    dataset = {'images': images, 'annotations': anns, 'categories': cats}
    return dataset, dets


@pytest.fixture(scope='module')
def fixture_data():
    return make_fixture()


@pytest.mark.parametrize('iou_type', ['bbox', 'segm'])
def test_matches_oracle(fixture_data, iou_type):
    dataset, dets = fixture_data
    got = CocoEvaluator(CocoIndex(dataset=dataset),
                        iou_type=iou_type).evaluate(dets)
    want = oracle_eval(dataset, dets, iou_type)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert 0.05 < got[0] < 0.95          # non-degenerate fixture


def test_matches_committed_golden(fixture_data):
    """Numbers frozen in tests/fixtures/coco_eval_golden.json — any
    change to either evaluator that shifts a stat fails here."""
    dataset, dets = fixture_data
    with open(FIXTURE) as f:
        golden = json.load(f)
    assert golden['n_annotations'] == len(dataset['annotations'])
    assert golden['n_detections'] == len(dets)
    for iou_type in ('bbox', 'segm'):
        got = CocoEvaluator(CocoIndex(dataset=dataset),
                            iou_type=iou_type).evaluate(dets)
        np.testing.assert_allclose(got, np.asarray(golden[iou_type]),
                                   atol=1e-6, err_msg=iou_type)


if __name__ == '__main__':               # regenerate the golden fixture
    dataset, dets = make_fixture()
    out = {'n_annotations': len(dataset['annotations']),
           'n_detections': len(dets)}
    for iou_type in ('bbox', 'segm'):
        stats = CocoEvaluator(CocoIndex(dataset=dataset),
                              iou_type=iou_type).evaluate(dets)
        oracle = oracle_eval(dataset, dets, iou_type)
        np.testing.assert_allclose(stats, oracle, atol=1e-9)
        out[iou_type] = [round(float(s), 10) for s in stats]
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', FIXTURE, out)
