"""Spec-literal COCO evaluation oracle for differential testing.

A deliberately naive, unoptimized transcription of the pycocotools
``COCOeval`` bbox/segm protocol (evaluateImg + accumulate): per-image
per-category greedy matching in score order against ignore-sorted ground
truths, matrices sliced per maxDets, 101-point interpolated AP.  Used only
by tests to cross-check ``sihl_tpu.utils.coco_map`` — kept independent of
it on purpose (no shared helpers).
"""

import numpy as np

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
REC_THRS = [i / 100.0 for i in range(101)]
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def box_iou_single(d, g):
    ax0, ay0, ax1, ay1 = d
    bx0, by0, bx1, by1 = g
    iw = min(ax1, bx1) - max(ax0, bx0)
    ih = min(ay1, by1) - max(ay0, by0)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = (
        max(ax1 - ax0, 0) * max(ay1 - ay0, 0)
        + max(bx1 - bx0, 0) * max(by1 - by0, 0)
        - inter
    )
    return inter / union if union > 0 else 0.0


def mask_iou_single(d, g):
    inter = float(np.logical_and(d, g).sum())
    union = float(np.logical_or(d, g).sum())
    return inter / union if union > 0 else 0.0


def _area(geom, iou_type):
    if iou_type == "bbox":
        return (geom[2] - geom[0]) * (geom[3] - geom[1])
    return float(np.asarray(geom).sum())


def evaluate(images, iou_type="bbox", max_dets=(1, 10, 100)):
    """``images``: list of dicts with det_geoms/det_classes/det_scores and
    gt_geoms/gt_classes (numpy, already unpadded).  Returns the COCO
    metric dict."""
    cats = sorted({int(c) for im in images for c in im["gt_classes"]})
    iou_fn = box_iou_single if iou_type == "bbox" else mask_iou_single
    top_m = max(max_dets)

    # evaluateImg: per (cat, area, image)
    eval_imgs = {}
    for cat in cats:
        for aname, (lo, hi) in AREAS.items():
            for ii, im in enumerate(images):
                g_idx = [k for k, c in enumerate(im["gt_classes"]) if int(c) == cat]
                d_idx = [k for k, c in enumerate(im["det_classes"]) if int(c) == cat]
                # dets sorted by score desc (stable), truncated to top maxDet
                d_idx = sorted(d_idx, key=lambda k: -float(im["det_scores"][k]))
                d_idx = d_idx[:top_m]
                gt_ig = [
                    not (lo <= _area(im["gt_geoms"][k], iou_type) < hi) for k in g_idx
                ]
                # gts sorted: non-ignored first (stable)
                order = sorted(range(len(g_idx)), key=lambda z: gt_ig[z])
                g_idx = [g_idx[z] for z in order]
                gt_ig = [gt_ig[z] for z in order]

                gtm = [0.0] * len(g_idx)  # matched flag
                dtm = [-1] * len(d_idx)   # matched gt position or -1
                dt_ig = [False] * len(d_idx)
                T = len(IOU_THRS)
                dtm_t = [[-1] * len(d_idx) for _ in range(T)]
                dtig_t = [[False] * len(d_idx) for _ in range(T)]
                gtm_t = [[False] * len(g_idx) for _ in range(T)]
                for t, thr in enumerate(IOU_THRS):
                    for di, dk in enumerate(d_idx):
                        best_iou = min(thr, 1 - 1e-10)
                        m = -1
                        for gi, gk in enumerate(g_idx):
                            if gtm_t[t][gi]:
                                continue
                            if m > -1 and not gt_ig[m] and gt_ig[gi]:
                                break
                            iou = iou_fn(im["det_geoms"][dk], im["gt_geoms"][gk])
                            if iou < best_iou:
                                continue
                            best_iou = iou
                            m = gi
                        if m == -1:
                            continue
                        gtm_t[t][m] = True
                        dtm_t[t][di] = m
                        dtig_t[t][di] = gt_ig[m]
                for t in range(T):
                    for di, dk in enumerate(d_idx):
                        if dtm_t[t][di] == -1:
                            a = _area(im["det_geoms"][dk], iou_type)
                            if not (lo <= a < hi):
                                dtig_t[t][di] = True
                eval_imgs[(cat, aname, ii)] = {
                    "scores": [float(im["det_scores"][k]) for k in d_idx],
                    "dtm": dtm_t,
                    "dtig": dtig_t,
                    "n_gt": sum(1 for z in gt_ig if not z),
                }

    # accumulate
    T = len(IOU_THRS)
    precision = {}  # (aname, maxdet) -> (T, R, K)
    recall = {}     # (aname, maxdet) -> (T, K)
    for aname in AREAS:
        for m in max_dets:
            P = np.full((T, len(REC_THRS), len(cats)), -1.0)
            R = np.full((T, len(cats)), -1.0)
            for ci, cat in enumerate(cats):
                entries = [eval_imgs[(cat, aname, ii)] for ii in range(len(images))]
                n_gt = sum(e["n_gt"] for e in entries)
                if n_gt == 0:
                    continue
                # concatenate per-image (truncated to m), sort by score stable
                rows = []
                for e in entries:
                    for di in range(min(m, len(e["scores"]))):
                        rows.append((e["scores"][di], len(rows), e, di))
                rows.sort(key=lambda r: (-r[0], r[1]))  # stable by insertion
                for t in range(T):
                    tps, fps = [], []
                    for (_, _, e, di) in rows:
                        if e["dtig"][t][di]:
                            continue
                        tps.append(1 if e["dtm"][t][di] != -1 else 0)
                        fps.append(0 if e["dtm"][t][di] != -1 else 1)
                    tp_cum = np.cumsum(tps) if tps else np.zeros(0)
                    fp_cum = np.cumsum(fps) if fps else np.zeros(0)
                    nd = len(tp_cum)
                    rc = tp_cum / n_gt if nd else np.zeros(0)
                    pr = (
                        tp_cum / np.maximum(tp_cum + fp_cum, np.finfo(float).eps)
                        if nd
                        else np.zeros(0)
                    )
                    R[t, ci] = rc[-1] if nd else 0.0
                    q = np.zeros(len(REC_THRS))
                    pr = list(pr)
                    for z in range(nd - 1, 0, -1):
                        if pr[z] > pr[z - 1]:
                            pr[z - 1] = pr[z]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    P[t, :, ci] = q
            precision[(aname, m)] = P
            recall[(aname, m)] = R

    def _mean(x):
        x = x[x > -1]
        return float(np.mean(x)) if x.size else -1.0

    out = {
        "map": _mean(precision[("all", top_m)]),
        "map_50": _mean(precision[("all", top_m)][0]),
        "map_75": _mean(precision[("all", top_m)][5]),
        "map_small": _mean(precision[("small", top_m)]),
        "map_medium": _mean(precision[("medium", top_m)]),
        "map_large": _mean(precision[("large", top_m)]),
    }
    for m in max_dets:
        out[f"mar_{m}"] = _mean(recall[("all", m)])
    return out
