"""StarDist ray-polygon NMS and rasterization.

Reference analog: biapy/data/post_processing/polygon_nms.py
(non_maximum_suppression + polygon/polyhedron rasterization :395).

2D star-convex polygons: candidate centers are probability peaks; greedy NMS
accepts candidates in descending probability order, rejecting those whose
polygon overlaps an already-accepted polygon above ``iou_threshold``
(overlap computed on the rasterized grid — exact for grid polygons).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _rasterize_polygon(center: np.ndarray, dists: np.ndarray, shape) -> np.ndarray:
    """Boolean mask of the star-convex polygon given per-ray distances."""
    n = len(dists)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ys = center[0] + dists * np.sin(angles)
    xs = center[1] + dists * np.cos(angles)
    # bounding box
    y0 = max(0, int(np.floor(ys.min())))
    y1 = min(shape[0], int(np.ceil(ys.max())) + 1)
    x0 = max(0, int(np.floor(xs.min())))
    x1 = min(shape[1], int(np.ceil(xs.max())) + 1)
    if y1 <= y0 or x1 <= x0:
        return np.zeros(shape, bool)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    dy = yy - center[0]
    dx = xx - center[1]
    ang = np.arctan2(dy, dx) % (2 * np.pi)
    r = np.sqrt(dy**2 + dx**2)
    # interpolate the boundary distance at each pixel's angle
    k = ang / (2 * np.pi / n)
    k0 = np.floor(k).astype(int) % n
    k1 = (k0 + 1) % n
    frac = k - np.floor(k)
    bound = dists[k0] * (1 - frac) + dists[k1] * frac
    mask = np.zeros(shape, bool)
    mask[y0:y1, x0:x1] = r <= bound
    return mask


def stardist_nms_2d(
    prob: np.ndarray,
    rays: np.ndarray,
    prob_threshold: float = 0.5,
    iou_threshold: float = 0.4,
    max_candidates: int = 1000,
    grid_step: int = 2,
) -> np.ndarray:
    """Probability + ray-distance maps -> instance labels.

    ``prob``: (H, W); ``rays``: (H, W, nrays). Candidates are sampled on a
    ``grid_step`` lattice (StarDist's grid subsampling), sorted by
    probability, greedily accepted under the pairwise-IoU constraint, and
    rasterized in acceptance order (earlier = higher probability wins pixel
    ties).
    """
    h, w = prob.shape
    cand = np.argwhere(prob[::grid_step, ::grid_step] > prob_threshold) * grid_step
    if len(cand) == 0:
        return np.zeros((h, w), np.int32)
    scores = prob[cand[:, 0], cand[:, 1]]
    order = np.argsort(-scores)[:max_candidates]
    cand = cand[order]

    labels = np.zeros((h, w), np.int32)
    accepted_masks: List[np.ndarray] = []
    next_id = 0
    for c in cand:
        d = rays[c[0], c[1]]
        m = _rasterize_polygon(c.astype(np.float64), np.maximum(d, 1.0), (h, w))
        area = int(m.sum())
        if area < 4:
            continue
        ok = True
        for am in accepted_masks:
            inter = int((m & am).sum())
            if inter and inter / (area + int(am.sum()) - inter) > iou_threshold:
                ok = False
                break
        if not ok:
            continue
        next_id += 1
        labels[m & (labels == 0)] = next_id
        accepted_masks.append(m)
    return labels
