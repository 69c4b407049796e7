"""LOAM-style plane/edge feature extraction (optional preprocessing).

Behavioral analog of the reference's Preprocess::give_feature path
(reference: src/preprocess.cpp:528-1020 — plane_judge :865,
edge_jump_judge :982), which is OFF by default in every shipped config
(feature_extract_enable false, laserMapping.cpp:2036).  The reference
classifies per-ring point runs into Real_Plane/Edge_Jump/etc. through a
cascade of hand-tuned group tests; this implementation keeps the
decision structure that matters downstream (a plane set used for
point-to-plane matching and an edge set) with the classic LOAM
smoothness criterion computed per ring:

    c_i = || sum_{j in window}(p_j - p_i) ||^2 / (|window| * ||p_i||)^2

Low-c points in locally-flat runs -> plane features; local-maximum
high-c points with a range discontinuity guard -> edge features
(the edge_jump occlusion test of :982-1016).
"""

from __future__ import annotations

import numpy as np

__all__ = ["extract_features", "ring_from_elevation", "feature_filter"]


def ring_from_elevation(pts: np.ndarray, n_rings: int) -> np.ndarray:
    """Synthesize per-point laser ring ids from elevation angle.

    For sources that don't carry a ring field (KITTI bins, generic
    PointCloud2) — the reference's velodyne handler similarly recovers
    scan layers geometrically when needed (preprocess.cpp:329-391)."""
    el = np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=1))
    lo, hi = np.percentile(el, [0.5, 99.5])
    span = max(hi - lo, 1e-6)
    ring = np.clip(((el - lo) / span * n_rings).astype(np.int32),
                   0, n_rings - 1)
    return ring


def feature_filter(
    pts: np.ndarray,
    pt_t: np.ndarray,
    n_rings: int,
    ring: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a scan to its plane-feature points (give_feature analog:
    the surf cloud is what feeds the point-to-plane filter downstream;
    edge features are extracted but unused by the mapping path, exactly
    as in the reference's default pipeline)."""
    if len(pts) == 0:
        return pts, pt_t
    if ring is None:
        ring = ring_from_elevation(pts, n_rings)
    # order each ring by azimuth: for spinning lidars this is the sweep
    # order the smoothness window assumes (robust to shuffled input,
    # unlike sorting by per-point time)
    az = np.arctan2(pts[:, 1], pts[:, 0])
    order = np.lexsort((az, ring))
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    plane, _ = extract_features(pts[order], ring[order])
    keep = plane[inv]
    if keep.sum() < 200:  # degenerate extraction: keep the raw scan
        return pts, pt_t
    return pts[keep], pt_t[keep]


def extract_features(
    pts: np.ndarray,
    ring: np.ndarray,
    window: int = 5,
    plane_thresh: float | None = None,
    edge_thresh: float = 5e-4,
    occlusion_ratio: float = 0.1,
    max_edge_per_ring: int = 200,
):
    """Returns (plane_mask (N,), edge_mask (N,)) over ring-ordered points.

    plane_thresh=None (default) selects adaptively per ring: points with
    c below 2x the ring's median smoothness (and below the edge
    threshold) count as plane features — robust across point densities,
    where a fixed absolute threshold assumes dense regular sweeps.

    `pts` must be ordered by (ring, azimuth) as the vendor handlers emit
    them; `ring` gives the laser index per point.
    """
    N = len(pts)
    plane = np.zeros(N, bool)
    edge = np.zeros(N, bool)
    rng_norm = np.linalg.norm(pts, axis=1)

    for r in np.unique(ring):
        idx = np.nonzero(ring == r)[0]
        if len(idx) < 2 * window + 1:
            continue
        p = pts[idx]
        n = len(idx)
        # smoothness over +-window neighbors (LOAM c value)
        csum = np.zeros((n, 3))
        for o in range(1, window + 1):
            csum[o:] += p[:-o] - p[o:]
            csum[:-o] += p[o:] - p[:-o]
        c = np.einsum("ij,ij->i", csum, csum) / (
            (2 * window) ** 2 * np.maximum(rng_norm[idx] ** 2, 1e-6)
        )
        interior = np.zeros(n, bool)
        interior[window:-window] = True

        if plane_thresh is None:
            med = np.median(c[interior]) if interior.any() else 0.0
            thr = min(max(2.0 * med, 1e-6), edge_thresh)
        else:
            thr = plane_thresh
        plane[idx] = interior & (c < thr)

        # edge candidates: smoothness local maxima above threshold, with
        # the occlusion guard of edge_jump_judge (preprocess.cpp:982):
        # reject points whose neighbor range jumps toward the sensor
        rr = rng_norm[idx]
        jump_prev = np.zeros(n, bool)
        jump_prev[1:] = rr[:-1] < rr[1:] * (1 - occlusion_ratio)
        jump_next = np.zeros(n, bool)
        jump_next[:-1] = rr[1:] < rr[:-1] * (1 - occlusion_ratio)
        occluded = jump_prev | jump_next
        cand = interior & (c > edge_thresh) & ~occluded
        if cand.any():
            order = np.argsort(-c)
            picked = []
            taken = np.zeros(n, bool)
            for i in order:
                if not cand[i] or taken[max(0, i - window):i + window + 1].any():
                    continue
                picked.append(i)
                taken[i] = True
                if len(picked) >= max_edge_per_ring:
                    break
            edge[idx[picked]] = True
    return plane, edge
