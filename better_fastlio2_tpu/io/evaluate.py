"""Trajectory and dynamic-removal evaluation.

The reference evaluates offline with ad-hoc scripts
(reference: include/analysis/pose.py, pose3d.py — trajectory plots vs
GT; include/analysis/analysis.py:1-30 — dynamic-removal PR/RR/F1 on
SemanticKITTI labels).  This module makes those first-class:

* ATE RMSE with optional SE(3)/Sim(3)-style Umeyama alignment and
  timestamp association — the BASELINE.md headline metric.
* RPE (relative pose error) over a fixed delta.
* Dynamic-removal precision/recall/F1 given boolean masks.
"""

from __future__ import annotations

import numpy as np

__all__ = ["associate", "umeyama_align", "ate_rmse", "rpe", "pr_rr_f1"]


def associate(t_est: np.ndarray, t_gt: np.ndarray, max_dt: float = 0.05):
    """Nearest-timestamp association; returns index pairs (est, gt)."""
    j = np.searchsorted(t_gt, t_est)
    j = np.clip(j, 1, len(t_gt) - 1)
    prev_closer = np.abs(t_gt[j - 1] - t_est) < np.abs(t_gt[j] - t_est)
    j = np.where(prev_closer, j - 1, j)
    ok = np.abs(t_gt[j] - t_est) <= max_dt
    return np.nonzero(ok)[0], j[ok]


def umeyama_align(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (or similarity) alignment est -> gt.

    Returns (R, t, s)."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    C = G.T @ E / len(est)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = (np.trace(np.diag(D) @ S) / (E**2).sum() * len(est)) if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray,
             align: bool = True) -> float:
    """Absolute trajectory error RMSE (metres) after optional alignment."""
    if align and len(est_pos) >= 3:
        R, t, s = umeyama_align(est_pos, gt_pos)
        est_pos = (s * (R @ est_pos.T)).T + t
    d = est_pos - gt_pos
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def rpe(est_pos: np.ndarray, gt_pos: np.ndarray, delta: int = 10) -> float:
    """Translational relative pose error RMSE over `delta`-frame gaps."""
    de = est_pos[delta:] - est_pos[:-delta]
    dg = gt_pos[delta:] - gt_pos[:-delta]
    err = np.linalg.norm(de, axis=1) - np.linalg.norm(dg, axis=1)
    return float(np.sqrt(np.mean(err * err)))


def pr_rr_f1(pred_dynamic: np.ndarray, gt_dynamic: np.ndarray):
    """Dynamic-removal metrics (include/analysis/analysis.py:1-30):
    PR = precision of predicted-dynamic, RR = recall, F1 harmonic mean."""
    tp = float(np.sum(pred_dynamic & gt_dynamic))
    fp = float(np.sum(pred_dynamic & ~gt_dynamic))
    fn = float(np.sum(~pred_dynamic & gt_dynamic))
    pr = tp / max(tp + fp, 1e-9)
    rr = tp / max(tp + fn, 1e-9)
    f1 = 2 * pr * rr / max(pr + rr, 1e-9)
    return pr, rr, f1
