"""Evaluation-harness tests: ATE/RPE/association/PR-RR-F1."""

import numpy as np

from better_fastlio2_tpu.io.evaluate import (
    associate,
    ate_rmse,
    pr_rr_f1,
    rpe,
    umeyama_align,
)


def test_umeyama_recovers_rigid_transform(rng):
    pts = rng.normal(size=(100, 3))
    ang = 0.7
    R_true = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1.0]]
    )
    t_true = np.array([3.0, -1.0, 2.0])
    moved = pts @ R_true.T + t_true
    R, t, s = umeyama_align(pts, moved)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert s == 1.0


def test_ate_zero_after_alignment(rng):
    gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    est = gt @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]).T + [5, 5, 0]
    assert ate_rmse(est, gt, align=True) < 1e-9
    assert ate_rmse(est, gt, align=False) > 1.0


def test_rpe_detects_scale_drift(rng):
    gt = np.cumsum(np.tile([1.0, 0, 0], (50, 1)), axis=0)
    est = gt * 1.1  # 10% scale drift
    assert rpe(est, gt, delta=10) > 0.5
    assert rpe(gt, gt, delta=10) < 1e-12


def test_associate_nearest(rng):
    t_gt = np.arange(0, 10, 0.1)
    t_est = t_gt[::2] + 0.01
    ei, gi = associate(t_est, t_gt, max_dt=0.05)
    assert len(ei) == len(t_est)
    np.testing.assert_array_equal(gi, np.arange(0, 100, 2))
    # out-of-tolerance stamps dropped
    ei2, _ = associate(np.array([100.0]), t_gt)
    assert len(ei2) == 0


def test_pr_rr_f1():
    pred = np.array([1, 1, 1, 0, 0, 0], bool)
    gt = np.array([1, 1, 0, 1, 0, 0], bool)
    pr, rr, f1 = pr_rr_f1(pred, gt)
    assert abs(pr - 2 / 3) < 1e-9
    assert abs(rr - 2 / 3) < 1e-9
    assert abs(f1 - 2 / 3) < 1e-9
