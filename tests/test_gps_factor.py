"""GPS factors end-to-end (config #3): the feature the reference
declares but leaves commented out (src/laserMapping.cpp:689).

A synthetic corridor run (open ends: the along-track axis is
unobservable to point-to-plane matching) with an un-modeled
accelerometer bias drifts unboundedly; the same run with 1 Hz RTK-class
GPS fixes fed through SLAMPipeline.feed_gps -> pg.add_gps -> optimize
must end materially closer to ground truth."""

import numpy as np
import pytest

from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline.slam import SLAMPipeline
from tests.test_lio_pipeline import small_cfg

ACC_BIAS = np.array([0.1, 0.0, 0.0])  # m/s^2 un-modeled along-track bias


def _corridor_world():
    """A corridor with open ends: geometry constrains y/z/attitude but
    NOT the along-track x axis, so un-modeled accelerometer bias drifts
    the odometry unboundedly — exactly the failure mode GPS exists for."""
    from better_fastlio2_tpu.io.synthetic import SyntheticWorld

    w = SyntheticWorld(seed=11, half_x=30.0, half_y=4.0, height=5.0)
    w.points = w.points[np.abs(w.points[:, 0]) < 29.0]  # drop end caps
    return w


def _run(with_gps: bool):
    traj = Trajectory(t_still=1.0, speed=2.0, yaw_amp=0.0)
    groups = make_lio_sequence(
        duration=6.0, scan_rate=10.0, imu_rate=100.0, n_points=4000,
        seed=11, noise=0.004, traj=traj, world=_corridor_world())
    cfg = small_cfg()
    cfg.loop.enable = False
    cfg.mapping.keyframe_adding_dist_threshold = 0.3
    cfg.mapping.keyframe_adding_angle_threshold = 0.15
    cfg.gps.enable = with_gps
    cfg.gps.sigma = 0.05
    cfg.gps.min_dist = 0.5
    cfg.gps.max_age = 0.30
    pipe = SLAMPipeline(cfg, loop_every=4)
    rng = np.random.default_rng(99)

    origin = np.array([0.0, 0.0, 1.5])
    t_gps = 1.2
    for g in groups:
        acc = np.asarray(g["imu_acc"], float).copy()
        if g["scan_beg_abs"] > 1.0:  # after static init
            acc = acc + ACC_BIAS  # un-modeled, unobservable along-track
        t_end = g["scan_beg_abs"] + g["scan_end_t"]
        if with_gps and t_end >= t_gps:
            fix = traj.pos(t_gps) - origin + rng.normal(scale=0.05, size=3)
            pipe.feed_gps(t_gps, fix, cov=0.0025)  # RTK-class fix
            t_gps += 1.0
        pipe.process_scan(g["pts"], g["pt_t"], acc, g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    gt_end = groups[-1]["gt_pos"] - origin
    # final corrected keyframe position error vs ground truth
    assert pipe.keyframes, "no keyframes created"
    err = float(np.linalg.norm(pipe.keyframes[-1].pose[4:7] - gt_end))
    return err, pipe


@pytest.mark.slow
def test_gps_bounds_drift():
    err_no, pipe_no = _run(with_gps=False)
    err_gps, pipe_gps = _run(with_gps=True)
    assert pipe_gps._gps_added >= 3, "GPS factors never reached the graph"
    assert int(pipe_gps.graph.n_gps) == pipe_gps._gps_added
    # the biased-gyro run must drift, and GPS must bound it
    assert err_no > 0.5, f"odometry did not drift ({err_no:.3f} m)"
    assert err_gps < err_no * 0.6, (err_gps, err_no)
    assert err_gps < 1.0, err_gps


def test_gps_gating():
    """cov_threshold and min_dist gates reject samples (behavior-level)."""
    cfg = small_cfg()
    cfg.gps.enable = True
    cfg.gps.min_dist = 5.0
    cfg.gps.cov_threshold = 1.0
    pipe = SLAMPipeline(cfg)
    from better_fastlio2_tpu.pipeline.slam import Keyframe

    kf = Keyframe(idx=0, t=10.0, pose=np.zeros(7), odom_pose=np.zeros(7),
                  cloud=np.zeros((1, 3), np.float32),
                  desc=np.zeros((20, 60)))
    pipe.keyframes.append(kf)
    # high-covariance sample rejected
    pipe.feed_gps(10.0, [1.0, 0.0, 0.0], cov=9.0)
    pipe._maybe_add_gps(kf)
    assert pipe._gps_added == 0
    # good sample accepted
    pipe.feed_gps(10.01, [1.0, 0.0, 0.0], cov=0.25)
    pipe._maybe_add_gps(kf)
    assert pipe._gps_added == 1
    # second sample too close (min_dist) -> rejected
    kf2 = Keyframe(idx=1, t=11.0, pose=np.zeros(7), odom_pose=np.zeros(7),
                   cloud=np.zeros((1, 3), np.float32),
                   desc=np.zeros((20, 60)))
    pipe.keyframes.append(kf2)
    pipe.feed_gps(11.0, [2.0, 0.0, 0.0], cov=0.25)
    pipe._maybe_add_gps(kf2)
    assert pipe._gps_added == 1
    # far enough -> accepted
    kf3 = Keyframe(idx=2, t=12.0, pose=np.zeros(7), odom_pose=np.zeros(7),
                   cloud=np.zeros((1, 3), np.float32),
                   desc=np.zeros((20, 60)))
    pipe.keyframes.append(kf3)
    pipe.feed_gps(12.0, [7.0, 0.0, 0.0], cov=0.25)
    pipe._maybe_add_gps(kf3)
    assert pipe._gps_added == 2
