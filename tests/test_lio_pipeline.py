"""End-to-end LIO pipeline test on the synthetic world.

Runs the full jitted scan tick (propagation, undistortion, downsample,
iterated ESIKF update, map insert) over a simulated sequence and checks
absolute trajectory error against analytic ground truth — the automated
replacement for the reference's manual rosbag-replay validation
(SURVEY.md §4)."""

import numpy as np
import pytest

from better_fastlio2_tpu.config import (
    IkdtreeConfig,
    LIOConfig,
    MappingConfig,
    ShapesConfig,
)
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline.lio import LIOPipeline


def small_cfg() -> LIOConfig:
    cfg = LIOConfig()
    cfg.dtype = "float32"
    cfg.shapes = ShapesConfig(
        n_raw=8192,
        n_ds=4096,
        n_imu=32,
        map_capacity_log2=16,
        map_bucket=4,
        map_max_probe=8,
        knn_chunk=4096,
    )
    cfg.mapping = MappingConfig(
        gyr_cov=0.1,
        acc_cov=0.1,
        b_gyr_cov=1e-4,
        b_acc_cov=1e-4,
        det_range=60.0,
        cube_len=400.0,
        surf_leaf_size=0.4,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4)
    return cfg


@pytest.mark.slow
def test_lio_tracks_synthetic_trajectory():
    groups = make_lio_sequence(
        duration=4.0, scan_rate=10.0, imu_rate=100.0, n_points=4000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    pipe = LIOPipeline(small_cfg())
    errs = []
    # the filter's world origin is the IMU pose at init time (stationary
    # at [0, 0, height]); align GT into that frame
    origin = np.array([0.0, 0.0, 1.5])
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is not None:
            errs.append(np.linalg.norm(out["pos"] - (g["gt_pos"] - origin)))
    assert len(errs) > 20
    ate = np.sqrt(np.mean(np.square(errs)))
    final_err = errs[-1]
    # moved ~6 m; demand centimetre-level tracking
    assert ate < 0.10, f"ATE RMSE too high: {ate:.3f} m (errors {errs[-5:]})"
    assert final_err < 0.15, f"final error {final_err:.3f} m"


@pytest.mark.slow
def test_windowed_step_matches_per_scan():
    """window=3 (one device program per 3 scans, lax.scan inside) must
    reproduce the per-scan path bit-for-bit — same recurrence, same math;
    also exercises the partial-window flush (7 scans -> 3+3+1)."""
    groups = make_lio_sequence(
        duration=1.8, scan_rate=10.0, imu_rate=100.0, n_points=3000, seed=9,
        noise=0.004, traj=Trajectory(t_still=0.5, speed=2.0),
    )
    p1 = LIOPipeline(small_cfg())
    pw = LIOPipeline(small_cfg(), window=3)
    for g in groups:
        args = (g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
                g["scan_beg_abs"], g["scan_end_t"])
        p1.process_scan(*args)
        pw.process_scan(*args)
    p1.flush()
    pw.flush()
    t1 = np.array(p1.trajectory)
    tw = np.array(pw.trajectory)
    assert t1.shape == tw.shape and len(t1) > 5
    np.testing.assert_allclose(tw, t1, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_windowed_quantized_tracks_ground_truth():
    """The uint16 wire format (3.7 mm point steps, 1/65535-duration time
    steps) must preserve tracking quality.  NB: mm-scale input
    perturbation flips borderline voxel assignments, so the quantized
    trajectory diverges chaotically from the exact run — the meaningful
    bound is ATE against ground truth, not run-to-run agreement."""
    groups = list(make_lio_sequence(
        duration=4.0, scan_rate=10.0, imu_rate=100.0, n_points=3000, seed=9,
        noise=0.004, traj=Trajectory(t_still=0.5, speed=2.0),
    ))
    pq = LIOPipeline(small_cfg(), window=3, quantized=True)
    for g in groups:
        pq.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                        g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    pq.flush()
    traj = np.array(pq.trajectory)
    assert len(traj) == len(groups) - 1  # one group consumed by IMU init
    origin = np.array([0.0, 0.0, 1.5])
    gt = np.array([g["gt_pos"] - origin for g in groups[1:]])
    err = np.linalg.norm(traj[:, :3] - gt, axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    assert ate < 0.10, f"quantized-path ATE {ate:.3f} m"
    assert err[-1] < 0.15


@pytest.mark.slow
def test_lio_stationary_stays_put():
    groups = make_lio_sequence(
        duration=2.5, scan_rate=10.0, imu_rate=100.0, n_points=3000, seed=5,
        noise=0.003, traj=Trajectory(t_still=1e9),  # never moves
    )
    pipe = LIOPipeline(small_cfg())
    last = None
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is not None:
            last = out
    assert last is not None
    origin = np.array([0.0, 0.0, 1.5])
    drift = np.linalg.norm(last["pos"] - (groups[-1]["gt_pos"] - origin))
    assert drift < 0.05, f"stationary drift {drift:.3f} m"


def test_native_pack_quant_matches_numpy():
    """The C++ wire-format packer must agree with the numpy fallback to
    within one quantization step (round-half tie-breaking differs)."""
    from better_fastlio2_tpu.io import native
    from better_fastlio2_tpu.pipeline.lio import POS_SCALE

    rng = np.random.default_rng(1)
    P = rng.uniform(-100, 100, (2048, 3)).astype(np.float32)
    T = rng.uniform(0, 0.1, 2048).astype(np.float32)
    b = native.pack_quant_bulk(P, T, POS_SCALE, 0.1)
    if b is None:
        pytest.skip("native library unavailable")
    n = 2048
    ref = np.zeros(3 * n + n // 2, np.uint16)
    qp = np.clip(np.round(P / POS_SCALE), -32767, 32767).astype(np.int16)
    ref[: 3 * n] = qp.reshape(-1).view(np.uint16)
    t8 = np.clip(np.round(T / 0.1 * 255.0), 0, 255).astype(np.uint16)
    ref[3 * n:] = t8[0::2] | (t8[1::2] << 8)
    assert b.shape == ref.shape
    # positions: within one step (round-half ties)
    dp = np.abs(b[: 3 * n].view(np.int16).astype(np.int64)
                - ref[: 3 * n].view(np.int16).astype(np.int64))
    assert dp.max() <= 1
    assert (dp != 0).mean() < 0.01
    # times: compare unpacked uint8 halves, within one step
    bt = np.stack([b[3 * n:] & 0xFF, b[3 * n:] >> 8], 1).reshape(-1)
    rt = np.stack([ref[3 * n:] & 0xFF, ref[3 * n:] >> 8], 1).reshape(-1)
    dt = np.abs(bt.astype(np.int64) - rt.astype(np.int64))
    assert dt.max() <= 1
    assert (dt != 0).mean() < 0.01
