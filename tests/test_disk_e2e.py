"""Disk-to-session end-to-end: write a short synthetic sequence to disk
in each dataset's NATIVE on-disk format (KITTI raw-sync, MulRan, NCLT),
drive the real CLI path (`run.py mapping --dataset <fmt>:<dir>`) through
to a saved session, and reload it with SessionReader.

This is the dataset-replay validation mode of the reference
(/root/reference/README.md:74-77 — rosbag/fileplayer replays) exercised
end-to-end against the byte formats, since no real sequences are
reachable from CI (zero egress).  The sequence is near-stationary: the
on-disk formats carry no per-point timestamps (loaders re-synthesize
from yaw, which is meaningless for the randomly-sampled synthetic
sweep), so undistortion quality is out of scope here — format decode,
group assembly, the CLI, and session persistence are in scope.
"""

import json
import os
from datetime import datetime

import numpy as np
import pytest

from better_fastlio2_tpu.io.session import SessionReader
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.run import main as run_main

BASE_T = 1_600_000_000.0  # epoch offset for realistic absolute stamps


def _sequence():
    return list(make_lio_sequence(
        duration=2.0, scan_rate=10.0, imu_rate=100.0, n_points=3000,
        seed=4, noise=0.004, traj=Trajectory(t_still=1.4, speed=0.5),
    ))


def _imu_stream(groups):
    """Global (t_abs, acc, gyr) stream, de-duplicated across the
    per-group windows (groups share boundary samples)."""
    seen = {}
    for g in groups:
        for j in range(len(g["imu_t"])):
            ta = float(g["scan_beg_abs"] + g["imu_t"][j])
            if not np.isfinite(ta):
                continue
            seen[round(ta, 6)] = (g["imu_acc"][j], g["imu_gyr"][j])
    ts = sorted(seen)
    acc = np.stack([seen[t][0] for t in ts])
    gyr = np.stack([seen[t][1] for t in ts])
    return np.asarray(ts) + BASE_T, acc, gyr


def _small_cfg_yaml(path):
    with open(path, "w") as f:
        f.write(
            "mapping:\n"
            "  det_range: 60.0\n"
            "  cube_len: 300.0\n"
            "  mappingSurfLeafSize: 0.5\n"
            "ikdtree:\n"
            "  max_iteration: 3\n"
            "  filter_size_map_min: 0.5\n"
            "shapes:\n"
            "  n_raw: 4096\n"
            "  n_ds: 2048\n"
            "  n_imu: 32\n"
            "  map_capacity_log2: 16\n"
            "  map_bucket: 4\n"
            "  map_max_probe: 8\n"
            "  knn_chunk: 2048\n"
        )
    return path


def _ts_line(t_abs: float) -> str:
    base = datetime.fromtimestamp(int(t_abs))
    frac = t_abs - int(t_abs)
    return base.strftime("%Y-%m-%d %H:%M:%S") + f".{int(frac * 1e9):09d}"


def _run_and_check(tmp_path, dataset_spec, n_expected_scans):
    cfg = _small_cfg_yaml(str(tmp_path / "cfg.yaml"))
    out = str(tmp_path / "session")
    run_main(["mapping", "--dataset", dataset_spec, "--config", cfg,
              "--output", out, "--blind", "0.5"])
    # session dir contract (SURVEY §2.5): PCDs/SCDs/g2o/trajectory
    r = SessionReader(out)
    assert r.num_keyframes >= 1
    assert np.all(np.isfinite(np.asarray(r.poses)))
    assert r.scd(0).shape == (20, 60)
    xyz, _ = r.cloud(0)
    assert len(xyz) > 100
    assert os.path.exists(os.path.join(out, "fast_lio_time_log.csv"))
    # the near-stationary sequence must stay put: every keyframe pose
    # within 2 m of the first (catches unit/axis mix-ups in the writers
    # or loaders, not filter quality)
    poses = np.asarray(r.poses)
    assert np.linalg.norm(poses[:, 4:7] - poses[0, 4:7], axis=1).max() < 2.0


def test_kitti_disk_to_session(tmp_path):
    groups = _sequence()
    velo = tmp_path / "velodyne_points" / "data"
    oxts = tmp_path / "oxts" / "data"
    velo.mkdir(parents=True)
    oxts.mkdir(parents=True)
    with open(tmp_path / "velodyne_points" / "timestamps.txt", "w") as f:
        for k, g in enumerate(groups):
            pts = np.zeros((len(g["pts"]), 4), np.float32)
            pts[:, :3] = g["pts"]
            pts.tofile(velo / f"{k:010d}.bin")
            # KITTI stamps the scan END (loader: beg = t - SCAN_PERIOD)
            f.write(_ts_line(
                BASE_T + g["scan_beg_abs"] + g["scan_end_t"]) + "\n")
    ts, acc, gyr = _imu_stream(groups)
    with open(tmp_path / "oxts" / "timestamps.txt", "w") as f:
        for j, t in enumerate(ts):
            row = np.zeros(30)
            row[14:17] = acc[j]  # af, al, au (kitti2bag.py:39-44)
            row[20:23] = gyr[j]  # wf, wl, wu
            np.savetxt(oxts / f"{j:010d}.txt", row[None], fmt="%.9f")
            f.write(_ts_line(t) + "\n")
    _run_and_check(tmp_path, f"kitti:{tmp_path}", len(groups))


def test_mulran_disk_to_session(tmp_path):
    groups = _sequence()
    od = tmp_path / "sensor_data" / "Ouster"
    od.mkdir(parents=True)
    for g in groups:
        stamp_ns = int(round((BASE_T + g["scan_beg_abs"]) * 1e9))
        pts = np.zeros((len(g["pts"]), 4), np.float32)
        pts[:, :3] = g["pts"]
        pts.tofile(od / f"{stamp_ns}.bin")
    ts, acc, gyr = _imu_stream(groups)
    with open(tmp_path / "sensor_data" / "xsens_imu.csv", "w") as f:
        for j, t in enumerate(ts):
            row = [int(round(t * 1e9))] + [0.0] * 7 \
                + list(gyr[j]) + list(acc[j])
            f.write(",".join(str(v) for v in row) + "\n")
    # global_pose.csv (ground_truth surface; --gps path reads it)
    with open(tmp_path / "global_pose.csv", "w") as f:
        for g in groups:
            stamp_ns = int(round((BASE_T + g["scan_beg_abs"]) * 1e9))
            P = np.hstack([np.eye(3), np.asarray(g["gt_pos"])[:, None]])
            f.write(",".join([str(stamp_ns)]
                             + [f"{v:.6f}" for v in P.reshape(-1)]) + "\n")
    _run_and_check(tmp_path, f"mulran:{tmp_path}", len(groups))


def test_nclt_disk_to_session(tmp_path):
    groups = _sequence()
    vd = tmp_path / "velodyne_sync"
    vd.mkdir(parents=True)
    for g in groups:
        utime = int(round((BASE_T + g["scan_beg_abs"]) * 1e6))
        xyz = np.asarray(g["pts"], np.float64)
        u16 = np.clip(np.round((xyz + 100.0) / 0.005), 0, 65535).astype("<u2")
        n = len(xyz)
        rec = np.zeros((n, 8), np.uint8)
        rec[:, :6] = u16.view(np.uint8).reshape(n, 6)
        rec.tofile(vd / f"{utime}.bin")
    ts, acc, gyr = _imu_stream(groups)
    with open(tmp_path / "ms25.csv", "w") as f:
        for j, t in enumerate(ts):
            row = [int(round(t * 1e6))] + [0.0] * 3 \
                + list(acc[j]) + list(gyr[j])
            f.write(",".join(str(v) for v in row) + "\n")
    with open(tmp_path / "groundtruth_seq.csv", "w") as f:
        for g in groups:
            utime = int(round((BASE_T + g["scan_beg_abs"]) * 1e6))
            f.write(",".join([str(utime)]
                             + [f"{v:.6f}" for v in g["gt_pos"]]
                             + ["0", "0", "0"]) + "\n")
    _run_and_check(tmp_path, f"nclt:{tmp_path}", len(groups))
