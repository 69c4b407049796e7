"""Config-driven end-to-end smoke: a dataset run fully specified by a
shipped YAML (no code-side tuning), KITTI bytes -> session directory.

The reference's contract is launch-file + yaml -> rosbag replay ->
session artifacts (README.md:74-141, laserMapping.cpp:2465-2554); here
the same trip is `run.py mapping --dataset kitti:<dir> --config
configs/velodyne64_kitti.yaml --output <dir>` driven purely by the YAML
(including the shapes: block added for TPU static geometry).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_kitti_sequence(root, n_scans=14, n_pts=400, seed=3):
    """KITTI raw-format fixture rich enough to pass IMU init and produce
    keyframes: byte layout identical to tests.test_dataset_fixtures
    (velodyne .bin float32 x,y,z,refl; OXTS 30-field rows)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "velodyne_points", "data"))
    os.makedirs(os.path.join(root, "oxts", "data"))
    # a planar world: floor + two walls, sampled fresh each scan
    for k in range(n_scans):
        n3 = n_pts // 3
        floor = np.stack([rng.uniform(-20, 20, n3),
                          rng.uniform(-20, 20, n3),
                          np.full(n3, -1.7)], 1)
        wall1 = np.stack([np.full(n3, 15.0), rng.uniform(-20, 20, n3),
                          rng.uniform(-1.7, 2.0, n3)], 1)
        wall2 = np.stack([rng.uniform(-20, 20, n3),
                          np.full(n3, 12.0),
                          rng.uniform(-1.7, 2.0, n3)], 1)
        pts = np.concatenate([floor, wall1, wall2]).astype(np.float32)
        pts += 0.01 * rng.standard_normal(pts.shape).astype(np.float32)
        arr = np.concatenate([pts, np.full((len(pts), 1), 0.5, np.float32)],
                             axis=1)
        arr.tofile(os.path.join(root, "velodyne_points", "data",
                                f"{k:010d}.bin"))
    with open(os.path.join(root, "velodyne_points", "timestamps.txt"),
              "w") as f:
        for k in range(n_scans):
            ns = k * 100_000_000
            f.write(f"2011-09-26 13:02:{25 + ns // 10**9:02d}."
                    f"{ns % 10**9:09d}\n")
    n_imu = n_scans + 2
    with open(os.path.join(root, "oxts", "timestamps.txt"), "w") as f:
        for k in range(n_imu):
            ns = k * 100_000_000
            f.write(f"2011-09-26 13:02:{25 + ns // 10**9:02d}."
                    f"{ns % 10**9:09d}\n")
    for k in range(n_imu):
        r = np.zeros(30)
        r[0:3] = [49.0, 8.4, 112.0]
        r[14:17] = [0.0, 0.0, 9.809]  # stationary: gravity only
        r[20:23] = [0.0, 0.0, 0.0]
        with open(os.path.join(root, "oxts", "data", f"{k:010d}.txt"),
                  "w") as f:
            f.write(" ".join(f"{v:.9f}" for v in r) + "\n")


@pytest.mark.slow
def test_yaml_driven_kitti_run_writes_session(tmp_path):
    data = str(tmp_path / "kitti")
    out = str(tmp_path / "session")
    _make_kitti_sequence(data)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "better_fastlio2_tpu.run", "mapping",
         "--dataset", f"kitti:{data}",
         "--config", os.path.join(REPO, "configs", "velodyne64_kitti.yaml"),
         "--output", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    # the session-directory contract (SURVEY.md §1 / §7.4)
    for f in ["singlesession_posegraph.g2o", "trajectory.pcd",
              "transformations.pcd", "globalMap.pcd",
              "poses_kitti.txt", "fast_lio_time_log.csv"]:
        assert os.path.exists(os.path.join(out, f)), f
    assert os.path.isdir(os.path.join(out, "PCDs"))
    assert os.path.isdir(os.path.join(out, "SCDs"))
    assert len(os.listdir(os.path.join(out, "PCDs"))) >= 1
    # trajectory stayed finite and near the origin (stationary fixture)
    kitti_rows = np.loadtxt(os.path.join(out, "poses_kitti.txt"))
    kitti_rows = np.atleast_2d(kitti_rows)
    assert np.all(np.isfinite(kitti_rows))
    t = kitti_rows[:, [3, 7, 11]]
    assert np.all(np.abs(t) < 2.0)
