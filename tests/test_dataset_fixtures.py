"""Golden decode tests on hand-constructed, byte-accurate miniature
dataset fixtures (KITTI raw-sync, MulRan, NCLT).

No real datasets are reachable from CI (zero egress), so each fixture is
built to the PUBLISHED byte layout and the loaders must decode it to the
known physical values — a field-order / timestamp-convention / scaling
mistake in io/kitti.py, io/mulran.py, io/nclt.py fails here instead of
silently corrupting a run (VERDICT round-1 missing #1).

Layouts encoded:
  KITTI:  velodyne .bin = (N,4) f32 [x y z reflectance], row-major;
          timestamps.txt = "YYYY-MM-DD HH:MM:SS.fffffffff";
          oxts .txt = 30 floats, acc(f,l,u) at [14:17], gyr(f,l,u) at
          [20:23] (kitti2bag.py:39-44).
  MulRan: Ouster .bin = (N,4) f32 [x y z intensity], file name =
          <stamp_ns>.bin; xsens_imu.csv row = stamp_ns, quat(x y z w),
          euler(3), gyro(3), accel(3), ...; global_pose.csv row =
          stamp_ns, 3x4 row-major pose.
  NCLT:   velodyne_sync .bin = 8-byte records x,y,z as LE uint16 with
          value*0.005-100.0 m, intensity u8, ring u8; file name =
          <utime>.bin (microseconds); ms25.csv row = utime, mag(3),
          accel(3), gyro(3).
"""

import os
import struct

import numpy as np
import pytest


# ---------------------------------------------------------------- KITTI
def make_kitti_fixture(root):
    os.makedirs(os.path.join(root, "velodyne_points", "data"))
    os.makedirs(os.path.join(root, "oxts", "data"))
    # two scans, 4 points each: one inside blind range, three beyond
    pts0 = np.array([
        [10.0, 0.0, -1.5, 0.1],
        [0.5, 0.1, 0.0, 0.2],     # r_xy ~0.51 -> blind-culled at 1.0
        [0.0, -20.0, 2.0, 0.3],
        [-5.0, 5.0, 0.5, 0.4],
    ], np.float32)
    pts1 = pts0.copy()
    pts1[:, 0] += 0.5
    for k, p in enumerate([pts0, pts1]):
        p.tofile(os.path.join(root, "velodyne_points", "data",
                              f"{k:010d}.bin"))
    with open(os.path.join(root, "velodyne_points", "timestamps.txt"),
              "w") as f:
        f.write("2011-09-26 13:02:25.964389445\n")
        f.write("2011-09-26 13:02:26.064389445\n")
    # OXTS rows at 10 Hz, 30 fields; acc=(1.1,2.2,9.7), gyr=(.01,.02,.03)
    rows = []
    for k in range(4):
        r = np.zeros(30)
        r[0:3] = [49.0, 8.4, 112.0]  # lat lon alt
        r[14:17] = [1.1, 2.2, 9.7]   # af al au
        r[17:20] = [9.9, 9.9, 9.9]   # wx wy wz (raw-frame; NOT used)
        r[20:23] = [0.01, 0.02, 0.03]  # wf wl wu
        rows.append(r)
        with open(os.path.join(root, "oxts", "data", f"{k:010d}.txt"),
                  "w") as f:
            f.write(" ".join(f"{v:.9f}" for v in r) + "\n")
    with open(os.path.join(root, "oxts", "timestamps.txt"), "w") as f:
        for k in range(4):
            frac_ns = 864389445 + k * 100000000
            sec = 25 + frac_ns // 1_000_000_000
            f.write(f"2011-09-26 13:02:{sec:02d}."
                    f"{frac_ns % 1_000_000_000:09d}\n")


def test_kitti_decode(tmp_path):
    from better_fastlio2_tpu.io.kitti import KittiRawSequence

    make_kitti_fixture(str(tmp_path))
    seq = KittiRawSequence(str(tmp_path))
    assert len(seq) == 2
    xyz, inten, toff = seq.scan(0)
    np.testing.assert_allclose(xyz[0], [10.0, 0.0, -1.5])
    np.testing.assert_allclose(inten, [0.1, 0.2, 0.3, 0.4], atol=1e-7)
    # timestamps parse sub-second digits
    assert abs(seq.velo_t[1] - seq.velo_t[0] - 0.1) < 1e-6
    # groups: blind point culled, IMU channels mapped to (af,al,au)/(wf,wl,wu)
    gs = list(seq.groups(blind=1.0))
    assert len(gs) >= 1
    g = gs[0]
    assert len(g["pts"]) == 3  # blind point removed
    np.testing.assert_allclose(g["imu_acc"][0], [1.1, 2.2, 9.7])
    np.testing.assert_allclose(g["imu_gyr"][0], [0.01, 0.02, 0.03])
    # never the raw-frame wx,wy,wz columns
    assert not np.allclose(g["imu_gyr"][0], [9.9, 9.9, 9.9])
    # IMU times relative to scan begin, ending at/before scan end
    assert np.all(np.diff(g["imu_t"]) > 0)
    assert g["imu_t"][-1] <= g["scan_end_t"] + 1e-9


def test_kitti_yaw_time_synthesis(tmp_path):
    from better_fastlio2_tpu.io.kitti import (KittiRawSequence,
                                              synthesize_velodyne_times)

    make_kitti_fixture(str(tmp_path))
    seq = KittiRawSequence(str(tmp_path), deskewed=False)
    xyz, _, toff = seq.scan(0)
    # hand-computed: first point yaw 0 deg -> t 0; clockwise sweep:
    # point (0,-20) at yaw -90 -> 90/360*0.1 = 0.025 s;
    # point (-5,5) at yaw 135 -> (0-135)%360=225 -> 0.0625 s
    expect = synthesize_velodyne_times(xyz)
    np.testing.assert_allclose(toff, expect)
    np.testing.assert_allclose(toff[0], 0.0, atol=1e-9)
    np.testing.assert_allclose(toff[2], 0.025, atol=1e-6)
    np.testing.assert_allclose(toff[3], 0.0625, atol=1e-6)


# ---------------------------------------------------------------- MulRan
def make_mulran_fixture(root):
    od = os.path.join(root, "sensor_data", "Ouster")
    os.makedirs(od)
    base_ns = 1_561_000_000_000_000_000
    pts = np.array([
        [5.0, 0.0, 0.0, 10.0],
        [0.2, 0.2, 0.0, 20.0],   # blind
        [0.0, 8.0, 1.0, 30.0],
    ], np.float32)
    for k in range(2):
        pts.tofile(os.path.join(od, f"{base_ns + k * 100_000_000}.bin"))
    # xsens rows at 100 Hz: stamp, quat xyzw, euler rpy, gyr, acc
    with open(os.path.join(root, "sensor_data", "xsens_imu.csv"),
              "w") as f:
        for k in range(25):
            t = base_ns - 20_000_000 + k * 10_000_000
            row = [t, 0, 0, 0, 1, 0, 0, 0, 0.04, 0.05, 0.06,
                   0.7, 0.8, 9.6]
            f.write(",".join(str(v) for v in row) + "\n")
    with open(os.path.join(root, "global_pose.csv"), "w") as f:
        for k in range(2):
            t = base_ns + k * 100_000_000
            P = np.hstack([np.eye(3), [[100.0 + k], [200.0], [3.0]]])
            f.write(",".join([str(t)] +
                             [f"{v:.6f}" for v in P.reshape(-1)]) + "\n")


def test_mulran_decode(tmp_path):
    from better_fastlio2_tpu.io.mulran import MulranSequence

    make_mulran_fixture(str(tmp_path))
    seq = MulranSequence(str(tmp_path))
    assert len(seq) == 2
    xyz, inten = seq.scan(0)
    np.testing.assert_allclose(xyz[0], [5.0, 0.0, 0.0])
    np.testing.assert_allclose(inten, [10.0, 20.0, 30.0])
    # IMU columns: gyro at [8:11], accel at [11:14]
    gs = list(seq.groups(blind=1.0))
    assert gs
    g = gs[0]
    np.testing.assert_allclose(g["imu_gyr"][0], [0.04, 0.05, 0.06])
    np.testing.assert_allclose(g["imu_acc"][0], [0.7, 0.8, 9.6])
    assert len(g["pts"]) == 2  # blind point culled
    # ground truth translations
    t, poses = seq.ground_truth()
    np.testing.assert_allclose(poses[0][:, 3], [100.0, 200.0, 3.0])
    np.testing.assert_allclose(poses[1][:, 3], [101.0, 200.0, 3.0])
    assert abs(t[1] - t[0] - 0.1) < 1e-6  # f64 resolution at ~1.5e9 s


# ----------------------------------------------------------------- NCLT
def nclt_pack(xyz, intensity, ring):
    """Encode points to NCLT's 8-byte record layout by hand."""
    out = bytearray()
    for p, i, r in zip(xyz, intensity, ring):
        for c in p:
            u = int(round((c + 100.0) / 0.005))
            out += struct.pack("<H", u)
        out += struct.pack("BB", i, r)
    return bytes(out)


def test_nclt_decode(tmp_path):
    from better_fastlio2_tpu.io.nclt import NcltSequence, decode_nclt_bin

    os.makedirs(tmp_path / "velodyne_sync")
    xyz = np.array([[12.5, -3.125, 0.5],
                    [0.25, 0.1, -0.05],
                    [-40.0, 7.5, 2.0]])
    utime0 = 1_357_847_000_000_000 // 1000  # microseconds
    p = tmp_path / "velodyne_sync" / f"{utime0}.bin"
    p.write_bytes(nclt_pack(xyz, [7, 8, 9], [0, 1, 2]))
    (tmp_path / "velodyne_sync" / f"{utime0 + 100_000}.bin").write_bytes(
        nclt_pack(xyz + 0.5, [7, 8, 9], [0, 1, 2]))
    with open(tmp_path / "ms25.csv", "w") as f:
        for k in range(25):
            t = utime0 - 20_000 + k * 10_000
            row = [t, 0.1, 0.2, 0.3, 1.5, 2.5, 9.5, 0.07, 0.08, 0.09]
            f.write(",".join(str(v) for v in row) + "\n")
    with open(tmp_path / "groundtruth_2013-01-10.csv", "w") as f:
        f.write(f"{utime0},1.0,2.0,3.0,0.0,0.0,0.0\n")
        f.write(f"{utime0 + 100_000},1.5,2.0,3.0,0.0,0.0,0.0\n")

    dec, inten = decode_nclt_bin(str(p))
    np.testing.assert_allclose(dec, xyz, atol=0.0051)  # 5 mm quantisation
    np.testing.assert_array_equal(inten, [7, 8, 9])

    seq = NcltSequence(str(tmp_path))
    assert len(seq) == 2
    gs = list(seq.groups(blind=1.0))
    assert gs
    g = gs[0]
    # ms25 columns: accel [4:7], gyro [7:10]
    np.testing.assert_allclose(g["imu_acc"][0], [1.5, 2.5, 9.5])
    np.testing.assert_allclose(g["imu_gyr"][0], [0.07, 0.08, 0.09])
    assert len(g["pts"]) == 2  # blind point culled
    t, gt = seq.ground_truth()
    np.testing.assert_allclose(gt[0, :3], [1.0, 2.0, 3.0])


def test_nclt_scaling_golden():
    """Hand-checked scaling: u16 value 20000 -> 20000*0.005-100 = 0 m;
    24600 -> 23.0 m; 0 -> -100 m."""
    from better_fastlio2_tpu.io.nclt import decode_nclt_bin
    import tempfile

    rec = struct.pack("<HHHBB", 20000, 24600, 0, 42, 1)
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(rec)
        name = f.name
    xyz, inten = decode_nclt_bin(name)
    os.unlink(name)
    np.testing.assert_allclose(xyz[0], [0.0, 23.0, -100.0], atol=1e-6)
    assert inten[0] == 42


def test_handler_dispatch_honors_lidar_and_livox_type():
    """The yaml keys lidar_type/livox_type are authoritative for decode
    selection (Preprocess::process dispatch, preprocess.cpp:51-63 +
    config/hap_ros.yaml's livox_type split)."""
    from better_fastlio2_tpu.config import LIOConfig
    from better_fastlio2_tpu.io import preprocess as pp

    cfg = LIOConfig()
    assert pp.handler_for(cfg.preprocess) is pp.preprocess_livox
    cfg.preprocess.livox_type = 2
    assert pp.handler_for(cfg.preprocess) is pp.preprocess_livox_ros
    cfg.preprocess.lidar_type = 2
    assert pp.handler_for(cfg.preprocess) is pp.preprocess_velodyne
    cfg.preprocess.lidar_type = 3
    assert pp.handler_for(cfg.preprocess) is pp.preprocess_ouster
    cfg.preprocess.lidar_type = 4
    assert pp.handler_for(cfg.preprocess) is pp.preprocess_robosense

    # the shipped hap_ros.yaml selects the PointCloud2 decode
    import os
    from better_fastlio2_tpu.config import load_yaml
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hap = load_yaml(os.path.join(repo, "configs", "hap_ros.yaml"))
    assert pp.handler_for(hap.preprocess) is pp.preprocess_livox_ros


def test_livox_ros_decode_gates():
    """livoxros_handler behavior (preprocess.cpp:477-526): line/tag
    gates, duplicate suppression, blind cull, zero per-point time."""
    from better_fastlio2_tpu.io.preprocess import preprocess_livox_ros

    rng = np.random.default_rng(3)
    n = 500
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts[5] = pts[4]  # consecutive duplicate -> suppressed
    pts[10] = [0.5, 0.5, 0.5]  # inside blind radius
    tag = np.full(n, 0x10, np.uint8)
    tag[20:40] = 0x20  # bad return type
    line = np.zeros(n, np.int64)
    line[50:60] = 9  # beyond n_scans
    p, t, i = preprocess_livox_ros(pts, np.ones(n, np.float32), tag, line,
                                   n_scans=6, blind=4.0, point_filter_num=1)
    assert np.all(t == 0.0)
    kept = len(p)
    assert kept <= n - 20 - 10 - 2  # tag + line + dup/blind culls
    assert np.all(np.linalg.norm(p, axis=1) > 4.0)


def test_camera_model_from_yaml_block():
    """camera: yaml block -> CameraModel (paramSetting,
    laserMapping.cpp:279-290; config/hap_ros.yaml layout)."""
    import os

    import yaml

    from better_fastlio2_tpu.perception.colorize import CameraModel

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blk = yaml.safe_load(open(os.path.join(repo, "configs",
                                           "hap_ros.yaml")))["camera"]
    cam = CameraModel.from_config(blk, width=1280, height=720)
    assert cam.intrinsics.shape == (3, 4) and cam.extrinsics.shape == (4, 4)
    # a point straight ahead of the LiDAR projects inside the image
    uv, depth, ok = cam.project(np.array([[5.0, 0.0, 0.0]]))
    assert bool(ok[0]) and depth[0] > 0
    assert 0 <= uv[0, 0] < 1280 and 0 <= uv[0, 1] < 720
