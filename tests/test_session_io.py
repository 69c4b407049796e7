"""Session persistence round-trip tests: PCD (binary + ascii + native
writer cross-read), SCD precision, g2o, KITTI pose rows, full
writer/reader cycle — the inter-application API (SURVEY.md §1)."""

import os
import tempfile

import numpy as np

from better_fastlio2_tpu.io import native
from better_fastlio2_tpu.io.pcd import read_pcd, write_pcd
from better_fastlio2_tpu.io.session import (
    SessionReader,
    SessionWriter,
    kitti_pose_line,
    read_g2o,
    read_scd,
    write_g2o,
    write_scd,
)


def test_pcd_roundtrip_binary_and_ascii(rng):
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 500).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        for binary in (True, False):
            p = os.path.join(td, f"x_{binary}.pcd")
            write_pcd(p, xyz, inten, binary=binary)
            x2, i2 = read_pcd(p)
            np.testing.assert_allclose(x2, xyz, atol=1e-5)
            np.testing.assert_allclose(i2, inten, atol=1e-4)


def test_native_pcd_cross_read(rng):
    if not native.available():
        return
    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "n.pcd")
        native.write_pcd_xyzi(p, xyz, None)
        x2, _ = read_pcd(p)
        np.testing.assert_array_equal(x2, xyz)


def test_scd_precision(rng):
    """SCD files carry 3 decimals (Scancontext.cpp:523; the precision
    warning of laserMapping.cpp:941)."""
    desc = rng.uniform(0, 8, size=(20, 60))
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "000000.scd")
        write_scd(p, desc)
        d2 = read_scd(p)
        assert d2.shape == (20, 60)
        np.testing.assert_allclose(d2, np.round(desc, 3), atol=5e-4)


def test_g2o_roundtrip(rng):
    poses = np.zeros((5, 7))
    poses[:, 0] = 1.0
    poses[:, 4:7] = rng.normal(size=(5, 3))
    edges = [(0, 1, poses[1]), (1, 2, poses[2]), (0, 4, poses[4])]
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "g.g2o")
        write_g2o(p, poses, edges)
        # reference line format check
        lines = open(p).read().splitlines()
        assert lines[0].startswith("VERTEX_SE3:QUAT 0 ")
        assert any(ln.startswith("EDGE_SE3:QUAT 0 4 ") for ln in lines)
        p2, e2 = read_g2o(p)
        np.testing.assert_allclose(p2, poses, atol=1e-5)
        assert len(e2) == 3 and e2[2][0] == 0 and e2[2][1] == 4


def test_kitti_pose_line():
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    row = kitti_pose_line(R, t)
    vals = np.array([float(v) for v in row.split()])
    assert len(vals) == 12
    np.testing.assert_allclose(vals.reshape(3, 4)[:, 3], t)


def test_session_writer_reader_cycle(rng):
    with tempfile.TemporaryDirectory() as td:
        w = SessionWriter(root=td)
        for k in range(3):
            cloud = rng.normal(size=(100, 3)).astype(np.float32)
            desc = rng.uniform(0, 5, (20, 60))
            pose = np.array([1.0, 0, 0, 0, k * 1.0, 0, 0])
            w.add_keyframe(cloud, np.zeros(100), desc, pose)
            if k:
                w.add_edge(k - 1, k, np.array([1.0, 0, 0, 0, 1.0, 0, 0]))
        w.save()
        r = SessionReader(td)
        assert r.num_keyframes == 3
        assert len(r.edges) == 2
        xyz, _ = r.cloud(1)
        assert xyz.shape == (100, 3)
        assert r.scd(2).shape == (20, 60)
        gm, _ = r.global_map()
        assert len(gm) == 300
        assert os.path.exists(os.path.join(td, "poses_kitti.txt"))
