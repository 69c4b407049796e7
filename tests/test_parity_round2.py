"""Round-2 parity fixes: true SE3 RPE, rotational RPE, full
PointTypePose transformations.pcd rows, mat_pre/mat_out state in the
pipeline readback."""

import numpy as np

from better_fastlio2_tpu.io.evaluate import rpe, rpe_rot
from better_fastlio2_tpu.io.pcd import read_pcd_fields, write_pcd_fields


def _traj(n, yaw_rate=0.0, yaw_err=0.0):
    """(N,7) [wxyz|t] helix-free planar trajectory with optional
    per-frame yaw-rate error."""
    poses = np.zeros((n, 7))
    yaw = 0.0
    pos = np.zeros(3)
    for k in range(n):
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        poses[k, 0:4] = q
        poses[k, 4:7] = pos
        heading = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        pos = pos + 0.1 * heading
        yaw += yaw_rate + yaw_err
    return poses


def test_rpe_zero_on_identical():
    gt = _traj(50, yaw_rate=0.02)
    assert rpe(gt, gt, delta=5) < 1e-12
    assert rpe_rot(gt, gt, delta=5) < 1e-6


def test_rpe_rot_catches_rotation_drift():
    """The old displacement-magnitude metric was blind to pure rotation
    drift (VERDICT weak #5): a trajectory with identical step lengths
    but a yaw-rate error must now show BOTH rotational RPE and (via the
    body-frame expression) translational RPE."""
    gt = _traj(80, yaw_rate=0.0)
    est = _traj(80, yaw_rate=0.0, yaw_err=0.01)
    # step lengths identical -> the old magnitude-difference metric = 0
    de = np.linalg.norm(np.diff(est[:, 4:7], axis=0), axis=1)
    dg = np.linalg.norm(np.diff(gt[:, 4:7], axis=0), axis=1)
    assert np.allclose(de, dg, atol=1e-12)
    assert rpe_rot(est, gt, delta=10) > 1.0  # degrees
    assert rpe(est, gt, delta=10) > 0.01  # metres


def test_rpe_positions_fallback():
    gt = _traj(40)[:, 4:7]
    est = gt + np.random.default_rng(0).normal(scale=0.01, size=gt.shape)
    assert 0.0 < rpe(est, gt, delta=5) < 0.1


def test_transformations_pcd_full_6d(tmp_path):
    """transformations.pcd carries full PointTypePose rows
    (x y z intensity roll pitch yaw time) like the reference's
    cloudKeyPoses6D export (laserMapping.cpp:2533-2538)."""
    from better_fastlio2_tpu.io.session import SessionWriter

    w = SessionWriter(root=str(tmp_path))
    rng = np.random.default_rng(3)
    for k in range(4):
        cloud = rng.normal(size=(50, 3)).astype(np.float32)
        yaw = 0.3 * k
        pose = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2),
                         1.0 * k, 0.5 * k, 0.1])
        w.add_keyframe(cloud, np.zeros(50), np.zeros((20, 60)), pose,
                       t=100.0 + k)
    w.save()
    fields, data = read_pcd_fields(str(tmp_path / "transformations.pcd"))
    assert fields == ["x", "y", "z", "intensity", "roll", "pitch", "yaw",
                      "time"]
    assert data.shape == (4, 8)
    np.testing.assert_allclose(data[:, 0], np.arange(4) * 1.0, atol=1e-6)
    np.testing.assert_allclose(data[:, 3], np.arange(4), atol=1e-6)
    np.testing.assert_allclose(data[:, 6], 0.3 * np.arange(4), atol=1e-5)
    np.testing.assert_allclose(data[:, 7], 100.0 + np.arange(4), atol=1e-4)
    # roll/pitch zero for pure-yaw poses
    np.testing.assert_allclose(data[:, 4:6], 0.0, atol=1e-6)


def test_pcd_fields_roundtrip(tmp_path):
    data = np.arange(24, dtype=np.float32).reshape(3, 8)
    f = ["x", "y", "z", "intensity", "roll", "pitch", "yaw", "time"]
    p = str(tmp_path / "t.pcd")
    write_pcd_fields(p, f, data)
    f2, d2 = read_pcd_fields(p)
    assert f2 == f
    np.testing.assert_array_equal(d2, data)
    # the generic xyz reader still parses it
    from better_fastlio2_tpu.io.pcd import read_pcd

    xyz, inten = read_pcd(p)
    np.testing.assert_allclose(xyz, data[:, :3])
