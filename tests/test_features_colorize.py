"""Tests for LOAM feature extraction and camera colorization."""

import numpy as np

from better_fastlio2_tpu.io.features import extract_features
from better_fastlio2_tpu.perception.colorize import (
    CameraModel,
    colorize_cloud,
    points_in_boxes,
)


def test_feature_extraction_separates_wall_and_corner(rng):
    """A scan ring crossing a 90-degree corner: flat runs become plane
    features, the corner becomes an edge feature."""
    # ring: points along wall y=5 (x from -5..0) then wall x=0 (y 5..0)
    n1 = np.stack([np.linspace(-5, -0.01, 100), np.full(100, 5.0)], 1)
    n2 = np.stack([np.full(100, -0.01), np.linspace(5, 0.5, 100)], 1)
    xy = np.concatenate([n1, n2])
    pts = np.concatenate([xy, np.zeros((200, 1))], 1)
    ring = np.zeros(200, int)
    plane, edge = extract_features(pts, ring, plane_thresh=1e-6,
                                   edge_thresh=1e-4)
    # most wall points are planes
    assert plane[10:80].mean() > 0.8
    assert plane[120:190].mean() > 0.8
    # the corner region (index ~100) has an edge, flat runs don't
    assert edge[90:110].any()
    assert not edge[10:60].any()


def test_colorize_and_boxes(rng):
    K = np.array([[500.0, 0, 320, 0], [0, 500, 240, 0], [0, 0, 1, 0]])
    T = np.eye(4)  # camera at lidar origin, z forward
    cam = CameraModel(intrinsics=K, extrinsics=T, width=640, height=480)
    img = np.zeros((480, 640, 3), np.uint8)
    img[:, :320] = (255, 0, 0)  # left half blue (BGR)
    img[:, 320:] = (0, 0, 255)  # right half red

    pts = np.array(
        [
            [-1.0, 0.0, 5.0],  # projects left
            [1.0, 0.0, 5.0],  # projects right
            [0.0, 0.0, -5.0],  # behind camera
        ]
    )
    rgb, ok = colorize_cloud(cam, img, pts)
    assert ok[0] and ok[1] and not ok[2]
    assert tuple(rgb[0]) == (0, 0, 255)  # blue pixel -> RGB
    assert tuple(rgb[1]) == (255, 0, 0)

    boxes = np.array([[300, 200, 640, 480]])  # right-ish half
    hit = points_in_boxes(cam, pts, boxes, probs=np.array([0.9]))
    assert not hit[0] and hit[1] and not hit[2]
    # low-probability box ignored (reference gate 0.6)
    hit2 = points_in_boxes(cam, pts, boxes, probs=np.array([0.5]))
    assert not hit2.any()


def test_reference_configs_load():
    """The ported reference YAML configs parse through LIOConfig.from_dict
    with the expected values."""
    import os

    from better_fastlio2_tpu.config import load_yaml

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    kitti = load_yaml(os.path.join(root, "velodyne64_kitti.yaml"))
    assert kitti.preprocess.lidar_type == 2
    assert kitti.mapping.det_range == 100.0
    assert abs(kitti.mapping.extrinsic_T[0] + 0.8086759) < 1e-6
    assert kitti.loop.enable is False

    v16 = load_yaml(os.path.join(root, "velodyne16.yaml"))
    assert v16.preprocess.point_filter_num == 4
    assert v16.mapping.cube_len == 1500
    assert v16.loop.fitness_score == 0.2

    mulran = load_yaml(os.path.join(root, "mulran.yaml"))
    assert mulran.preprocess.lidar_type == 3
    assert mulran.mapping.extrinsic_R[0] == -1
    assert mulran.ikdtree.filter_size_map_min == 0.3

    hap = load_yaml(os.path.join(root, "hap_livox.yaml"))
    assert hap.preprocess.lidar_type == 1
    assert hap.preprocess.time_unit == 1


def test_feature_filter_pipeline_integration():
    """feature_extract_enable reduces the scan to plane features on the
    host before the filter and the pipeline still tracks (the reference's
    give_feature surf-cloud path, preprocess.cpp:528)."""
    import numpy as np

    from better_fastlio2_tpu.io.features import feature_filter
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline
    from tests.test_lio_pipeline import small_cfg

    groups = list(make_lio_sequence(
        duration=1.5, scan_rate=10.0, imu_rate=100.0, n_points=4000, seed=5,
        noise=0.003, traj=Trajectory(t_still=0.5, speed=1.5)))

    g = groups[3]
    fp, ft = feature_filter(np.asarray(g["pts"], np.float32),
                            np.asarray(g["pt_t"]), n_rings=16)
    assert 200 <= len(fp) < len(g["pts"])  # strictly reduced, not empty
    assert len(fp) == len(ft)

    cfg = small_cfg()
    cfg.preprocess.feature_extract_enable = True
    pipe = LIOPipeline(cfg)
    origin = np.array([0.0, 0.0, 1.5])
    last = None
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"])
        if out is not None:
            last = (out, g)
    assert last is not None
    err = np.linalg.norm(last[0]["pos"] - (last[1]["gt_pos"] - origin))
    # the simulator samples surfaces randomly (not sweep-ordered), so the
    # smoothness statistic is noisy and feature selection degrades
    # tracking vs the full cloud; this test validates the host-side
    # wiring (reduction + stable pipeline), not feature quality — that is
    # test_feature_extraction_separates_wall_and_corner on structured
    # sweeps, and real sweep-ordered data downstream
    assert np.isfinite(err) and err < 5.0, f"feature path diverged: {err:.3f} m"
