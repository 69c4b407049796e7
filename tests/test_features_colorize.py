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
