"""Camera point-cloud colorization + detection-box tagging.

Behavioral analog of the reference's camera path (reference:
src/laserMapping.cpp:231-392): a cached BGR image plus darknet person
bounding boxes (BoxCallback :292, probability > 0.6) colorize the
world-frame cloud — each LiDAR point is projected through the 3x4
intrinsic and 4x4 camera-from-LiDAR extrinsic (paramSetting :279,
yaml `camera:` block of config/mulran.yaml) and samples the pixel color;
points falling inside detection boxes are tagged (the reference colors
them red and can exclude them).

Pure numpy (host path — image-rate work, off the device hot loop).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["CameraModel", "colorize_cloud", "points_in_boxes"]


@dataclass
class CameraModel:
    intrinsics: np.ndarray  # (3, 4) projection matrix
    extrinsics: np.ndarray  # (4, 4) camera_T_lidar
    width: int
    height: int

    @classmethod
    def from_config(cls, cam_block: dict, width: int = 1280,
                    height: int = 720) -> "CameraModel":
        """Build from a reference-style yaml `camera:` block
        (config/hap_ros.yaml, config/mulran.yaml): `camera_internal` is
        the flattened 3x4 projection, `camera_external` the flattened
        4x4 camera-from-LiDAR transform (paramSetting,
        laserMapping.cpp:279-290)."""
        K = np.asarray(cam_block["camera_internal"], float).reshape(3, 4)
        T = np.asarray(cam_block["camera_external"], float).reshape(4, 4)
        return cls(intrinsics=K, extrinsics=T, width=int(width),
                   height=int(height))

    def project(self, pts_lidar: np.ndarray):
        """Returns (uv (N,2) float, depth (N,), in_image (N,))."""
        homo = np.concatenate(
            [pts_lidar, np.ones((len(pts_lidar), 1))], axis=1
        )
        cam = (self.extrinsics @ homo.T).T  # (N, 4)
        pix = (self.intrinsics @ cam.T).T  # (N, 3)
        depth = pix[:, 2]
        safe = np.where(np.abs(depth) > 1e-6, depth, 1e-6)
        uv = pix[:, :2] / safe[:, None]
        ok = (
            (depth > 0)
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < self.width - 1)
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < self.height - 1)
        )
        return uv, depth, ok


def colorize_cloud(
    cam: CameraModel, image_bgr: np.ndarray, pts_lidar: np.ndarray
):
    """Returns (rgb (N,3) uint8, valid (N,)) — nearest-pixel sampling like
    the reference (laserMapping.cpp:340-366)."""
    uv, depth, ok = cam.project(pts_lidar)
    u = np.clip(uv[:, 0].astype(int), 0, cam.width - 1)
    v = np.clip(uv[:, 1].astype(int), 0, cam.height - 1)
    bgr = image_bgr[v, u]
    rgb = bgr[:, ::-1].copy()
    rgb[~ok] = 0
    return rgb, ok


def points_in_boxes(
    cam: CameraModel,
    pts_lidar: np.ndarray,
    boxes: np.ndarray,
    probs: np.ndarray | None = None,
    prob_thresh: float = 0.6,
) -> np.ndarray:
    """Bool mask of points projecting inside any accepted detection box.

    boxes: (M, 4) [xmin, ymin, xmax, ymax]; probability gate > 0.6
    matches BoxCallback (laserMapping.cpp:292-302)."""
    uv, depth, ok = cam.project(pts_lidar)
    hit = np.zeros(len(pts_lidar), bool)
    for m in range(len(boxes)):
        if probs is not None and probs[m] <= prob_thresh:
            continue
        x0, y0, x1, y1 = boxes[m]
        hit |= (
            ok
            & (uv[:, 0] >= x0)
            & (uv[:, 0] <= x1)
            & (uv[:, 1] >= y0)
            & (uv[:, 1] <= y1)
        )
    return hit
