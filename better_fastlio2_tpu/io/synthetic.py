"""Synthetic LiDAR-inertial world for integration tests and benchmarks.

The reference validates only by rosbag replay on real datasets (SURVEY.md
§4 — it has no automated tests).  This module provides what the reference
never had: a closed-loop simulator with analytic ground truth, so the full
pipeline (propagation, undistortion, association, update, mapping) can be
regression-tested to centimetre ATE bounds in CI without dataset downloads.

World: points sampled on large planes (floor + walls) — ideal for the
point-to-plane model.  Trajectory: analytic position/yaw with exact IMU
(specific force + body rates) generated from the same kinematic
conventions the filter integrates (core/esikf.get_f).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

GRAVITY = 9.809
G_VEC = np.array([0.0, 0.0, -GRAVITY])

__all__ = ["SyntheticWorld", "Trajectory", "make_lio_sequence"]


class SyntheticWorld:
    """Box room: floor z=0, walls at x=±hx, y=±hy, ceiling z=hz."""

    def __init__(
        self,
        seed: int = 0,
        half_x: float = 30.0,
        half_y: float = 30.0,
        height: float = 8.0,
        density: float = 40.0,  # points per m^2
    ):
        rng = np.random.default_rng(seed)
        planes = []

        def patch(origin, u, v, lu, lv):
            n = max(int(lu * lv * density), 16)
            a = rng.uniform(0, lu, size=n)
            b = rng.uniform(0, lv, size=n)
            return origin + a[:, None] * u + b[:, None] * v

        o = np.array
        planes.append(patch(o([-half_x, -half_y, 0.0]), o([1.0, 0, 0]),
                            o([0, 1.0, 0]), 2 * half_x, 2 * half_y))  # floor
        planes.append(patch(o([-half_x, -half_y, height]), o([1.0, 0, 0]),
                            o([0, 1.0, 0]), 2 * half_x, 2 * half_y))  # ceiling
        for sx in (-1, 1):
            planes.append(
                patch(o([sx * half_x, -half_y, 0.0]), o([0, 1.0, 0]),
                      o([0, 0, 1.0]), 2 * half_y, height)
            )
        for sy in (-1, 1):
            planes.append(
                patch(o([-half_x, sy * half_y, 0.0]), o([1.0, 0, 0]),
                      o([0, 0, 1.0]), 2 * half_x, height)
            )
        self.points = np.concatenate(planes).astype(np.float64)

    def scan(
        self,
        pos_of_t,
        rot_of_t,
        t0: float,
        duration: float,
        n_points: int,
        max_range: float = 50.0,
        min_range: float = 1.0,
        noise: float = 0.0,
        rng: np.random.Generator | None = None,
    ):
        """Simulate one sweep: each point sampled at its own time within
        [t0, t0+duration) from the continuously-moving sensor.

        Returns (pts_lidar (n,3), t_offsets (n,)) — lidar-frame points with
        per-point capture-time offsets, like the reference's `curvature`
        channel (preprocess.cpp per-vendor handlers)."""
        rng = rng or np.random.default_rng(1)
        tofs = np.sort(rng.uniform(0, duration, size=n_points))
        idx = rng.integers(0, len(self.points), size=n_points)
        pw = self.points[idx]
        out = np.empty((n_points, 3))
        # vectorized over unique-ish times: chunk into 32 time slices
        n_slices = 32
        sl = np.minimum((tofs / duration * n_slices).astype(int), n_slices - 1)
        for s in range(n_slices):
            m = sl == s
            if not m.any():
                continue
            tm = t0 + (s + 0.5) * duration / n_slices
            R = rot_of_t(tm)
            p = pos_of_t(tm)
            out[m] = (pw[m] - p) @ R  # R^T (pw - p)
        if noise:
            out += rng.normal(scale=noise, size=out.shape)
        rng_ok = np.linalg.norm(out, axis=1)
        keep = (rng_ok > min_range) & (rng_ok < max_range)
        return out[keep], tofs[keep]


@dataclass
class Trajectory:
    """Analytic trajectory: stationary for t_still, then constant forward
    speed with sinusoidal yaw — smooth, fully differentiable."""

    t_still: float = 1.2
    speed: float = 2.0
    yaw_amp: float = 0.3
    yaw_freq: float = 0.25
    height: float = 1.5

    def _tau(self, t):
        return max(t - self.t_still, 0.0)

    def pos(self, t):
        tau = self._tau(t)
        w = 2 * np.pi * self.yaw_freq
        # integrate heading analytically via small-step quadrature cache-free
        # (cheap: called at IMU rate only)
        n = max(int(tau * 200), 1)
        ts = np.linspace(0, tau, n + 1)
        yaws = self.yaw_amp * np.sin(w * ts)
        dirs = np.stack([np.cos(yaws), np.sin(yaws)], axis=1)
        xy = self.speed * np.trapezoid(dirs, ts, axis=0) if tau > 0 else np.zeros(2)
        return np.array([xy[0], xy[1], self.height])

    def yaw(self, t):
        tau = self._tau(t)
        return self.yaw_amp * np.sin(2 * np.pi * self.yaw_freq * tau)

    def rot(self, t):
        c, s = np.cos(self.yaw(t)), np.sin(self.yaw(t))
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    def vel(self, t):
        tau = self._tau(t)
        if tau <= 0:
            return np.zeros(3)
        y = self.yaw(t)
        return self.speed * np.array([np.cos(y), np.sin(y), 0.0])

    def acc_world(self, t):
        tau = self._tau(t)
        if tau <= 0:
            return np.zeros(3)
        w = 2 * np.pi * self.yaw_freq
        yd = self.yaw_amp * w * np.cos(w * tau)
        y = self.yaw(t)
        return self.speed * yd * np.array([-np.sin(y), np.cos(y), 0.0])

    def gyro_body(self, t):
        tau = self._tau(t)
        if tau <= 0:
            return np.zeros(3)
        w = 2 * np.pi * self.yaw_freq
        return np.array([0.0, 0.0, self.yaw_amp * w * np.cos(w * tau)])

    def imu_sample(self, t, rng=None, acc_noise=0.0, gyr_noise=0.0):
        """Specific force + body rate: acc = R^T (a_w - g_vec)."""
        R = self.rot(t)
        acc = R.T @ (self.acc_world(t) - G_VEC)
        gyr = self.gyro_body(t)
        if rng is not None:
            acc = acc + rng.normal(scale=acc_noise, size=3)
            gyr = gyr + rng.normal(scale=gyr_noise, size=3)
        return acc, gyr


def make_lio_sequence(
    duration: float = 8.0,
    scan_rate: float = 10.0,
    imu_rate: float = 100.0,
    n_points: int = 8000,
    seed: int = 0,
    noise: float = 0.005,
    traj: Trajectory | None = None,
    world: SyntheticWorld | None = None,
):
    """Generate a full synchronized sequence of (scan, imu) measurement
    groups, the sync_packages analog (laserMapping.cpp:1374).

    Yields dicts with keys: pts, pt_t, imu_acc, imu_gyr, imu_t,
    scan_beg_abs, scan_end_t, gt_pos, gt_rot (ground truth at scan end).
    """
    rng = np.random.default_rng(seed)
    traj = traj or Trajectory()
    world = world or SyntheticWorld(seed=seed)
    scan_T = 1.0 / scan_rate
    imu_T = 1.0 / imu_rate
    groups = []
    n_scans = int(duration * scan_rate)
    for k in range(n_scans):
        t0 = k * scan_T
        t1 = t0 + scan_T
        pts, pt_t = world.scan(
            traj.pos, traj.rot, t0, scan_T, n_points, noise=noise, rng=rng
        )
        # IMU samples covering [t0 - imu_T, t1] (head = prev packet tail)
        ts = np.arange(np.floor(t0 / imu_T) * imu_T - imu_T, t1 + 1e-9, imu_T)
        samples = [traj.imu_sample(t, rng, 0.01, 0.001) for t in ts]
        acc = np.stack([s[0] for s in samples])
        gyr = np.stack([s[1] for s in samples])
        groups.append(
            dict(
                pts=pts,
                pt_t=pt_t,
                imu_acc=acc,
                imu_gyr=gyr,
                imu_t=ts - t0,
                scan_beg_abs=t0,
                scan_end_t=scan_T,
                gt_pos=traj.pos(t1),
                gt_rot=traj.rot(t1),
            )
        )
    return groups
