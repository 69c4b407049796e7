"""Sparse ICP (p-norm ADMM) + the FRICP regMode registry
(ops/icp.py icp_sparse / register_run; reference:
include/FRICP-toolkit/ICP.h:275-470, registeration.h:20-27)."""

import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.ops import icp as icp_ops
from better_fastlio2_tpu.utils import se3, so3


def make_scene(rng, n=1500, outlier_frac=0.0):
    """Structured target (two walls + floor) + transformed source with
    optional gross outliers in the source."""
    f = n // 3
    pts = np.concatenate([
        np.stack([rng.uniform(-5, 5, f), rng.uniform(-5, 5, f),
                  np.zeros(f)], 1),
        np.stack([np.full(f, 5.0), rng.uniform(-5, 5, f),
                  rng.uniform(0, 3, f)], 1),
        np.stack([rng.uniform(-5, 5, n - 2 * f), np.full(n - 2 * f, -5.0),
                  rng.uniform(0, 3, n - 2 * f)], 1),
    ]).astype(np.float32)
    yaw = 0.12
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    t = np.array([0.4, -0.25, 0.12])
    src = ((pts - t) @ Rz).astype(np.float32)  # src s.t. Rz^T... build below
    # define true pose mapping source -> target: p_t = R p_s + t
    R = Rz
    src = (pts - t) @ R  # p_s = R^T (p_t - t)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        src = src.copy()
        src[idx] = rng.uniform(-8, 8, (n_out, 3))
    true_pose = np.concatenate([
        np.asarray(so3.matrix_to_quat(jnp.asarray(R, jnp.float32))),
        t]).astype(np.float32)
    return (jnp.asarray(src, jnp.float32), jnp.asarray(pts, jnp.float32),
            true_pose)


def pose_err(pose, true_pose):
    d = se3.compose(jnp.asarray(pose),
                    se3.inverse(jnp.asarray(true_pose, pose.dtype)))
    d = np.asarray(d)
    ang = 2 * np.arccos(np.clip(abs(d[0]), -1, 1))
    return float(np.linalg.norm(d[4:7])), float(ang)


def test_sparse_icp_parity_clean():
    rng = np.random.default_rng(0)
    src, tgt, true_pose = make_scene(rng)
    v = jnp.ones(len(src), bool)
    init = se3.identity(jnp.float32)
    res_s = icp_ops.icp_sparse(src, v, tgt, v, init, p=0.4, voxel=1.0,
                               max_corr=5.0)
    res_p = icp_ops.icp_point2plane(src, v, tgt, v, init, voxel=1.0,
                                    max_corr=5.0, iters=25)
    ts, angs = pose_err(res_s.pose, true_pose)
    tp, angp = pose_err(res_p.pose, true_pose)
    assert ts < 0.08, (ts, angs)
    assert angs < 0.03
    # parity-class accuracy with the point-to-plane solver on clean data
    assert ts < max(2.5 * tp, 0.08)


def test_sparse_icp_beats_p2plane_on_outliers():
    rng = np.random.default_rng(1)
    src, tgt, true_pose = make_scene(rng, outlier_frac=0.5)
    v = jnp.ones(len(src), bool)
    init = se3.identity(jnp.float32)
    res_s = icp_ops.icp_sparse(src, v, tgt, v, init, p=0.4, voxel=1.0,
                               max_corr=5.0)
    res_p = icp_ops.icp_point2plane(src, v, tgt, v, init, voxel=1.0,
                                    max_corr=5.0, iters=25)
    ts, _ = pose_err(res_s.pose, true_pose)
    tp, _ = pose_err(res_p.pose, true_pose)
    assert ts < 0.15, ts
    assert ts < tp * 0.8, (ts, tp)  # sparse materially better at 50% outliers


def test_sparse_icp_point_to_plane_variant():
    rng = np.random.default_rng(2)
    src, tgt, true_pose = make_scene(rng, outlier_frac=0.3)
    v = jnp.ones(len(src), bool)
    res = icp_ops.icp_sparse(src, v, tgt, v, se3.identity(jnp.float32),
                             p=0.4, point_to_plane=True, voxel=1.0)
    ts, ang = pose_err(res.pose, true_pose)
    assert ts < 0.15, (ts, ang)


@pytest.mark.parametrize("mode", list(range(9)))
def test_registry_all_modes_converge(mode):
    rng = np.random.default_rng(3)
    src, tgt, true_pose = make_scene(rng, n=900)
    v = jnp.ones(len(src), bool)
    res = icp_ops.register_run(mode, src, v, tgt, v,
                               se3.identity(jnp.float32), voxel=1.0,
                               iters=25)
    ts, ang = pose_err(res.pose, true_pose)
    assert ts < 0.25, (icp_ops.REG_MODES[mode], ts, ang)


def test_registry_name_dispatch():
    rng = np.random.default_rng(4)
    src, tgt, true_pose = make_scene(rng, n=600)
    v = jnp.ones(len(src), bool)
    res = icp_ops.register_run("ricp", src, v, tgt, v,
                               se3.identity(jnp.float32), voxel=1.0)
    ts, _ = pose_err(res.pose, true_pose)
    assert ts < 0.25
