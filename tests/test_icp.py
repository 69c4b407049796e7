"""ICP registration tests: recover known transforms on synthetic clouds."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.ops import icp
from better_fastlio2_tpu.utils import se3, so3


def make_structured_cloud(rng, n=3000):
    """Floor + two walls (planes in 3 orientations, so pose is observable)."""
    k = n // 3
    floor = np.stack(
        [rng.uniform(-8, 8, k), rng.uniform(-8, 8, k), np.zeros(k)], 1
    )
    wall1 = np.stack(
        [rng.uniform(-8, 8, k), np.full(k, 8.0), rng.uniform(0, 4, k)], 1
    )
    wall2 = np.stack(
        [np.full(k, -8.0), rng.uniform(-8, 8, k), rng.uniform(0, 4, k)], 1
    )
    return np.concatenate([floor, wall1, wall2])


def true_pose(dtype=jnp.float64):
    q = so3.quat_exp(jnp.asarray([0.02, -0.03, 0.15], dtype))
    return se3.make(q, jnp.asarray([0.4, -0.3, 0.1], dtype))


def _run(method, rng, welsch=0.0):
    target = make_structured_cloud(rng)
    T = true_pose()
    # source = T^-1 target (so that T maps source -> target)
    src = np.asarray(se3.apply(se3.inverse(T), jnp.asarray(target)))
    src = src + rng.normal(scale=0.005, size=src.shape)
    res = method(
        jnp.asarray(src),
        jnp.ones(len(src), bool),
        jnp.asarray(target),
        jnp.ones(len(target), bool),
        se3.identity(jnp.float64),
        max_corr=2.0,
        welsch_sigma=welsch,
    )
    err = se3.between(T, res.pose)
    t_err = float(jnp.linalg.norm(se3.trans(err)))
    r_err = float(jnp.linalg.norm(so3.quat_log(se3.rot(err))))
    return res, t_err, r_err


def test_point2plane_recovers_pose(rng):
    res, t_err, r_err = _run(icp.icp_point2plane, rng)
    assert t_err < 0.02, f"t_err {t_err}"
    assert r_err < 0.01, f"r_err {r_err}"
    assert float(res.fitness) < 0.05  # bucket-capped map leaves a few far NNs


def test_point2point_recovers_pose(rng):
    res, t_err, r_err = _run(icp.icp_point2point, rng)
    assert t_err < 0.05, f"t_err {t_err}"
    assert r_err < 0.02, f"r_err {r_err}"


def test_welsch_robust_to_outliers(rng):
    target = make_structured_cloud(rng)
    T = true_pose()
    src = np.asarray(se3.apply(se3.inverse(T), jnp.asarray(target)))
    # 20% gross outliers
    n_out = len(src) // 5
    idx = rng.choice(len(src), n_out, replace=False)
    src2 = src.copy()
    src2[idx] += rng.uniform(3, 6, size=(n_out, 3))
    res = icp.icp_point2plane(
        jnp.asarray(src2),
        jnp.ones(len(src2), bool),
        jnp.asarray(target),
        jnp.ones(len(target), bool),
        se3.identity(jnp.float64),
        max_corr=2.0,
        welsch_sigma=0.3,
    )
    err = se3.between(T, res.pose)
    assert float(jnp.linalg.norm(se3.trans(err))) < 0.05


def test_fitness_reflects_misalignment(rng):
    target = make_structured_cloud(rng)
    src = target.copy()
    from better_fastlio2_tpu.map import voxel_hash

    m = voxel_hash.make_map(capacity_log2=14, bucket=32, voxel_size=1.0,
                            dtype=jnp.float64)
    m = voxel_hash.insert(m, jnp.asarray(target), jnp.ones(len(target), bool))
    fit0, _ = icp.fitness_score(
        m, jnp.asarray(src), jnp.ones(len(src), bool), 2.0
    )
    fit1, _ = icp.fitness_score(
        m, jnp.asarray(src + [0.3, 0, 0]), jnp.ones(len(src), bool), 2.0
    )
    assert float(fit0) < 1e-9  # exact self-match with roomy buckets
    assert float(fit1) > float(fit0)


def test_point2plane_aa_recovers_pose(rng):
    """Anderson-accelerated FRICP-style registration reaches the same
    optimum, and does it in fewer iterations than plain GN ICP."""
    from functools import partial

    res, t_err, r_err = _run(
        partial(icp.icp_point2plane_aa, iters=20), rng, welsch=0.5)
    assert t_err < 0.02, f"t_err {t_err}"
    assert r_err < 0.01, f"r_err {r_err}"

    # few-iteration budget: AA should be at least as converged as plain
    rng2 = np.random.default_rng(7)
    _, t_aa, r_aa = _run(
        partial(icp.icp_point2plane_aa, iters=6), rng2, welsch=0.5)
    rng2 = np.random.default_rng(7)
    _, t_gn, r_gn = _run(
        partial(icp.icp_point2plane, iters=6), rng2, welsch=0.5)
    assert t_aa <= t_gn * 1.5 + 1e-4
    assert t_aa < 0.05
