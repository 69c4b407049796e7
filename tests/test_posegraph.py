"""Pose-graph GN backend tests: odometry chain + loop closure correction,
mirroring the reference's iSAM2 usage (laserMapping.cpp:550-812) at the
trajectory level (SURVEY.md §7.3: compare trajectories, not internals)."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.backend import posegraph as pg
from better_fastlio2_tpu.utils import se3, so3


def mk_pose(yaw, t):
    q = so3.quat_exp(jnp.asarray([0.0, 0.0, yaw]))
    return se3.make(q, jnp.asarray(t, jnp.float64))


def drifted_square(n_side=10, step=1.0, drift=0.02, rng=None):
    """Ground truth square loop + odometry with accumulating drift."""
    gt = []
    yaw = 0.0
    pos = np.zeros(3)
    gt.append((yaw, pos.copy()))
    for leg in range(4):
        for k in range(n_side):
            pos = pos + np.array(
                [step * np.cos(yaw), step * np.sin(yaw), 0.0]
            )
            gt.append((yaw, pos.copy()))
        yaw += np.pi / 2
    return gt


def test_chain_with_loop_closes():
    gt = drifted_square()
    n = len(gt)
    g = pg.make_graph(max_poses=64, max_priors=4, max_between=128,
                      dtype=jnp.float64)

    rng = np.random.default_rng(0)
    # build noisy odometry estimates
    est = [mk_pose(gt[0][0], gt[0][1])]
    g = pg.set_pose(g, 0, est[0])
    g = pg.add_prior(g, 0, est[0], 1e-6, 1e-6)  # prior noise 1e-12 var
    for k in range(1, n):
        T_prev = mk_pose(gt[k - 1][0], gt[k - 1][1])
        T_cur = mk_pose(gt[k][0], gt[k][1])
        odom = se3.between(T_prev, T_cur)
        # corrupt odometry: small bias per step => drift
        noise = se3.exp(
            jnp.asarray(
                np.concatenate([rng.normal(0, 0.01, 3) + [0.01, 0, 0],
                                rng.normal(0, 0.002, 3)])
            )
        )
        odom_noisy = se3.compose(odom, noise)
        est.append(se3.compose(est[-1], odom_noisy))
        g = pg.set_pose(g, k, est[-1])
        g = pg.add_between(g, k - 1, k, odom_noisy, 1e-2, 1e-3)

    drift_before = float(
        jnp.linalg.norm(se3.trans(est[-1]) - jnp.asarray(gt[-1][1]))
    )
    assert drift_before > 0.2  # drift actually accumulated

    # loop closure: last pose revisits first (gt identical positions?)
    T_last_gt = mk_pose(gt[-1][0], gt[-1][1])
    T_first_gt = mk_pose(gt[0][0], gt[0][1])
    loop_meas = se3.between(T_first_gt, T_last_gt)
    g = pg.add_between(g, 0, n - 1, loop_meas, 1e-3, 1e-4)

    g2 = pg.optimize(g, iters=8, cg_iters=60)
    err_last = float(
        jnp.linalg.norm(se3.trans(g2.poses[n - 1]) - jnp.asarray(gt[-1][1]))
    )
    assert err_last < 0.05, f"loop not closed: {err_last:.3f} m"
    # a single loop factor constrains the endpoints, not the path shape —
    # intermediate poses must not get worse
    mid_err = float(
        jnp.linalg.norm(
            se3.trans(g2.poses[n // 2]) - jnp.asarray(gt[n // 2][1])
        )
    )
    assert mid_err <= drift_before


def test_prior_pins_pose():
    g = pg.make_graph(8, 2, 8, dtype=jnp.float64)
    target = mk_pose(0.3, [1.0, 2.0, 3.0])
    g = pg.set_pose(g, 0, se3.identity(jnp.float64))
    g = pg.add_prior(g, 0, target, 1e-4, 1e-4)
    g2 = pg.optimize(g, iters=6, cg_iters=20)
    np.testing.assert_allclose(
        np.asarray(se3.trans(g2.poses[0])), [1, 2, 3], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(so3.quat_log(se3.rot(g2.poses[0])))[2], 0.3, atol=1e-5
    )


def test_between_residual_zero_at_truth():
    a = mk_pose(0.4, [1.0, 0.0, 0.5])
    b = mk_pose(1.1, [2.0, 1.0, 0.5])
    meas = se3.between(a, b)
    e, Ji, Jj = pg._between_residual_jac(
        jnp.stack([a, b]), jnp.asarray([0]), jnp.asarray([1]), meas[None]
    )
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-12)


def test_between_jacobians_match_autodiff():
    import jax

    a = mk_pose(0.4, [1.0, 0.0, 0.5])
    b = mk_pose(1.1, [2.0, 1.0, 0.5])
    meas = se3.compose(se3.between(a, b), se3.exp(jnp.asarray(
        [0.05, -0.03, 0.02, 0.01, 0.02, -0.04], jnp.float64)))

    def res(d):
        di, dj = d[:6], d[6:]
        ap = se3.make(
            so3.quat_multiply(se3.rot(a), so3.quat_exp(di[3:6])),
            se3.trans(a) + di[0:3],
        )
        bp = se3.make(
            so3.quat_multiply(se3.rot(b), so3.quat_exp(dj[3:6])),
            se3.trans(b) + dj[0:3],
        )
        e, _, _ = pg._between_residual_jac(
            jnp.stack([ap, bp]), jnp.asarray([0]), jnp.asarray([1]),
            meas[None]
        )
        return e[0]

    J = jax.jacfwd(res)(jnp.zeros(12, jnp.float64))
    e, Ji, Jj = pg._between_residual_jac(
        jnp.stack([a, b]), jnp.asarray([0]), jnp.asarray([1]), meas[None]
    )
    # translation rows are exact; rotation rows use the Jr^-1 ~ I
    # approximation, valid to O(|e_r|)
    np.testing.assert_allclose(np.asarray(J[:, :6])[:3], np.asarray(Ji[0])[:3],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(J[:, 6:])[:3], np.asarray(Jj[0])[:3],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(J[:, :6])[3:], np.asarray(Ji[0])[3:],
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(J[:, 6:])[3:], np.asarray(Jj[0])[3:],
                               atol=0.05)


def test_gps_factor_pins_translation():
    """GPS factors pull drifted positions back without touching rotation."""
    g = pg.make_graph(16, 2, 32, max_gps=16, dtype=jnp.float64)
    n = 8
    for k in range(n):
        g = pg.set_pose(g, k, mk_pose(0.0, [k * 1.0 + 0.3, 0.2, 0]))
        if k:
            g = pg.add_between(
                g, k - 1, k, mk_pose(0.0, [1.0, 0, 0]), 1e-1, 1e-3
            )
    for k in range(n):
        g = pg.add_gps(g, k, jnp.asarray([k * 1.0, 0.0, 0.0]), 1e-2)
    g2 = pg.optimize(g, iters=6, cg_iters=40)
    pos = np.asarray(se3.trans(g2.poses[:n]))
    want = np.stack([np.arange(n), np.zeros(n), np.zeros(n)], 1)
    np.testing.assert_allclose(pos, want, atol=0.02)


def _random_chain_loops_graph(K, n_loops, rng, dtype=jnp.float32):
    g = pg.make_graph(K, 4, K + n_loops + 4, max_gps=4, dtype=dtype)
    yaw = 0.0
    pos = np.zeros(3)
    for k in range(K):
        g = pg.set_pose(g, k, mk_pose(yaw, pos).astype(dtype))
        yaw += rng.normal(scale=0.1)
        pos = pos + rng.normal(scale=[1.0, 0.3, 0.05], size=3)
    g = pg.add_prior(g, 0, g.poses[0], 1e-3, 1e-3)
    for k in range(1, K):
        rel = se3.between(g.poses[k - 1], g.poses[k])
        g = pg.add_between(g, k - 1, k, rel, 0.1, 0.02)
    for _ in range(n_loops):
        i = int(rng.integers(0, K - 3))
        j = int(rng.integers(i + 2, K))
        rel = se3.between(g.poses[i], g.poses[j])
        g = pg.add_between(g, i, j, rel, 0.3, 0.05)
    g = pg.add_gps(g, K // 2, se3.trans(g.poses[K // 2]), 2.0)
    return g


def test_selected_marginals_equal_dense():
    """selected_marginals (chain+loops block-tridiag + Woodbury) must
    reproduce dense_marginals' diagonal blocks exactly (up to f64/f32
    round-off) — the scalable replacement for the (6K)^2 inverse that the
    info-gain RS selection consumes (Incremental_mapping.cpp:699-727)."""
    rng = np.random.default_rng(11)
    for K, n_loops in [(6, 0), (12, 3), (24, 6)]:
        g = _random_chain_loops_graph(K, n_loops, rng)
        Sig_d = np.asarray(pg.dense_marginals(g, K), np.float64)
        Sig_s = pg.selected_marginals(g, K)
        np.testing.assert_allclose(Sig_s, Sig_d, rtol=5e-3, atol=1e-6)


def test_selected_marginals_scales_to_2048():
    """The selection path must stay tractable at the pipeline's
    max_keyframes scale (dense would need a 12288^2 inverse)."""
    import time

    rng = np.random.default_rng(7)
    K, n_loops = 2048, 64
    g = _random_chain_loops_graph(K, n_loops, rng)
    t0 = time.perf_counter()
    Sig = pg.selected_marginals(g, K)
    dt = time.perf_counter() - t0
    assert Sig.shape == (K, 6, 6)
    assert np.all(np.isfinite(Sig))
    # marginals are covariances: symmetric positive diagonals
    assert np.all(Sig[:, np.arange(6), np.arange(6)] > 0)
    assert dt < 60.0, f"selected_marginals took {dt:.1f}s at K=2048"
