"""Certifiable global registration (FPFH + GNC-TLS, the TEASER-class
pipeline of the reference's teaser-toolkit)."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.ops import certifiable
from better_fastlio2_tpu.utils import se3, so3


def make_asym_cloud(rng, n=2400):
    """Structured, rotation-asymmetric scene: floor, two walls of
    different extent, and a box."""
    k = n // 4
    floor = np.stack([rng.uniform(-10, 10, k), rng.uniform(-6, 6, k),
                      np.zeros(k)], 1)
    wall1 = np.stack([rng.uniform(-10, 10, k), np.full(k, 6.0),
                      rng.uniform(0, 4, k)], 1)
    wall2 = np.stack([np.full(k, -10.0), rng.uniform(-6, 6, k),
                      rng.uniform(0, 2, k)], 1)
    box = np.stack([rng.uniform(2, 4, k), rng.uniform(-2, 0, k),
                    rng.uniform(0, 1.5, k)], 1)
    return np.concatenate([floor, wall1, wall2, box])


def test_gnc_tls_outlier_robust(rng):
    """GNC-TLS recovers the pose from correspondences that are 70%
    gross outliers (the certifiable-solver claim; plain Procrustes
    fails here by construction)."""
    M = 400
    src = rng.uniform(-8, 8, (M, 3))
    q = so3.quat_exp(jnp.asarray([0.1, -0.2, 1.2]))
    T = se3.make(q, jnp.asarray([4.0, -2.0, 1.0]))
    dst = np.array(se3.apply(T, jnp.asarray(src)))
    dst += 0.02 * rng.standard_normal(dst.shape)
    n_out = int(0.7 * M)
    out_idx = rng.choice(M, n_out, replace=False)
    dst[out_idx] = rng.uniform(-20, 20, (n_out, 3))

    pose, inl = certifiable.gnc_tls_register(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(M, bool),
        noise_bound=0.15)
    err = se3.between(T, pose)
    t_err = float(jnp.linalg.norm(se3.trans(err)))
    r_err = float(jnp.linalg.norm(so3.quat_log(se3.rot(err))))
    assert t_err < 0.05, f"t_err {t_err}"
    assert r_err < 0.02, f"r_err {r_err}"
    # inlier classification: most true inliers kept, most outliers cut
    inl = np.asarray(inl)
    truth = np.ones(M, bool)
    truth[out_idx] = False
    assert (inl & truth).sum() > 0.8 * truth.sum()
    assert (inl & ~truth).sum() < 0.1 * n_out


def test_register_fpfh_gnc_large_transform(rng):
    """End-to-end global registration under a transform far outside any
    ICP convergence basin (120-degree yaw + large offset), with the two
    clouds sampled INDEPENDENTLY (no shared points)."""
    target = make_asym_cloud(rng)
    src_world = make_asym_cloud(np.random.default_rng(1234))
    q = so3.quat_exp(jnp.asarray([0.0, 0.0, 2.1]))
    T = se3.make(q, jnp.asarray([12.0, -5.0, 0.5]))
    # source cloud expressed in its own frame: src = T^-1(world)
    src = np.array(se3.apply(se3.inverse(T), jnp.asarray(src_world)))

    res = certifiable.register_fpfh_gnc(
        jnp.asarray(src, jnp.float32), jnp.ones(len(src), bool),
        jnp.asarray(target, jnp.float32), jnp.ones(len(target), bool),
        feature_radius=1.0, noise_bound=0.5)
    err = se3.between(T.astype(jnp.float32), res.pose)
    t_err = float(jnp.linalg.norm(se3.trans(err)))
    r_err = float(jnp.linalg.norm(so3.quat_log(se3.rot(err))))
    # global stage: must land inside the ICP convergence basin (accuracy
    # is bounded by the independent-sampling correspondence noise ~0.5 m)
    assert t_err < 1.0, f"t_err {t_err} (n_inliers {int(res.n_inliers)})"
    assert r_err < 0.15, f"r_err {r_err}"
    assert int(res.n_inliers) > 15

    # refinement stage: multiscale ICP from the global pose reaches
    # decimetre alignment (the reference's teaser->ICP flow)
    from better_fastlio2_tpu.ops import icp

    ref = icp.icp_multiscale(
        jnp.asarray(src, jnp.float32), jnp.ones(len(src), bool),
        jnp.asarray(target, jnp.float32), jnp.ones(len(target), bool),
        res.pose, voxels=(2.0, 1.0), iters=(8, 12), welsch_sigma=0.5)
    err2 = se3.between(T.astype(jnp.float32), ref.pose)
    t2 = float(jnp.linalg.norm(se3.trans(err2)))
    assert t2 < 0.4, f"refined t_err {t2}"
