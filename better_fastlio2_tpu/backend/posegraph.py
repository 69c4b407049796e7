"""Pose-graph optimization: batched Gauss-Newton with a matrix-free PCG.

TPU-native replacement for the reference's GTSAM iSAM2 backend
(reference: src/laserMapping.cpp:550-812 — addOdomFactor/addLoopFactor/
isam->update/correctPoses; noise models at :556,569,605).  Instead of an
incremental Bayes tree (pointer-heavy, sequential), every optimization
re-linearizes the full graph and solves the normal equations with a
Jacobi-preconditioned conjugate-gradient whose matvec is a pure
gather/scatter over the factor arrays:

    H v = sum_f J_f^T W_f (J_f v_f)

This shape is exactly what shards: factors split across devices, psum the
scatter — the distributed-GN design of SURVEY.md §2.6/P7.  Relinearizing
everything each call costs more FLOPs than iSAM2's selective updates but
the FLOPs are dense batched 6x6 blocks (VPU/MXU food), and the graph
sizes here (10^3-10^4 keyframes) solve in milliseconds.

Factor types (fixed-capacity padded arrays, mask-gated):
  prior   — anchors pose 0 (reference prior noise 1e-12, :556)
  between — odometry + loop factors with per-factor 6-diag noise and an
            optional Cauchy robust kernel (multi-session uses
            robustNoiseModel, Incremental_mapping.cpp:416-433)

Error convention (right perturbation, split SO3 x R^3 retraction):
  e_t = R_i^T (t_j - t_i) - t_ij
  e_r = Log(R_ij^T R_i^T R_j)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3, so3

__all__ = ["PoseGraph", "make_graph", "add_prior", "add_between", "add_gps",
           "optimize", "dense_marginals", "selected_marginals"]


class PoseGraph(NamedTuple):
    poses: jax.Array  # (K, 7) [quat wxyz | t]
    n_poses: jax.Array  # () int32

    prior_idx: jax.Array  # (P,) int32
    prior_pose: jax.Array  # (P, 7)
    prior_sqw: jax.Array  # (P, 6) sqrt information diag [t, r]
    prior_mask: jax.Array  # (P,)
    n_prior: jax.Array  # ()

    bw_i: jax.Array  # (F,) int32
    bw_j: jax.Array  # (F,) int32
    bw_meas: jax.Array  # (F, 7) T_ij
    bw_sqw: jax.Array  # (F, 6) sqrt information diag [t, r]
    bw_robust: jax.Array  # (F,) bool — apply Cauchy kernel
    bw_mask: jax.Array  # (F,)
    n_bw: jax.Array  # ()

    # GPS factors: unary position measurements (the reference declares
    # addGPSFactor but leaves it commented out, laserMapping.cpp:689;
    # implemented here per the MulRan config target)
    gps_idx: jax.Array  # (G,) int32
    gps_pos: jax.Array  # (G, 3) measured world position
    gps_sqw: jax.Array  # (G, 3) sqrt information diag
    gps_mask: jax.Array  # (G,)
    n_gps: jax.Array  # ()


def make_graph(max_poses: int, max_priors: int, max_between: int,
               max_gps: int = 0, dtype=jnp.float32) -> PoseGraph:
    ident = jnp.tile(se3.identity(dtype), (max_poses, 1))
    mg = max(max_gps, 1)
    return PoseGraph(
        poses=ident,
        n_poses=jnp.zeros((), jnp.int32),
        prior_idx=jnp.zeros(max_priors, jnp.int32),
        prior_pose=jnp.tile(se3.identity(dtype), (max_priors, 1)),
        prior_sqw=jnp.zeros((max_priors, 6), dtype),
        prior_mask=jnp.zeros(max_priors, bool),
        n_prior=jnp.zeros((), jnp.int32),
        bw_i=jnp.zeros(max_between, jnp.int32),
        bw_j=jnp.zeros(max_between, jnp.int32),
        bw_meas=jnp.tile(se3.identity(dtype), (max_between, 1)),
        bw_sqw=jnp.zeros((max_between, 6), dtype),
        bw_robust=jnp.zeros(max_between, bool),
        bw_mask=jnp.zeros(max_between, bool),
        n_bw=jnp.zeros((), jnp.int32),
        gps_idx=jnp.zeros(mg, jnp.int32),
        gps_pos=jnp.zeros((mg, 3), dtype),
        gps_sqw=jnp.zeros((mg, 3), dtype),
        gps_mask=jnp.zeros(mg, bool),
        n_gps=jnp.zeros((), jnp.int32),
    )


@jax.jit
def add_gps(g: PoseGraph, idx, pos, sigma) -> PoseGraph:
    """Unary GPS position factor on pose idx (3-dof translation)."""
    k = g.n_gps
    sq = jnp.full(3, 1.0, g.poses.dtype) / sigma
    return g._replace(
        gps_idx=g.gps_idx.at[k].set(idx, mode="drop"),
        gps_pos=g.gps_pos.at[k].set(pos, mode="drop"),
        gps_sqw=g.gps_sqw.at[k].set(sq, mode="drop"),
        gps_mask=g.gps_mask.at[k].set(True, mode="drop"),
        n_gps=jnp.minimum(k + 1, g.gps_idx.shape[0]),
    )


@jax.jit
def add_prior(g: PoseGraph, idx, pose, sigma_t, sigma_r) -> PoseGraph:
    k = g.n_prior
    sq = jnp.concatenate(
        [jnp.full(3, 1.0 / sigma_t, pose.dtype), jnp.full(3, 1.0 / sigma_r,
                                                          pose.dtype)]
    )
    return g._replace(
        prior_idx=g.prior_idx.at[k].set(idx, mode="drop"),
        prior_pose=g.prior_pose.at[k].set(pose, mode="drop"),
        prior_sqw=g.prior_sqw.at[k].set(sq, mode="drop"),
        prior_mask=g.prior_mask.at[k].set(True, mode="drop"),
        n_prior=jnp.minimum(k + 1, g.prior_idx.shape[0]),
    )


@jax.jit
def add_between(g: PoseGraph, i, j, meas, sigma_t, sigma_r,
                robust=False) -> PoseGraph:
    k = g.n_bw
    sq = jnp.concatenate(
        [jnp.full(3, 1.0, meas.dtype) / sigma_t,
         jnp.full(3, 1.0, meas.dtype) / sigma_r]
    )
    return g._replace(
        bw_i=g.bw_i.at[k].set(i, mode="drop"),
        bw_j=g.bw_j.at[k].set(j, mode="drop"),
        bw_meas=g.bw_meas.at[k].set(meas, mode="drop"),
        bw_sqw=g.bw_sqw.at[k].set(sq, mode="drop"),
        bw_robust=g.bw_robust.at[k].set(jnp.asarray(robust), mode="drop"),
        bw_mask=g.bw_mask.at[k].set(True, mode="drop"),
        n_bw=jnp.minimum(k + 1, g.bw_i.shape[0]),
    )


def set_pose(g: PoseGraph, idx, pose) -> PoseGraph:
    return g._replace(
        poses=g.poses.at[idx].set(pose, mode="drop"),
        n_poses=jnp.maximum(g.n_poses, idx + 1),
    )


def set_poses(g: PoseGraph, poses: jnp.ndarray, n) -> PoseGraph:
    """Batch pose writeback: replace rows [0, n) of the pose buffer in
    ONE masked update.  correctPoses applies the whole optimized array
    (laserMapping.cpp:769-805); doing it with per-index set_pose costs
    one device dispatch per keyframe — O(n) tiny dispatches on every
    async-backend harvest."""
    P = g.poses.shape[0]
    k = jnp.minimum(jnp.asarray(n, jnp.int32), P)
    padded = jnp.zeros_like(g.poses).at[: poses.shape[0]].set(
        poses.astype(g.poses.dtype))
    mask = (jnp.arange(P) < k)[:, None]
    return g._replace(
        poses=jnp.where(mask, padded, g.poses),
        n_poses=jnp.maximum(g.n_poses, k),
    )


# ---------------------------------------------------------------------------
# linearization
# ---------------------------------------------------------------------------


def _between_residual_jac(poses, bw_i, bw_j, bw_meas):
    """Residuals (F, 6) [e_t, e_r] and Jacobian blocks (F, 6, 6) for i, j."""
    Ti = poses[bw_i]
    Tj = poses[bw_j]
    qi, ti = se3.rot(Ti), se3.trans(Ti)
    qj, tj = se3.rot(Tj), se3.trans(Tj)
    qij, tij = se3.rot(bw_meas), se3.trans(bw_meas)

    dt_w = tj - ti
    dt_i = so3.quat_inv_rotate(qi, dt_w)
    e_t = dt_i - tij
    q_rel = so3.quat_multiply(so3.quat_conjugate(qi), qj)
    e_r = so3.quat_log(
        so3.quat_multiply(so3.quat_conjugate(qij), q_rel)
    )
    e = jnp.concatenate([e_t, e_r], axis=-1)

    F = bw_i.shape[0]
    Z = jnp.zeros((F, 3, 3), poses.dtype)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=poses.dtype), (F, 3, 3))
    Ri_T = jnp.swapaxes(so3.quat_to_matrix(qi), -1, -2)
    Rrel_T = so3.quat_to_matrix(
        so3.quat_multiply(so3.quat_conjugate(qj), qi)
    )  # R_j^T R_i

    # d e_t: w.r.t. [dt_i, dth_i, dt_j, dth_j]
    J_ti = jnp.concatenate(
        [
            jnp.concatenate([-Ri_T, so3.hat(dt_i)], axis=-1),  # (F,3,6) for i
        ],
        axis=-1,
    )
    J_tj = jnp.concatenate([Ri_T, Z], axis=-1)
    # d e_r
    J_ri = jnp.concatenate([Z, -Rrel_T], axis=-1)
    J_rj = jnp.concatenate([Z, I3], axis=-1)

    J_i = jnp.concatenate([J_ti, J_ri], axis=-2)  # (F, 6, 6)
    J_j = jnp.concatenate([J_tj, J_rj], axis=-2)
    return e, J_i, J_j


def _prior_residual_jac(poses, p_idx, p_pose):
    Ti = poses[p_idx]
    e_t = se3.trans(Ti) - se3.trans(p_pose)
    e_r = so3.quat_log(
        so3.quat_multiply(so3.quat_conjugate(se3.rot(p_pose)), se3.rot(Ti))
    )
    e = jnp.concatenate([e_t, e_r], axis=-1)
    F = p_idx.shape[0]
    J = jnp.broadcast_to(jnp.eye(6, dtype=poses.dtype), (F, 6, 6))
    return e, J


def _cauchy_weight(e2, c2):
    """IRLS weight of the Cauchy kernel rho(s) = c^2/2 log(1 + s/c^2):
    w = 1 / (1 + s/c^2)."""
    return 1.0 / (1.0 + e2 / c2)


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize(
    g: PoseGraph,
    iters: int = 5,
    cg_iters: int = 40,
    cauchy_c: float = 1.0,
    damping: float = 1e-6,
) -> PoseGraph:
    """Gauss-Newton with Jacobi-PCG inner solves over the whole graph.

    The result plays the role of isam->update(); correctPoses
    (laserMapping.cpp:769-805) is simply reading back g.poses.
    """
    K = g.poses.shape[0]
    dtype = g.poses.dtype
    active = (jnp.arange(K) < g.n_poses)[:, None]

    def gn_iter(poses, _):
        e_b, Ji, Jj = _between_residual_jac(poses, g.bw_i, g.bw_j, g.bw_meas)
        e_p, Jp = _prior_residual_jac(poses, g.prior_idx, g.prior_pose)

        # robust IRLS weights on whitened between residuals
        wh = e_b * g.bw_sqw
        e2 = jnp.sum(wh * wh, axis=-1)
        w_rob = jnp.where(
            g.bw_robust, _cauchy_weight(e2, cauchy_c * cauchy_c), 1.0
        )
        w_b = (g.bw_sqw**2) * (w_rob * g.bw_mask)[:, None]  # (F, 6) info diag
        w_p = (g.prior_sqw**2) * g.prior_mask[:, None]
        # GPS residuals: e = t_i - t_gps, J = [I3 | 0] in the 6-dof tangent
        e_g = se3.trans(poses[g.gps_idx]) - g.gps_pos
        w_g = (g.gps_sqw**2) * g.gps_mask[:, None]  # (G, 3)

        # rhs: b = -(J^T W e), assembled by scatter-add
        def scatter_JTWe():
            contrib_i = jnp.einsum("fab,fa->fb", Ji, w_b * e_b)
            contrib_j = jnp.einsum("fab,fa->fb", Jj, w_b * e_b)
            contrib_p = jnp.einsum("fab,fa->fb", Jp, w_p * e_p)
            out = jnp.zeros((K, 6), dtype)
            out = out.at[g.bw_i].add(contrib_i, mode="drop")
            out = out.at[g.bw_j].add(contrib_j, mode="drop")
            out = out.at[g.prior_idx].add(contrib_p, mode="drop")
            out = out.at[g.gps_idx, 0:3].add(w_g * e_g, mode="drop")
            return out

        b = -scatter_JTWe()

        def hvp(v):
            vi = v[g.bw_i]
            vj = v[g.bw_j]
            Jv = jnp.einsum("fab,fb->fa", Ji, vi) + jnp.einsum(
                "fab,fb->fa", Jj, vj
            )
            WJv = w_b * Jv
            out = jnp.zeros((K, 6), dtype)
            out = out.at[g.bw_i].add(
                jnp.einsum("fab,fa->fb", Ji, WJv), mode="drop"
            )
            out = out.at[g.bw_j].add(
                jnp.einsum("fab,fa->fb", Jj, WJv), mode="drop"
            )
            vp = v[g.prior_idx]
            Jvp = jnp.einsum("fab,fb->fa", Jp, vp)
            out = out.at[g.prior_idx].add(
                jnp.einsum("fab,fa->fb", Jp, w_p * Jvp), mode="drop"
            )
            out = out.at[g.gps_idx, 0:3].add(
                w_g * v[g.gps_idx, 0:3], mode="drop"
            )
            return out + damping * v

        # Jacobi preconditioner: diagonal of H
        def diag_H():
            di = jnp.einsum("fab,fa,fab->fb", Ji, w_b, Ji)
            dj = jnp.einsum("fab,fa,fab->fb", Jj, w_b, Jj)
            dp = jnp.einsum("fab,fa,fab->fb", Jp, w_p, Jp)
            out = jnp.zeros((K, 6), dtype)
            out = out.at[g.bw_i].add(di, mode="drop")
            out = out.at[g.bw_j].add(dj, mode="drop")
            out = out.at[g.prior_idx].add(dp, mode="drop")
            out = out.at[g.gps_idx, 0:3].add(w_g, mode="drop")
            return out + damping

        Minv = jnp.where(active, 1.0 / jnp.maximum(diag_H(), 1e-12), 0.0)
        b = jnp.where(active, b, 0.0)

        def cg_step(c, _):
            x, r, z, p, rz = c
            Ap = jnp.where(active, hvp(p), 0.0)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv * r
            rz_new = jnp.vdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return (x, r, z, p, rz_new), None

        x0 = jnp.zeros((K, 6), dtype)
        r0 = b
        z0 = Minv * r0
        (dx, *_), _ = jax.lax.scan(
            cg_step, (x0, r0, z0, z0, jnp.vdot(r0, z0)), None, length=cg_iters
        )

        # retract: t += dt (tangent is body-right for rot, world for trans
        # per the Jacobians: dt in world after R_i^T factor... the J uses
        # e_t derivative -R_i^T meaning dt is WORLD-frame translation)
        new_t = se3.trans(poses) + dx[:, 0:3]
        new_q = so3.quat_normalize(
            so3.quat_multiply(se3.rot(poses), so3.quat_exp(dx[:, 3:6]))
        )
        new_poses = jnp.where(active, se3.make(new_q, new_t), poses)
        return new_poses, None

    poses, _ = jax.lax.scan(gn_iter, g.poses, None, length=iters)
    return g._replace(poses=poses)


def dense_marginals(g: PoseGraph, n_active: int, damping: float = 1e-3):
    """Per-pose 6x6 marginal covariance blocks from the FULL Gauss-Newton
    Hessian (the isam->marginalCovariance analog the reference's
    information-gain selection consumes, Incremental_mapping.cpp:718-719).

    Assembles the dense (6K, 6K) information matrix from all active
    prior/between/GPS factors at the current linearization point, inverts
    it once (offline-path cost), and returns the (K, 6, 6) diagonal
    blocks.  `damping` regularizes gauge freedom left by weak priors."""
    K = int(n_active)
    dtype = g.poses.dtype
    H = jnp.zeros((K, 6, K, 6), dtype)

    e_b, Ji, Jj = _between_residual_jac(poses := g.poses, g.bw_i, g.bw_j,
                                        g.bw_meas)
    w_b = (g.bw_sqw**2) * g.bw_mask[:, None]
    ok = g.bw_mask & (g.bw_i < K) & (g.bw_j < K)
    wb = jnp.where(ok[:, None], w_b, 0.0)
    bi = jnp.minimum(g.bw_i, K - 1)
    bj = jnp.minimum(g.bw_j, K - 1)
    Hii = jnp.einsum("fai,fa,faj->fij", Ji, wb, Ji)
    Hjj = jnp.einsum("fai,fa,faj->fij", Jj, wb, Jj)
    Hij = jnp.einsum("fai,fa,faj->fij", Ji, wb, Jj)
    H = H.at[bi, :, bi, :].add(Hii)
    H = H.at[bj, :, bj, :].add(Hjj)
    H = H.at[bi, :, bj, :].add(Hij)
    H = H.at[bj, :, bi, :].add(jnp.swapaxes(Hij, -1, -2))

    e_p, Jp = _prior_residual_jac(poses, g.prior_idx, g.prior_pose)
    okp = g.prior_mask & (g.prior_idx < K)
    wp = jnp.where(okp[:, None], g.prior_sqw**2, 0.0)
    pi = jnp.minimum(g.prior_idx, K - 1)
    H = H.at[pi, :, pi, :].add(jnp.einsum("fai,fa,faj->fij", Jp, wp, Jp))

    okg = g.gps_mask & (g.gps_idx < K)
    wg = jnp.where(okg[:, None], g.gps_sqw**2, 0.0)
    gi = jnp.minimum(g.gps_idx, K - 1)
    Hg = jnp.zeros((g.gps_idx.shape[0], 6, 6), dtype)
    Hg = Hg.at[:, 0, 0].set(wg[:, 0]).at[:, 1, 1].set(wg[:, 1])
    Hg = Hg.at[:, 2, 2].set(wg[:, 2])
    H = H.at[gi, :, gi, :].add(Hg)

    Hd = H.reshape(6 * K, 6 * K) + damping * jnp.eye(6 * K, dtype=dtype)
    Sigma = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(Hd), True), jnp.eye(6 * K, dtype=dtype)
    ).reshape(K, 6, K, 6)
    idx = jnp.arange(K)
    return Sigma[idx, :, idx, :]  # (K, 6, 6)


def selected_marginals(g: PoseGraph, n_active: int, damping: float = 1e-3):
    """All (K, 6, 6) diagonal blocks of the GN Hessian inverse — the same
    marginals dense_marginals returns, computed by structure instead of a
    dense (6K)² Cholesky (which is O(K³) time / O(K²) memory and dies at
    the pipeline's max_keyframes=2048; the reference's iSAM2 reads sparse
    Bayes-tree marginals instead, Incremental_mapping.cpp:718-719).

    Structure exploited: SLAM pose graphs are CHAINS (consecutive
    odometry between-factors, priors, GPS) plus L sparse loop factors.
    Split H = T + U Uᵀ with T block-tridiagonal and U the (6K, 6L)
    stacked loop-factor square-root blocks, then

      diag_k(H⁻¹) = diag_k(T⁻¹) − X_k M⁻¹ X_kᵀ,
        X = T⁻¹ U,  M = I + Uᵀ X                      (Woodbury)

    * diag_k(T⁻¹) by the two-sided block-Schur recursion:
        Λ_k = D_k − B_{k-1}ᵀ Λ_{k-1}⁻¹ B_{k-1}   (left-connected)
        Ψ_k = D_k − B_k Ψ_{k+1}⁻¹ B_kᵀ           (right-connected)
        diag_k(T⁻¹) = (Λ_k + Ψ_k − D_k)⁻¹
    * X by the block-Thomas solve (shares the Λ factorization).

    Cost O(K L²) time, O(K L) memory — seconds at K=2048.  Runs on host
    in f64 (this is the offline multi-session path; f64 also beats the
    f32 dense inverse numerically).  Exact up to round-off — validated
    equal to dense_marginals in tests/test_posegraph.py."""
    import numpy as np

    K = int(n_active)
    # linearize through the same jacobian code as the optimizer/dense path
    e_b, Ji_j, Jj_j = _between_residual_jac(g.poses, g.bw_i, g.bw_j,
                                            g.bw_meas)
    Ji = np.asarray(Ji_j, np.float64)
    Jj = np.asarray(Jj_j, np.float64)
    bw_i = np.asarray(g.bw_i)
    bw_j = np.asarray(g.bw_j)
    w_b = np.asarray(g.bw_sqw, np.float64) ** 2
    okb = np.asarray(g.bw_mask) & (bw_i < K) & (bw_j < K)

    D = np.zeros((K, 6, 6))
    B = np.zeros((max(K - 1, 1), 6, 6))  # coupling (k, k+1)
    D += damping * np.eye(6)

    # priors + gps into D
    _, Jp_j = _prior_residual_jac(g.poses, g.prior_idx, g.prior_pose)
    Jp = np.asarray(Jp_j, np.float64)
    okp = np.asarray(g.prior_mask) & (np.asarray(g.prior_idx) < K)
    for f in np.where(okp)[0]:
        w = np.asarray(g.prior_sqw, np.float64)[f] ** 2
        D[int(np.asarray(g.prior_idx)[f])] += Jp[f].T @ (w[:, None] * Jp[f])
    okg = np.asarray(g.gps_mask) & (np.asarray(g.gps_idx) < K)
    for f in np.where(okg)[0]:
        w = np.asarray(g.gps_sqw, np.float64)[f] ** 2
        D[int(np.asarray(g.gps_idx)[f])][:3, :3] += np.diag(w)

    # split between factors: chain (|i-j| == 1) vs loops
    loop_blocks = []  # (i, j, Ui (6,6), Uj (6,6)) with U = Jᵀ sqrt(W)
    for f in np.where(okb)[0]:
        i, j = int(bw_i[f]), int(bw_j[f])
        Wi = w_b[f]
        Hii = Ji[f].T @ (Wi[:, None] * Ji[f])
        Hjj = Jj[f].T @ (Wi[:, None] * Jj[f])
        Hij = Ji[f].T @ (Wi[:, None] * Jj[f])
        if abs(i - j) == 1:
            D[i] += Hii
            D[j] += Hjj
            lo, hi_ = (i, j) if i < j else (j, i)
            B[lo] += Hij if i < j else Hij.T
        else:
            sq = np.sqrt(Wi)
            loop_blocks.append((i, j, Ji[f].T * sq, Jj[f].T * sq))

    L = len(loop_blocks)
    U = np.zeros((K, 6, 6 * L))
    for li, (i, j, Ui, Uj) in enumerate(loop_blocks):
        U[i, :, 6 * li: 6 * li + 6] += Ui
        U[j, :, 6 * li: 6 * li + 6] += Uj

    # left-connected Schur recursion + forward elimination of U
    Lam = np.zeros((K, 6, 6))
    Gf = np.zeros_like(U)
    Lam[0] = D[0]
    Gf[0] = U[0]
    for k in range(1, K):
        Wk = B[k - 1].T @ np.linalg.inv(Lam[k - 1])
        Lam[k] = D[k] - Wk @ B[k - 1]
        Gf[k] = U[k] - Wk @ Gf[k - 1]
    # right-connected recursion
    Psi = np.zeros((K, 6, 6))
    Psi[K - 1] = D[K - 1]
    for k in range(K - 2, -1, -1):
        Psi[k] = D[k] - B[k] @ np.linalg.inv(Psi[k + 1]) @ B[k].T
    # diag blocks of T^-1
    Tinv_kk = np.linalg.inv(Lam + Psi - D)

    if L == 0:
        return Tinv_kk

    # back substitution: X = T^-1 U
    X = np.zeros_like(U)
    X[K - 1] = np.linalg.solve(Lam[K - 1], Gf[K - 1])
    for k in range(K - 2, -1, -1):
        X[k] = np.linalg.solve(Lam[k], Gf[k] - B[k] @ X[k + 1])
    M = np.eye(6 * L) + np.einsum("kaL,kaM->LM", U, X)
    Q = np.linalg.solve(M, X.transpose(2, 0, 1).reshape(6 * L, -1))
    Q = Q.reshape(6 * L, K, 6)
    corr = np.einsum("kaL,Lkb->kab", X, Q)
    return Tinv_kk - corr
