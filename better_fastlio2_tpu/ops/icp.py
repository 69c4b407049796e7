"""Batched scan-to-scan ICP — loop verification and relocalization.

TPU-native replacement for the reference's two registration stacks:
* pcl::IterativeClosestPoint used by the loop-closure verify
  (reference: src/laserMapping.cpp:946-974 — max corr 200 m, 100 iters,
  fitness = mean squared correspondence distance) and by multi-session
  ICP checks (Incremental_mapping.cpp:462-583);
* the FRICP toolkit (include/FRICP-toolkit/FRICP.h) — robust Welsch
  kernel point-to-point/plane used by online relocalization.

Design: correspondences come from a voxel-hash table built once over the
target cloud (27-voxel gather, same machinery as the live map); the
point-to-point step is solved in closed form (weighted Procrustes/SVD),
the point-to-plane step by a 6x6 Gauss-Newton solve.  Iterations run
under `lax.scan` with static shapes; robust Welsch weights give the
FRICP behavior with `welsch_sigma` set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..map import voxel_hash
from ..utils import se3, so3
from ..core.measurement import plane_fit

__all__ = ["ICPResult", "icp_point2point", "icp_point2plane",
           "icp_point2plane_aa", "icp_point2point_aa", "icp_sparse",
           "icp_multiscale", "fitness_score", "REG_MODES", "register_run"]


class ICPResult(NamedTuple):
    pose: jax.Array  # (7,) [quat wxyz | t] mapping source -> target frame
    fitness: jax.Array  # () mean squared correspondence distance (PCL-style)
    n_inliers: jax.Array  # () int32
    converged: jax.Array  # () bool


def _build_target_map(target, t_valid, voxel, bucket, cap_log2):
    m = voxel_hash.make_map(capacity_log2=cap_log2, bucket=bucket,
                            voxel_size=voxel, dtype=target.dtype)
    return voxel_hash.insert(m, target, t_valid)


@partial(jax.jit, static_argnames=("iters", "cap_log2", "bucket", "welsch_sigma"))
def icp_point2point(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    max_corr: float = 5.0,
    iters: int = 30,
    voxel: float = 1.0,
    welsch_sigma: float = 0.0,
    cap_log2: int = 15,
    bucket: int = 8,
) -> ICPResult:
    """Point-to-point ICP with closed-form weighted-Procrustes steps.

    welsch_sigma > 0 enables the FRICP Welsch kernel
    w = exp(-d^2 / (2 sigma^2)) (FRICP.h point_to_point); 0 gives the
    hard max_corr gate of pcl::ICP.
    """
    m = _build_target_map(target, t_valid, voxel, bucket, cap_log2)
    dtype = source.dtype

    def body(pose, _):
        src_w = se3.apply(pose, source)
        nb, d2, ok = voxel_hash.knn(m, src_w, k=1, chunk=source.shape[0])
        q = nb[:, 0, :]
        d2 = d2[:, 0]
        w = (ok[:, 0] & s_valid & (d2 <= max_corr * max_corr)).astype(dtype)
        if welsch_sigma > 0:
            w = w * jnp.exp(-d2 / (2.0 * welsch_sigma * welsch_sigma))
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        mu_p = jnp.sum(src_w * w[:, None], axis=0) / wsum
        mu_q = jnp.sum(q * w[:, None], axis=0) / wsum
        P = (src_w - mu_p) * w[:, None]
        Qc = q - mu_q
        H = P.T @ Qc
        U, S, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype) + jnp.array(
            [0.0, 0.0, 1.0], dtype) * d)
        R = Vt.T @ D @ U.T
        t = mu_q - R @ mu_p
        delta = se3.from_rot_trans(R, t)
        return se3.compose(delta, pose), None

    pose, _ = jax.lax.scan(body, init_pose, None, length=iters)
    fit, n_in = fitness_score(m, se3.apply(pose, source), s_valid, max_corr)
    return ICPResult(pose, fit, n_in, jnp.isfinite(fit))


@partial(jax.jit, static_argnames=("iters", "cap_log2", "bucket", "welsch_sigma"))
def icp_point2plane(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    max_corr: float = 5.0,
    iters: int = 20,
    voxel: float = 1.0,
    welsch_sigma: float = 0.0,
    cap_log2: int = 15,
    bucket: int = 8,
) -> ICPResult:
    """Point-to-plane ICP: plane fit over 5 target NN per source point,
    6x6 GN step on [t, theta] (FRICP.h point_to_plane_GN analog)."""
    m = _build_target_map(target, t_valid, voxel, bucket, cap_log2)
    dtype = source.dtype

    def body(pose, _):
        src_w = se3.apply(pose, source)
        nb, d2, ok = voxel_hash.knn(m, src_w, k=5, chunk=source.shape[0])
        nn_ok = jnp.all(ok, axis=-1) & s_valid & (
            d2[:, 4] <= max_corr * max_corr
        )
        n, dpl, plane_ok = plane_fit(nb, nn_ok, thresh=0.2)
        r = jnp.einsum("ni,ni->n", n, src_w) + dpl
        w = plane_ok.astype(dtype)
        if welsch_sigma > 0:
            w = w * jnp.exp(-(r * r) / (2.0 * welsch_sigma * welsch_sigma))
        # J row: [n, (src_w x n)] for update T <- Exp([t, th]) ∘ T
        J = jnp.concatenate([n, jnp.cross(src_w, n)], axis=-1)  # (N, 6)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
        b = -(Jw.T @ r)
        dx = jnp.linalg.solve(H, b)
        delta = se3.make(so3.quat_exp(dx[3:6]), dx[0:3])
        return se3.compose(delta, pose), None

    pose, _ = jax.lax.scan(body, init_pose, None, length=iters)
    fit, n_in = fitness_score(m, se3.apply(pose, source), s_valid, max_corr)
    return ICPResult(pose, fit, n_in, jnp.isfinite(fit))


def _pose_to_u(pose: jax.Array) -> jax.Array:
    """Chart for Anderson mixing: u = [t (3), log R (3)]."""
    return jnp.concatenate([se3.trans(pose), so3.quat_log(se3.rot(pose))])


def _u_to_pose(u: jax.Array) -> jax.Array:
    return se3.make(so3.quat_exp(u[3:6]), u[0:3])


@partial(jax.jit, static_argnames=("iters", "cap_log2", "bucket",
                                   "welsch_sigma", "aa_depth"))
def icp_point2plane_aa(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    max_corr: float = 5.0,
    iters: int = 20,
    voxel: float = 1.0,
    welsch_sigma: float = 0.5,
    cap_log2: int = 15,
    bucket: int = 8,
    aa_depth: int = 5,
) -> ICPResult:
    """Anderson-accelerated robust point-to-plane ICP (the FRICP
    algorithm family: Welsch kernel + safeguarded Anderson acceleration,
    reference: include/FRICP-toolkit/FRICP.h point_to_plane +
    AndersonAcceleration.h).

    The ICP fixed-point map G(u) is one association + GN step in the
    6-dof chart u = [t, log R]; Anderson mixing extrapolates from the
    last `aa_depth` residuals f_k = G(u_k) - u_k.  Safeguarding follows
    FRICP: the robust energy at the accelerated iterate is compared
    against the previous accepted energy — on increase the iterate rolls
    back to the last un-accelerated GN step and the mixing history
    resets (FRICP.h:300-335 energy check).
    """
    m = _build_target_map(target, t_valid, voxel, bucket, cap_log2)
    dtype = source.dtype
    BIG = jnp.asarray(1e30, dtype)

    def assoc_energy_step(pose):
        """One association at `pose`: robust energy + the GN step pose."""
        src_w = se3.apply(pose, source)
        nb, d2, ok = voxel_hash.knn(m, src_w, k=5, chunk=source.shape[0])
        nn_ok = jnp.all(ok, axis=-1) & s_valid & (
            d2[:, 4] <= max_corr * max_corr
        )
        n, dpl, plane_ok = plane_fit(nb, nn_ok, thresh=0.2)
        r = jnp.einsum("ni,ni->n", n, src_w) + dpl
        base = plane_ok.astype(dtype)
        if welsch_sigma > 0:
            s2 = 2.0 * welsch_sigma * welsch_sigma
            w = base * jnp.exp(-(r * r) / s2)
            # Welsch energy: sum (1 - exp(-r^2/2s^2)) over valid rows
            energy = jnp.sum(base * (1.0 - jnp.exp(-(r * r) / s2)))
        else:
            w = base
            energy = jnp.sum(base * r * r)
        nval = jnp.maximum(jnp.sum(base), 1.0)
        energy = energy / nval
        J = jnp.concatenate([n, jnp.cross(src_w, n)], axis=-1)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
        b = -(Jw.T @ r)
        dx = jnp.linalg.solve(H, b)
        pose_gn = se3.compose(se3.make(so3.quat_exp(dx[3:6]), dx[0:3]), pose)
        return energy, pose_gn

    D = aa_depth

    def body(c, _):
        u_cur, fallback_u, e_prev, Us, Fs, hist_n = c
        energy, pose_gn = assoc_energy_step(_u_to_pose(u_cur))
        u_gn = _pose_to_u(pose_gn)

        # safeguard: if the (accelerated) current iterate raised the
        # energy, roll back to the last accepted GN pose and reset mixing
        bad = energy > e_prev
        u_base = jnp.where(bad, fallback_u, u_gn)
        f_base = u_base - jnp.where(bad, fallback_u, u_cur)
        hist_n = jnp.where(bad, 0, hist_n)
        e_acc = jnp.where(bad, e_prev, energy)

        # push (u_base, f_base) into the ring history
        Us = jnp.roll(Us, 1, axis=0).at[0].set(u_base)
        Fs = jnp.roll(Fs, 1, axis=0).at[0].set(f_base)
        hist_n = jnp.minimum(hist_n + 1, D)

        # Anderson mixing over dF columns: minimize ||f0 - dF gamma||
        mask = (jnp.arange(D - 1) < (hist_n - 1)).astype(dtype)
        dF = (Fs[0][None] - Fs[1:]) * mask[:, None]  # (D-1, 6)
        dU = (Us[0][None] - Us[1:]) * mask[:, None]
        A = dF @ dF.T + 1e-10 * jnp.eye(D - 1, dtype=dtype)
        gamma = jnp.linalg.solve(A, dF @ Fs[0])
        u_aa = Us[0] + Fs[0] - (dU + dF).T @ gamma
        u_next = jnp.where(hist_n > 1, u_aa, u_base + 0.0)

        return (u_next, u_gn, e_acc, Us, Fs, hist_n), energy

    u0 = _pose_to_u(init_pose)
    c0 = (
        u0,
        u0,
        BIG,
        jnp.zeros((D, 6), dtype),
        jnp.zeros((D, 6), dtype),
        jnp.asarray(0, jnp.int32),
    )
    (u_fin, fallback_u, e_fin, *_), energies = jax.lax.scan(
        body, c0, None, length=iters
    )
    # the last accepted GN pose is the safe output (the final u may be an
    # unevaluated extrapolation)
    pose = _u_to_pose(fallback_u)
    fit, n_in = fitness_score(m, se3.apply(pose, source), s_valid, max_corr)
    return ICPResult(pose, fit, n_in, jnp.isfinite(fit))


def icp_multiscale(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    voxels=(8.0, 2.0, 1.0),
    iters=(8, 8, 12),
    max_corr: float = 30.0,
    welsch_sigma: float = 0.0,
) -> ICPResult:
    """Coarse-to-fine point-to-plane ICP.

    The voxel-hash correspondence search bounds matches to ~1 voxel
    radius; a coarse first level recovers the wide convergence basin the
    reference gets from pcl::ICP's 30 m kd-tree correspondences
    (Incremental_mapping.cpp:485 setMaxCorrespondenceDistance(30)).
    """
    pose = init_pose
    res = None
    for v, it in zip(voxels, iters):
        res = icp_point2plane(
            source, s_valid, target, t_valid, pose,
            max_corr=min(max_corr, 2.5 * v), iters=it, voxel=v,
            welsch_sigma=welsch_sigma,
        )
        pose = res.pose
    return res


def fitness_score(m, src_w, s_valid, max_range):
    """pcl::Registration::getFitnessScore: mean squared distance of
    correspondences within max_range."""
    _, d2, ok = voxel_hash.knn(m, src_w, k=1, chunk=src_w.shape[0])
    good = ok[:, 0] & s_valid & (d2[:, 0] <= max_range * max_range)
    n = jnp.sum(good.astype(jnp.int32))
    fit = jnp.sum(jnp.where(good, d2[:, 0], 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n > 0, fit, jnp.inf), n


# ---------------------------------------------------------------------------
# Sparse ICP (p-norm ADMM) + the FRICP registration-mode registry
# ---------------------------------------------------------------------------

def _shrink(R, mu, p):
    """p-norm proximal (shrinkage) operator, vectorized.

    Behavioral port of the reference's shrink<3> / shrinkage<I>
    (include/FRICP-toolkit/ICP.h:237-269): columns with magnitude below
    the threshold ha collapse to zero; above it, a 3-step fixed-point
    iteration solves the scalar proximal scale.  Works on (N, 3) rows
    (point-to-point) or (N,) scalars (point-to-plane)."""
    if R.ndim == 2:
        n = jnp.linalg.norm(R, axis=-1)
    else:
        n = jnp.abs(R)
    n = jnp.maximum(n, 1e-12)
    Ba = ((2.0 / mu) * (1.0 - p)) ** (1.0 / (2.0 - p))
    ha = Ba + (p / mu) * Ba ** (p - 1.0)
    s = (Ba / n + 1.0) / 2.0
    for _ in range(3):
        s = 1.0 - (p / mu) * n ** (p - 2.0) * s ** (p - 1.0)
    w = jnp.where(n > ha, jnp.maximum(s, 0.0), 0.0)
    return R * (w[..., None] if R.ndim == 2 else w)


def _procrustes(X, U, w):
    """Weighted rigid motion X -> U (RigidMotionEstimator::point_to_point
    behavior, ICP.h:89-126): returns pose7 [wxyz|t]."""
    dtype = X.dtype
    wn = w / jnp.maximum(jnp.sum(w), 1e-12)
    mx = jnp.einsum("n,ni->i", wn, X)
    mu_ = jnp.einsum("n,ni->i", wn, U)
    S = jnp.einsum("n,ni,nj->ij", wn, X - mx, U - mu_)
    A, _, Bt = jnp.linalg.svd(S)
    d = jnp.linalg.det(Bt.T @ A.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype) * jnp.where(
        jnp.arange(3) == 2, d, 1.0))
    R = Bt.T @ D @ A.T
    t = mu_ - R @ mx
    return se3.make(so3.matrix_to_quat(R), t)


@partial(jax.jit, static_argnames=("icp_iters", "outer_iters", "cap_log2",
                                   "bucket", "point_to_plane"))
def icp_sparse(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    p: float = 0.4,
    max_corr: float = 5.0,
    mu0: float = 10.0,
    alpha: float = 1.2,
    max_mu: float = 1e5,
    icp_iters: int = 12,
    outer_iters: int = 8,
    voxel: float = 1.0,
    cap_log2: int = 15,
    bucket: int = 8,
    point_to_plane: bool = False,
) -> ICPResult:
    """Sparse ICP: minimise sum_i ||T x_i - q_i||_2^p (p < 1 is robust to
    outliers by sparsity of the residual vector) via ADMM with the
    shrinkage proximal — the reference's SICP::point_to_point /
    point_to_plane (include/FRICP-toolkit/ICP.h:275-470), re-designed
    batched/static-shape: fixed icp_iters x outer_iters lax.scan, voxel-
    hash 1-NN (5-NN + plane fit for the point-to-plane variant), and a
    closed-form weighted Procrustes (or one 6x6 GN step) per ADMM inner
    update.  max_inner is fixed at 1 (= ADMM, the reference default)."""
    m = _build_target_map(target, t_valid, voxel, bucket, cap_log2)
    dtype = source.dtype
    N = source.shape[0]
    wvalid = s_valid.astype(dtype)

    def assoc(src_w):
        if point_to_plane:
            nb, d2, ok = voxel_hash.knn(m, src_w, k=5, chunk=N)
            nn_ok = jnp.all(ok, axis=-1) & s_valid & (
                d2[:, 4] <= max_corr * max_corr)
            n, dpl, plane_ok = plane_fit(nb, nn_ok, thresh=0.3)
            return n, dpl, plane_ok.astype(dtype)
        nb, d2, ok = voxel_hash.knn(m, src_w, k=1, chunk=N)
        good = ok[:, 0] & s_valid & (d2[:, 0] <= max_corr * max_corr)
        return nb[:, 0, :], None, good.astype(dtype)

    def icp_body(carry, _):
        pose = carry
        X0 = se3.apply(pose, source)
        q, dpl, w = assoc(X0)

        if point_to_plane:
            def inner(c, _):
                pose_i, Cc, mu = c
                Xw = se3.apply(pose_i, source)
                r = jnp.einsum("ni,ni->n", q, Xw) + dpl
                Z = _shrink(r + Cc / mu, mu, p)
                # GN step on sum w (r - Z + C/mu)^2
                rr = (r - Z + Cc / mu) * w
                J = jnp.concatenate([q, jnp.cross(Xw, q)], axis=-1)
                Jw = J * w[:, None]
                H = Jw.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
                b = -(Jw.T @ rr)
                dx = jnp.linalg.solve(H, b)
                pose_i = se3.compose(
                    se3.make(so3.quat_exp(dx[3:6]), dx[0:3]), pose_i)
                r_new = jnp.einsum("ni,ni->n", q,
                                   se3.apply(pose_i, source)) + dpl
                Cc = Cc + mu * (r_new - Z)
                mu = jnp.minimum(mu * alpha, max_mu)
                return (pose_i, Cc, mu), None

            (pose, _, _), _ = jax.lax.scan(
                inner, (pose, jnp.zeros(N, dtype), jnp.asarray(mu0, dtype)),
                None, length=outer_iters)
        else:
            def inner(c, _):
                pose_i, Cc, mu = c
                Xw = se3.apply(pose_i, source)
                Z = _shrink(Xw - q + Cc / mu, mu, p)
                U = q + Z - Cc / mu
                step = _procrustes(Xw, U, w * wvalid)
                pose_i = se3.compose(step, pose_i)
                Xn = se3.apply(pose_i, source)
                Cc = Cc + mu * (Xn - q - Z)
                mu = jnp.minimum(mu * alpha, max_mu)
                return (pose_i, Cc, mu), None

            (pose, _, _), _ = jax.lax.scan(
                inner, (pose, jnp.zeros((N, 3), dtype),
                        jnp.asarray(mu0, dtype)),
                None, length=outer_iters)
        return pose, None

    pose, _ = jax.lax.scan(icp_body, init_pose, None, length=icp_iters)
    fit, n_in = fitness_score(m, se3.apply(pose, source), s_valid, max_corr)
    return ICPResult(pose, fit, n_in, jnp.isfinite(fit))


@partial(jax.jit, static_argnames=("iters", "cap_log2", "bucket",
                                   "welsch_sigma", "aa_depth"))
def icp_point2point_aa(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    init_pose: jax.Array,
    max_corr: float = 5.0,
    iters: int = 20,
    voxel: float = 1.0,
    welsch_sigma: float = 0.0,
    cap_log2: int = 15,
    bucket: int = 8,
    aa_depth: int = 5,
) -> ICPResult:
    """Anderson-accelerated point-to-point ICP (AA-ICP, ICP.h:758-922 /
    FICP with welsch_sigma=0; FR-ICP point-to-point with it > 0): same
    safeguarded mixing as icp_point2plane_aa with the closed-form
    Procrustes step as the fixed-point map."""
    m = _build_target_map(target, t_valid, voxel, bucket, cap_log2)
    dtype = source.dtype
    BIG = jnp.asarray(1e30, dtype)
    N = source.shape[0]

    def assoc_energy_step(pose):
        src_w = se3.apply(pose, source)
        nb, d2, ok = voxel_hash.knn(m, src_w, k=1, chunk=N)
        good = ok[:, 0] & s_valid & (d2[:, 0] <= max_corr * max_corr)
        base = good.astype(dtype)
        r2 = d2[:, 0]
        if welsch_sigma > 0:
            s2 = 2.0 * welsch_sigma * welsch_sigma
            w = base * jnp.exp(-r2 / s2)
            energy = jnp.sum(base * (1.0 - jnp.exp(-r2 / s2)))
        else:
            w = base
            energy = jnp.sum(base * r2)
        energy = energy / jnp.maximum(jnp.sum(base), 1.0)
        step = _procrustes(src_w, nb[:, 0, :], w)
        return energy, se3.compose(step, pose)

    D = aa_depth

    def body(c, _):
        u_cur, fallback_u, e_prev, Us, Fs, hist_n = c
        energy, pose_gn = assoc_energy_step(_u_to_pose(u_cur))
        u_gn = _pose_to_u(pose_gn)
        bad = energy > e_prev
        u_base = jnp.where(bad, fallback_u, u_gn)
        f_base = u_base - jnp.where(bad, fallback_u, u_cur)
        hist_n = jnp.where(bad, 0, hist_n)
        e_acc = jnp.where(bad, e_prev, energy)
        Us = jnp.roll(Us, 1, axis=0).at[0].set(u_base)
        Fs = jnp.roll(Fs, 1, axis=0).at[0].set(f_base)
        hist_n = jnp.minimum(hist_n + 1, D)
        mask = (jnp.arange(D - 1) < (hist_n - 1)).astype(dtype)
        dF = (Fs[0][None] - Fs[1:]) * mask[:, None]
        dU = (Us[0][None] - Us[1:]) * mask[:, None]
        A = dF @ dF.T + 1e-10 * jnp.eye(D - 1, dtype=dtype)
        gamma = jnp.linalg.solve(A, dF @ Fs[0])
        u_aa = Us[0] + Fs[0] - (dU + dF).T @ gamma
        u_next = jnp.where(hist_n > 1, u_aa, u_base + 0.0)
        return (u_next, u_gn, e_acc, Us, Fs, hist_n), energy

    u0 = _pose_to_u(init_pose)
    c0 = (u0, u0, BIG, jnp.zeros((D, 6), dtype), jnp.zeros((D, 6), dtype),
          jnp.asarray(0, jnp.int32))
    (_, fallback_u, _, *_), _ = jax.lax.scan(body, c0, None, length=iters)
    pose = _u_to_pose(fallback_u)
    fit, n_in = fitness_score(m, se3.apply(pose, source), s_valid, max_corr)
    return ICPResult(pose, fit, n_in, jnp.isfinite(fit))


# Registration-mode registry mirroring the reference's selection surface
# (include/FRICP-toolkit/registeration.h:20-27):
#   0 ICP | 1 AA-ICP | 2 Fast ICP | 3 Robust ICP | 4 Fast&Robust ICP |
#   5 ICP point-to-plane | 6 Robust point-to-plane | 7 Sparse ICP |
#   8 Sparse ICP point-to-plane
REG_MODES = {
    0: "icp", 1: "aa_icp", 2: "ficp", 3: "ricp", 4: "fr_icp",
    5: "ppl", 6: "rppl", 7: "sparse_icp", 8: "sicp_ppl",
}


def register_run(mode, source, s_valid, target, t_valid, init_pose,
                 max_corr: float = 5.0, voxel: float = 1.0,
                 iters: int = 25, welsch_sigma: float = 0.5,
                 sparse_p: float = 0.4) -> ICPResult:
    """Registeration::run analog (registeration.h:36-175): dispatch one
    of the 9 regMode algorithms.  `mode` is an int id or a REG_MODES
    name."""
    if isinstance(mode, str):
        inv = {v: k for k, v in REG_MODES.items()}
        mode = inv[mode]
    common = dict(max_corr=max_corr, voxel=voxel)
    if mode == 0:
        return icp_point2point(source, s_valid, target, t_valid, init_pose,
                               iters=iters, **common)
    if mode == 1:
        return icp_point2point_aa(source, s_valid, target, t_valid,
                                  init_pose, iters=iters, welsch_sigma=0.0,
                                  **common)
    if mode == 2:  # Fast ICP = Anderson-accelerated point-to-point
        return icp_point2point_aa(source, s_valid, target, t_valid,
                                  init_pose, iters=iters, welsch_sigma=0.0,
                                  **common)
    if mode == 3:  # Robust ICP = Welsch point-to-point
        return icp_point2point(source, s_valid, target, t_valid, init_pose,
                               iters=iters, welsch_sigma=welsch_sigma,
                               **common)
    if mode == 4:  # Fast & Robust = Welsch + Anderson
        return icp_point2point_aa(source, s_valid, target, t_valid,
                                  init_pose, iters=iters,
                                  welsch_sigma=welsch_sigma, **common)
    if mode == 5:
        return icp_point2plane(source, s_valid, target, t_valid, init_pose,
                               iters=iters, **common)
    if mode == 6:
        return icp_point2plane_aa(source, s_valid, target, t_valid,
                                  init_pose, iters=iters,
                                  welsch_sigma=welsch_sigma, **common)
    if mode == 7:
        return icp_sparse(source, s_valid, target, t_valid, init_pose,
                          p=sparse_p, point_to_plane=False, **common)
    if mode == 8:
        return icp_sparse(source, s_valid, target, t_valid, init_pose,
                          p=sparse_p, point_to_plane=True, **common)
    raise ValueError(f"unknown registration mode {mode}")
