"""Certifiable global registration: FPFH-style correspondences + GNC-TLS.

Behavioral analog of the reference's TEASER++ wrapper
(reference: include/teaser-toolkit/fpfh_teaser.{hpp,cpp} — FPFH feature
matching feeding a truncated-least-squares certifiable solver; declared
in the tree but never linked into an executable, CMakeLists).  Rebuilt
TPU-first:

* keypoint normals + a simplified FPFH descriptor (the classic
  (alpha, phi, theta) pair-feature histograms of Rusu et al., one
  11-bin histogram per angle -> 33-D), batched over voxel-hash kNN
  neighborhoods — no per-point loops;
* mutual-nearest-neighbor matching as one descriptor-distance matmul;
* robust SE3 fit by graduated non-convexity with a truncated-least-
  squares cost (GNC-TLS, Yang & Carlone): closed-form weighted
  Procrustes inner solves with Black-Rangarajan weight updates — the
  certifiable-registration family TEASER belongs to, tolerant to
  60-90% outlier correspondences where ICP diverges.

Everything is static-shape jittable JAX.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..map import voxel_hash
from ..utils import se3
from .icp import fitness_score

__all__ = ["RegistrationResult", "fpfh_descriptors", "match_mutual",
           "gnc_tls_register", "register_fpfh_gnc"]


class RegistrationResult(NamedTuple):
    pose: jax.Array  # (7,) [quat wxyz | t] source -> target
    inliers: jax.Array  # (M,) bool — correspondence inlier mask
    n_inliers: jax.Array  # () int32
    fitness: jax.Array  # () mean sq corr distance on the full cloud


def _normals_from_knn(pts: jax.Array, nb: jax.Array, ok: jax.Array) -> jax.Array:
    """Unit normals per point from k neighbor points (PCA smallest axis)."""
    from ..core.measurement import _sym3_smallest_eig

    w = ok.astype(pts.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    c = jnp.sum(nb * w, axis=1) / cnt
    q = (nb - c[:, None, :]) * w
    C = jnp.einsum("nki,nkj->nij", q, q)
    n, _ = _sym3_smallest_eig(C)
    # orient toward the viewpoint origin (sign convention only)
    flip = jnp.sum(n * pts, axis=-1) > 0
    return jnp.where(flip[:, None], -n, n)


@partial(jax.jit, static_argnames=("k", "bins", "cap_log2"))
def fpfh_descriptors(
    pts: jax.Array,
    valid: jax.Array,
    radius: float = 1.0,
    k: int = 16,
    bins: int = 11,
    cap_log2: int = 14,
) -> jax.Array:
    """Simplified FPFH: per-point 3*bins histogram of Darboux-frame pair
    angles (alpha, phi, theta) over the k-NN neighborhood, then one
    neighbor-averaging pass (the S/FPFH two-stage structure).

    Returns (N, 3*bins) L1-normalized descriptors.
    """
    N = pts.shape[0]
    dtype = pts.dtype
    m = voxel_hash.make_map(capacity_log2=cap_log2, bucket=8,
                            voxel_size=radius, dtype=dtype)
    m = voxel_hash.insert(m, pts, valid)
    nb, d2, ok = voxel_hash.knn(m, pts, k=k, chunk=min(N, 32768))
    ok = ok & (d2 <= radius * radius) & valid[:, None]
    normals = _normals_from_knn(pts, nb, ok)

    # neighbor normals: the surface normal AT each neighbor position,
    # from its own k-NN neighborhood (one more batched query)
    nbf = nb.reshape(-1, 3)
    nb2, d2b, okb = voxel_hash.knn(m, nbf, k=k, chunk=min(nbf.shape[0],
                                                          32768))
    okb = okb & (d2b <= radius * radius)
    n_t = _normals_from_knn(nbf, nb2, okb).reshape(N, k, 3)

    # Darboux-frame pair features (alpha, phi, theta) of Rusu's FPFH
    d = nb - pts[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    u = jnp.broadcast_to(normals[:, None, :], d.shape)  # (N, k, 3)
    dn = d / jnp.maximum(dist, 1e-9)[..., None]
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.einsum("nkj,nkj->nk", v, n_t)
    phi = jnp.einsum("nkj,nkj->nk", u, dn)
    theta = jnp.arctan2(
        jnp.einsum("nkj,nkj->nk", w, n_t),
        jnp.einsum("nkj,nkj->nk", u, n_t),
    )

    def hist(x, lo, hi):
        xb = jnp.clip((x - lo) / (hi - lo) * bins, 0, bins - 1e-4)
        idx = xb.astype(jnp.int32)  # (N, k)
        oh = jax.nn.one_hot(idx, bins, dtype=dtype)  # (N, k, bins)
        return jnp.sum(oh * ok[..., None], axis=1)

    H = jnp.concatenate(
        [hist(alpha, -1.0, 1.0), hist(phi, -1.0, 1.0),
         hist(theta, -jnp.pi, jnp.pi)], axis=-1,
    )  # (N, 3*bins) — the SPFH stage

    # FPFH stage: add distance-weighted neighbor SPFHs.  Neighbor
    # identity is recovered by matching neighbor positions back to point
    # indices via the voxel map is gather-heavy; instead average the
    # histograms of the k nearest DESCRIPTOR rows by position using the
    # same kNN indices is unavailable (knn returns points, not indices),
    # so approximate with a radius-bin smoothing: neighbors share voxel
    # cells, and the per-cell mean SPFH is the dominant term.  We use a
    # cheap self+neighbor mix through one more kNN over a coarser map.
    mc = voxel_hash.make_map(capacity_log2=cap_log2, bucket=4,
                             voxel_size=2.0 * radius, dtype=dtype)
    mc = voxel_hash.insert(mc, pts, valid)
    nb2, d22, ok2 = voxel_hash.knn(mc, pts, k=4, chunk=min(N, 32768))
    wgt = jnp.where(ok2, 1.0 / jnp.maximum(d22, 1e-2), 0.0)
    # positions -> cell-mean histograms: scatter SPFH into the coarse map
    # cells, then gather each point's own cell mean as the "neighborhood
    # SPFH" proxy
    ijk = voxel_hash._voxel_of(pts, mc.voxel_size)
    slots = voxel_hash._lookup_slots(mc.key, ijk, 16)
    Csz = mc.capacity
    safe = jnp.where(slots >= 0, slots, Csz)
    sums = jnp.zeros((Csz + 1, H.shape[1]), dtype).at[safe].add(
        H * valid[:, None])
    cnts = jnp.zeros(Csz + 1, dtype).at[safe].add(valid.astype(dtype))
    cell_mean = sums[jnp.minimum(safe, Csz)] / jnp.maximum(
        cnts[jnp.minimum(safe, Csz)], 1.0)[:, None]
    F = H + 0.5 * cell_mean
    del nb2, wgt
    return F / jnp.maximum(jnp.sum(F, axis=-1, keepdims=True), 1e-9)


@partial(jax.jit, static_argnames=("max_corr",))
def match_mutual(
    desc_s: jax.Array,
    valid_s: jax.Array,
    desc_t: jax.Array,
    valid_t: jax.Array,
    max_corr: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mutual-nearest-neighbor descriptor matching (one matmul each way).

    Returns (src_idx (M,), tgt_idx (M,), ok (M,)) with M = max_corr,
    selected by best mutual distance.
    """
    BIG = jnp.asarray(1e9, desc_s.dtype)
    # squared L2 via matmul (MXU)
    g = desc_s @ desc_t.T
    ss = jnp.sum(desc_s * desc_s, axis=1)
    tt = jnp.sum(desc_t * desc_t, axis=1)
    d2 = ss[:, None] + tt[None, :] - 2.0 * g
    d2 = jnp.where(valid_s[:, None] & valid_t[None, :], d2, BIG)
    best_t = jnp.argmin(d2, axis=1)  # (Ns,)
    best_s = jnp.argmin(d2, axis=0)  # (Nt,)
    mutual = best_s[best_t] == jnp.arange(d2.shape[0])
    score = jnp.where(mutual & valid_s, -jnp.take_along_axis(
        d2, best_t[:, None], axis=1)[:, 0], -BIG)
    top, src_idx = jax.lax.top_k(score, max_corr)
    return src_idx, best_t[src_idx], top > -BIG


@partial(jax.jit, static_argnames=("gnc_steps", "inner_iters"))
def gnc_tls_register(
    src: jax.Array,
    dst: jax.Array,
    ok: jax.Array,
    noise_bound: float = 0.3,
    gnc_steps: int = 64,
    inner_iters: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """SE3 from correspondences by GNC with truncated least squares.

    src/dst: (M, 3) matched pairs (src_i <-> dst_i), ok masks valid rows.
    Graduated non-convexity: mu starts near-convex (scaled to the max
    initial residual) and shrinks by 1.4 per step toward the TLS limit
    (Yang et al., GNC-TLS); each step solves a weighted Procrustes in
    closed form and updates Black-Rangarajan weights
    w_i = (mu c^2 / (r_i^2 + mu c^2))^2.  gnc_steps must cover
    log_1.4(mu0) — 64 covers mu0 up to ~2e9; steps past mu<=1e-3 are
    cheap no-ops.  Returns (pose (7,), inlier mask (M,)).
    """
    dtype = src.dtype
    c2 = jnp.asarray(noise_bound * noise_bound, dtype)

    def procrustes(w):
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
        mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
        P = (src - mu_s) * w[:, None]
        Q = dst - mu_d
        H = P.T @ Q
        U, S, Vt = jnp.linalg.svd(H)
        dsign = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype)
                     + jnp.array([0.0, 0.0, 1.0], dtype) * dsign)
        R = Vt.T @ D @ U.T
        t = mu_d - R @ mu_s
        return R, t

    w0 = ok.astype(dtype)
    R0, t0 = procrustes(w0)
    r2 = jnp.sum((dst - src @ R0.T - t0) ** 2, axis=1)
    # start near-convex: mu such that even max-residual terms keep weight
    mu0 = jnp.maximum(1.0, 2.0 * jnp.max(jnp.where(ok, r2, 0.0)) / c2)

    def step(carry, _):
        mu, R, t = carry
        r2 = jnp.sum((dst - src @ R.T - t) ** 2, axis=1)
        th = mu * c2
        w = (th / (r2 + th)) ** 2
        w = jnp.where(ok, w, 0.0)
        R, t = procrustes(w)
        return (jnp.maximum(mu / 1.4, 1e-3), R, t), None

    (mu, R, t), _ = jax.lax.scan(step, (mu0, R0, t0), None, length=gnc_steps)
    r2 = jnp.sum((dst - src @ R.T - t) ** 2, axis=1)
    inl = ok & (r2 <= c2)

    # final polish on hard inliers
    Rf, tf = procrustes(inl.astype(dtype))
    pose = se3.from_rot_trans(Rf, tf)
    return pose, inl


def register_fpfh_gnc(
    source: jax.Array,
    s_valid: jax.Array,
    target: jax.Array,
    t_valid: jax.Array,
    feature_radius: float = 1.0,
    noise_bound: float = 0.5,
    max_corr: int = 512,
) -> RegistrationResult:
    """End-to-end global registration: FPFH-style descriptors on both
    clouds, mutual matching, GNC-TLS solve (the fpfh_teaser pipeline,
    fpfh_teaser.cpp:49-139, without an initial guess).

    Delivers a coarse pose inside the ICP convergence basin from ANY
    initial misalignment (accuracy is bounded by the clouds' sampling
    density through the correspondences); refine with icp_multiscale."""
    ds = fpfh_descriptors(source, s_valid, radius=feature_radius)
    dt = fpfh_descriptors(target, t_valid, radius=feature_radius)
    si, ti, ok = match_mutual(ds, s_valid, dt, t_valid, max_corr=max_corr)
    pose, inl = gnc_tls_register(source[si], target[ti], ok,
                                 noise_bound=noise_bound)
    m = voxel_hash.make_map(capacity_log2=15, bucket=8, voxel_size=1.0,
                            dtype=source.dtype)
    m = voxel_hash.insert(m, target, t_valid)
    fit, _ = fitness_score(m, se3.apply(pose, source), s_valid, 5.0)
    return RegistrationResult(
        pose=pose,
        inliers=inl,
        n_inliers=jnp.sum(inl.astype(jnp.int32)),
        fitness=fit,
    )
