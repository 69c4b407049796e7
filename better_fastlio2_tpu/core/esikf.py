"""Iterated error-state Kalman filter (ESIKF) — predict and update.

TPU-native re-design of the IKFoM esekf core
(reference: include/IKFoM_toolkit/esekfom/esekfom.hpp — `predict` at :280,
`update_iterated_dyn_share_modified` at :1620) specialised to the LIO state
of use-ikfom.hpp.  Instead of the reference's generic per-sub-manifold
assembly loops, the 23x23 covariance transport matrices are built with
fixed block structure; everything is traceable, static-shape JAX.

Design decisions vs the reference:
* The measurement update is fixed-shape: the point-to-plane rows arrive
  padded to a static N with a validity mask (replacing the dynamic
  compaction of laserMapping.cpp:1944-1954).  Masked rows contribute zero
  to H^T H and H^T h, which is numerically identical to compaction.
* Only the m >= n gain branch is implemented ((H^T H + (P/R)^-1)^-1 H^T h,
  esekfom.hpp:1788-1816): LiDAR scans give thousands of valid rows against
  n = 23.  (The n > m branch of :1720-1750 is dead weight for LIO.)
* The reference's `scalar_type(1/2)` integer-division quirk makes several
  Exp() calls evaluate to identity (esekfom.hpp:313,345); we use the true
  exponential — second-order difference, strictly more correct.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from ..utils import s2 as s2m
from ..utils import so3
from .state import ERR_DIM, NOISE_DIM, State, boxminus, boxplus, oplus_flat

__all__ = [
    "get_f",
    "df_dx",
    "df_dw",
    "predict",
    "MeasurementOut",
    "update_iterated",
    "default_Q",
]


def default_Q(dtype=jnp.float32) -> jax.Array:
    """Process noise covariance diag (use-ikfom.hpp:44-52):
    ng=1e-4, na=1e-4, nbg=1e-5, nba=1e-5."""
    d = jnp.concatenate(
        [
            jnp.full(3, 0.0001, dtype),
            jnp.full(3, 0.0001, dtype),
            jnp.full(3, 0.00001, dtype),
            jnp.full(3, 0.00001, dtype),
        ]
    )
    return jnp.diag(d)


def get_f(x: State, acc: jax.Array, gyro: jax.Array) -> jax.Array:
    """Flat state derivative f(x, u): 24-vector (use-ikfom.hpp:56-68).

    pos_dot = vel; rot_dot = gyro - bg; vel_dot = R(acc - ba) + grav.
    """
    omega = gyro - x.bg
    a_inertial = so3.quat_rotate(x.rot, acc - x.ba)
    z3 = jnp.zeros(3, x.dtype)
    return jnp.concatenate(
        [x.vel, omega, z3, z3, a_inertial + x.grav, z3, z3, z3]
    )


def df_dx(x: State, acc: jax.Array, gyro: jax.Array) -> jax.Array:
    """∂f/∂(error state): 24x23 (use-ikfom.hpp:70-86)."""
    dt = x.dtype
    J = jnp.zeros((24, ERR_DIM), dt)
    R = so3.quat_to_matrix(x.rot)
    J = J.at[0:3, 12:15].set(jnp.eye(3, dtype=dt))  # dpos/dvel
    J = J.at[12:15, 3:6].set(-R @ so3.hat(acc - x.ba))  # dvel/drot
    J = J.at[12:15, 18:21].set(-R)  # dvel/dba
    # dvel/dgrav: S2_Mx at delta=0 => -hat(grav) @ Bx(grav)  (use-ikfom.hpp:80-83)
    Mx = s2m.s2_mx(x.grav, jnp.zeros(2, dt))
    J = J.at[12:15, 21:23].set(Mx)
    J = J.at[3:6, 15:18].set(-jnp.eye(3, dtype=dt))  # drot/dbg
    return J


def df_dw(x: State) -> jax.Array:
    """∂f/∂(noise): 24x12 (use-ikfom.hpp:89-97).

    Noise order [ng, na, nbg, nba]."""
    dt = x.dtype
    J = jnp.zeros((24, NOISE_DIM), dt)
    J = J.at[3:6, 0:3].set(-jnp.eye(3, dtype=dt))
    J = J.at[12:15, 3:6].set(-so3.quat_to_matrix(x.rot))
    J = J.at[15:18, 6:9].set(jnp.eye(3, dtype=dt))
    J = J.at[18:21, 9:12].set(jnp.eye(3, dtype=dt))
    return J


def _flat_to_err_rows(M_flat: jax.Array, x_new: State, x_before: State, seg_rot,
                      seg_ext, seg_s2) -> jax.Array:
    """Project 24-row flat Jacobian to 23 error rows with manifold maps.

    Mirrors the vect/SO3/S2 row loops of esekfom.hpp:291-372: vect rows copy
    through, SO3 rows are premultiplied by A(seg), the S2 row pair by
    -Nx * Exp(seg) * hat(grav_before) * A(seg)^T.
    """
    A_rot = so3.A_matrix(seg_rot)
    A_ext = so3.A_matrix(seg_ext)
    Nx = s2m.s2_nx_yy(x_new.grav)
    R_s2 = so3.so3_exp_matrix(seg_s2)
    hat_g = so3.hat(x_before.grav)
    S2_map = -Nx @ R_s2 @ hat_g @ so3.A_matrix(seg_s2).T  # 2x3

    return jnp.concatenate(
        [
            M_flat[0:3],
            A_rot @ M_flat[3:6],
            A_ext @ M_flat[6:9],
            M_flat[9:21],
            S2_map @ M_flat[21:24],
        ],
        axis=0,
    )


def predict_mean(
    x: State, acc: jax.Array, gyro: jax.Array, dt
) -> State:
    """Mean-only forward step: x ⊞ f(x,u)·dt (esekfom.hpp:280-287)."""
    return oplus_flat(x, get_f(x, acc, gyro), dt)


def predict_jacobians(
    x: State, x_new: State, acc: jax.Array, gyro: jax.Array, dt
) -> tuple[jax.Array, jax.Array]:
    """(F_x, F_w) of the step x -> x_new (esekfom.hpp:290-402).

    Split from `predict` so the IMU chain can propagate means serially
    (cheap small ops) and then build ALL steps' Jacobians batched via
    vmap + compose the covariance with an associative scan — the serial
    per-sample 23x23 algebra dominated propagation cost on TPU."""
    dtype = x.dtype
    f_flat = get_f(x, acc, gyro)
    fx_flat = df_dx(x, acc, gyro)
    fw_flat = df_dw(x)

    seg_rot = -f_flat[3:6] * dt
    seg_ext = -f_flat[6:9] * dt
    seg_s2 = f_flat[21:24] * dt

    # F_x1: block-diagonal manifold transport (esekfom.hpp:290-372).
    F_x1 = jnp.eye(ERR_DIM, dtype=dtype)
    F_x1 = F_x1.at[3:6, 3:6].set(so3.so3_exp_matrix(seg_rot))
    F_x1 = F_x1.at[6:9, 6:9].set(so3.so3_exp_matrix(seg_ext))
    Nx = s2m.s2_nx_yy(x_new.grav)
    Mx = s2m.s2_mx(x.grav, jnp.zeros(2, dtype))
    F_x1 = F_x1.at[21:23, 21:23].set(Nx @ so3.so3_exp_matrix(seg_s2) @ Mx)

    fx_err = _flat_to_err_rows(fx_flat, x_new, x, seg_rot, seg_ext, seg_s2)
    fw_err = _flat_to_err_rows(fw_flat, x_new, x, seg_rot, seg_ext, seg_s2)

    return F_x1 + fx_err * dt, fw_err * dt


def predict(
    x: State, P: jax.Array, acc: jax.Array, gyro: jax.Array, dt, Q: jax.Array
) -> tuple[State, jax.Array]:
    """One forward-propagation step (esekfom.hpp:280-402).

    x <- x ⊞ f(x,u)·dt;  P <- F_x P F_x^T + (dt F_w) Q (dt F_w)^T.
    `dt` may be 0 (masked/padded IMU sample): the state is unchanged and
    F_x = I, so P passes through exactly.
    """
    x_new = predict_mean(x, acc, gyro, dt)
    F_x, F_w = predict_jacobians(x, x_new, acc, gyro, dt)
    P_new = F_x @ P @ F_x.T + F_w @ Q @ F_w.T
    return x_new, P_new


class MeasurementOut(NamedTuple):
    """Output of a dyn-share measurement model (dyn_share_datastruct analog,
    esekfom.hpp:80-89), fixed-shape.

    h_x:   (N, 12) Jacobian rows w.r.t. [pos?, ...] — reference convention:
           columns 0:3 world-normal (d/dpos), 3:6 d/drot, 6:9 d/dext_R,
           9:12 d/dext_T (laserMapping.cpp:1966-2002).
    h:     (N,) residual vector (reference stores -pd2).
    mask:  (N,) bool — valid rows.
    aux:   arbitrary pytree threaded back to the model (e.g. kNN cache).
    gram:  optional (8, 8) precomputed Gram matrix from the fused Pallas
           measurement kernel (ops/pallas_kernels.fused_normal_eqs):
           gram[:K,:K] = H^T W H, gram[:K,6] = H^T W h, gram[7,7] =
           n_valid.  When set, h_x/h/mask may be empty — the update
           consumes the normal equations directly.
    """

    h_x: jax.Array
    h: jax.Array
    mask: jax.Array
    aux: object = None
    gram: jax.Array | None = None
    # Optional () bool: "a post-convergence re-association would change
    # nothing" — when set and True, the iterated update may exit on the
    # FIRST converged pass instead of running the reference's
    # confirmation pass (esekfom.hpp:1846-1851), whose only purpose is
    # the re-association.  The cached-association fused model sets this
    # from its lazy-refresh trigger (measurement.make_measure_fn
    # early_converge); None keeps reference pass semantics.
    early_ok: jax.Array | None = None


def _dx_transport(dx: jax.Array, x: State, x_prop: State) -> tuple[jax.Array, jax.Array]:
    """Build the block-diag tangent-transport T for the current dx so that
    dx_new = T dx and P <- T P T^T (esekfom.hpp:1662-1703).

    SO3 blocks: A(dx_seg)^T.  S2 block: Nx(x.grav) @ Mx(x_prop.grav, dx_seg).
    Returns (T, dx_new).
    """
    dtype = dx.dtype
    T = jnp.eye(ERR_DIM, dtype=dtype)
    T = T.at[3:6, 3:6].set(so3.A_matrix(dx[3:6]).T)
    T = T.at[6:9, 6:9].set(so3.A_matrix(dx[6:9]).T)
    Nx = s2m.s2_nx_yy(x.grav)
    Mx = s2m.s2_mx(x_prop.grav, dx[21:23])
    T = T.at[21:23, 21:23].set(Nx @ Mx)
    return T, T @ dx


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Tiny-matrix product as a broadcast-multiply-reduce instead of a
    `dot`: XLA lowers sub-MXU dots to separate kernels that serialize
    the gain glue into a ~40-kernel launch chain (~3 us each on v5e,
    tools/probe_glue.py); the broadcast form stays inside elementwise
    fusions.  Only for dims ~O(23) — never use on point-count axes."""
    return (a[..., :, :, None] * b[..., None, :, :]).sum(axis=-2)


def _mv(a: jax.Array, v: jax.Array) -> jax.Array:
    """Tiny matrix-vector product, fusion-friendly (see _mm)."""
    return (a * v[..., None, :]).sum(axis=-1)


def _inv3(M: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate/det) — latency-free vs a
    factorization on TPU."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    # sign-preserving det floor: a near-singular block (degenerate
    # geometry can push the leading principal block of the nonsymmetric
    # M6 toward singular even though spec(M6) >= 1) degrades into a
    # large-but-finite inverse instead of inf/nan, which the non-finite
    # rollback upstream then catches as a bounded bad update
    tiny = jnp.asarray(1e-20, M.dtype)
    det = jnp.where(jnp.abs(det) < tiny,
                    jnp.where(det < 0, -tiny, tiny), det)
    return jnp.stack([
        jnp.stack([A, B, C]), jnp.stack([D, E, F]), jnp.stack([G, H, I])
    ]) / det


def _inv6(M: jax.Array) -> jax.Array:
    """Closed-form 6x6 inverse via 3x3 block Schur complement — every
    step is adjugate/det 3x3 arithmetic (_inv3), no factorization: a
    pivoted LU on TPU is a serial latency chain, and the fused update
    pays it once per ESIKF iteration.  Valid for the well-conditioned
    M6 = I + HTH (P/R) + jitter the Woodbury gain builds."""
    A, B = M[0:3, 0:3], M[0:3, 3:6]
    C, D = M[3:6, 0:3], M[3:6, 3:6]
    Ai = _inv3(A)
    AiB = _mm(Ai, B)
    CAi = _mm(C, Ai)
    Si = _inv3(D - _mm(C, AiB))
    TR = -_mm(AiB, Si)
    BL = -_mm(Si, CAi)
    TL = Ai - _mm(AiB, BL)
    return jnp.concatenate(
        [jnp.concatenate([TL, TR], axis=1),
         jnp.concatenate([BL, Si], axis=1)], axis=0)


def _inv2(M: jax.Array) -> jax.Array:
    det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    tiny = jnp.asarray(1e-20, M.dtype)
    det = jnp.where(jnp.abs(det) < tiny,
                    jnp.where(det < 0, -tiny, tiny), det)
    return jnp.stack([
        jnp.stack([M[1, 1], -M[0, 1]]), jnp.stack([-M[1, 0], M[0, 0]])
    ]) / det


def _transport_inv(T: jax.Array) -> jax.Array:
    """Inverse of the block-diagonal transport map from _dx_transport:
    identity except the two 3x3 SO3 blocks and the 2x2 S2 block —
    inverted in closed form (tiny serial factorizations are
    latency-bound on TPU)."""
    Ti = jnp.eye(ERR_DIM, dtype=T.dtype)
    Ti = Ti.at[3:6, 3:6].set(_inv3(T[3:6, 3:6]))
    Ti = Ti.at[6:9, 6:9].set(_inv3(T[6:9, 6:9]))
    Ti = Ti.at[21:23, 21:23].set(_inv2(T[21:23, 21:23]))
    return Ti


def update_iterated(
    x_prop: State,
    P_prop: jax.Array,
    measure_fn: Callable[[State, jax.Array, object], MeasurementOut],
    aux0: object,
    max_iter: int = 4,
    R: float = 0.001,
    limit: float = 0.001,
    psum_axis: str | None = None,
    n_cols: int = 12,
    fused: bool = False,
):
    """Iterated dyn-share measurement update (esekfom.hpp:1620-1938).

    measure_fn(x, converged, aux) -> MeasurementOut is the h_share_model
    analog; `converged` mirrors dyn_share.converge, which the reference
    model uses to decide whether to re-run the kNN association
    (laserMapping.cpp:1906-1913).  `aux` threads the association cache.

    Iteration control mirrors the reference exactly: up to max_iter+1
    passes (C++ i = -1 .. max_iter-1), `t` counts converged passes, the
    loop exits when t > 1 or the pass budget is exhausted, and the
    converge flag is forced true on the penultimate pass so the model
    re-associates once more (esekfom.hpp:1825-1851).

    psum_axis: inside shard_map with measurement rows sharded over that
    mesh axis, the 12x12/12 normal equations and the valid-row count are
    psum'd across devices before the (replicated) tiny solve — the
    multi-chip data parallelism of SURVEY P1 (156 floats of ICI traffic
    per iteration).

    Returns (x_post, P_post, aux, info-dict).
    """
    dtype = P_prop.dtype
    eyeN = jnp.eye(ERR_DIM, dtype=dtype)
    eyeP = jnp.eye(ERR_DIM, dtype=dtype)
    # does the model emit the precomputed Gram matrix (the fused-solve /
    # Woodbury path)?  Detected structurally so callers need not keep the
    # `fused` flag in sync with their measure_fn
    has_gram = jax.eval_shape(
        measure_fn, x_prop, jnp.array(True), aux0
    ).gram is not None
    del fused  # structural detection supersedes the caller's flag
    fused = has_gram
    # (P_prop/R)^-1 once per scan: per-iteration P = T P_prop T^T with
    # block-diagonal T, so (P/R)^-1 = R T^-T P_prop^-1 T^-1 — the
    # per-iteration 23x23 Cholesky of the prior collapses to two small
    # block inverses + two matmuls (tiny factorizations are serial
    # latency chains on TPU, ~0.1-0.2 ms each)
    # (the fused/Woodbury gain path never touches the prior inverse)
    if fused:
        Pp_inv = None
    else:
        P_sym = 0.5 * (P_prop + P_prop.T)
        Pp_inv = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(P_sym + 1e-9 * R * eyeP), True), eyeP
        )

    def cond(c):
        return jnp.logical_not(c["done"])

    def body(c):
        x, t, conv, aux, i = c["x"], c["t"], c["conv"], c["aux"], c["i"]
        m = measure_fn(x, conv, aux)
        # measurement models may emit only the leading K Jacobian columns
        # (K=6 when extrinsic estimation is off — cols 6:12 are zero,
        # laserMapping.cpp:1983-1994): the normal equations shrink to KxK
        K = n_cols
        if m.gram is not None:
            # fused path: the (8,8) Gram already holds the reduction
            assert K == 6, K
            G = m.gram.astype(dtype)
            if psum_axis is not None:
                G = jax.lax.psum(G, psum_axis)
            HTH = G[:K, :K]
            HTh = G[:K, 6]
            n_valid = G[7, 7]
        else:
            w = m.mask.astype(dtype)
            h_x = m.h_x * w[:, None]
            h = m.h * w
            n_valid = jnp.sum(w)
            assert h_x.shape[1] == n_cols, (h_x.shape, n_cols)
            HTH = h_x.T @ h_x  # (K, K)
            HTh = h_x.T @ h  # (K,)
            if psum_axis is not None:
                HTH = jax.lax.psum(HTH, psum_axis)
                HTh = jax.lax.psum(HTh, psum_axis)
                n_valid = jax.lax.psum(n_valid, psum_axis)

        dx = boxminus(x, x_prop)
        valid = n_valid >= 1.0  # laserMapping.cpp:1956-1961 guard
        if m.gram is not None:
            # Woodbury form of the gain columns: with A = S_inv + U HTH Uᵀ
            # (U = the first K columns of I) and S_inv = R (T P_prop Tᵀ)⁻¹
            # = R P⁻¹,
            #   A⁻¹ U = S⁻¹ U (I_K + HTH · Uᵀ S⁻¹ U)⁻¹
            #         = (P/R)[:, :K] (I_K + HTH (P/R)[:K, :K])⁻¹
            # — algebraically identical to the 23×23 Cholesky path but
            # with ONE K×K solve per iteration and no prior inverse at
            # all (the tiny serial factorizations are latency chains on
            # TPU; this is the fused-solve fast path).
            #
            # Only (T P_prop Tᵀ)[:, :K] is ever consumed, and T is
            # block-diagonal (identity except the two SO3 3×3 blocks and
            # the S2 2×2), so the two 23×23 transport matmuls collapse
            # to six small block products — the per-iteration small-op
            # latency chain is the measured cost here, not FLOPs.
            # every product below is a tiny-matrix _mm/_mv broadcast
            # reduce, NOT a dot — sub-MXU dots each lower to their own
            # kernel and serialize the glue into a ~40-launch chain
            # (~0.12 ms/pass measured, tools/probe_glue.py); the
            # broadcast forms stay inside XLA's elementwise fusions
            A3 = so3.A_matrix(dx[3:6]).T
            A6 = so3.A_matrix(dx[6:9]).T
            Nx = s2m.s2_nx_yy(x.grav)
            Mx = s2m.s2_mx(x_prop.grav, dx[21:23])
            S2b = _mm(Nx, Mx)
            dx_new = dx.at[3:6].set(_mv(A3, dx[3:6])) \
                       .at[6:9].set(_mv(A6, dx[6:9])) \
                       .at[21:23].set(_mv(S2b, dx[21:23]))
            # C = P_prop @ (T[:K,:])ᵀ — right-apply the K leading rows of
            # T (identity rows 0:3, A3 block at 3:6), then left-apply T's
            # row blocks
            C = jnp.concatenate(
                [P_prop[:, 0:3], _mm(P_prop[:, 3:6], A3.T)], axis=1)
            C = C.at[3:6].set(_mm(A3, C[3:6])) \
                 .at[6:9].set(_mm(A6, C[6:9])) \
                 .at[21:23].set(_mm(S2b, C[21:23]))
            P6 = C / R
            eyeK = jnp.eye(K, dtype=dtype)
            M6 = eyeK + _mm(HTH, P6[:K])
            # conditioning guard (the analog of the non-fused path's
            # 1e-9*R prior jitter): relative diagonal damping at ~1e-6 of
            # the matrix scale — far below f32 round-off in the solve,
            # but keeps the unsymmetrized LU bounded if P drifts
            # near-indefinite under long f32 accumulation
            M6 = M6 + (1e-6 / K) * jnp.sum(jnp.abs(jnp.diag(M6))) * eyeK
            # X = solve(M6^T, P6^T)^T == P6 @ M6^-1; the closed-form
            # block inverse avoids the serial pivoted-LU lowering
            P_inv12 = _mm(P6, _inv6(M6))
        else:
            T, dx_new = _dx_transport(dx, x, x_prop)
            P = T @ P_prop @ T.T
            P = 0.5 * (P + P.T)
            # (H^T H + (P/R)^-1)^-1: (P/R)^-1 from the precomputed prior
            # inverse via the closed-form transport inverse (see above);
            # the single remaining 23x23 Cholesky solves only the K
            # columns the gain needs.  Symmetrise — f32 transport
            # products drift.
            Ti = _transport_inv(T)
            S_inv = R * (Ti.T @ Pp_inv @ Ti)
            S_inv = 0.5 * (S_inv + S_inv.T)
            A = S_inv.at[:K, :K].add(HTH)
            # A is SPD (S_inv SPD + HTH PSD) — Cholesky beats LU here
            P_inv12 = jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(A), True), eyeP[:, :K]
            )  # (23, K) = A^-1[:, :K]
        # dx_ = K_h + (K_x - I) dx_new without materialising the 23x23
        # K_x inside the loop (rebuilt once after the loop for Joseph)
        K_h = _mv(P_inv12, HTh)
        dx_ = K_h + _mv(P_inv12, _mv(HTH, dx_new[:K])) - dx_new

        x_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), boxplus(x, dx_), x
        )
        converged = jnp.all(jnp.abs(dx_) < limit) | jnp.logical_not(valid)
        t_new = jnp.where(converged, t + 1, t)
        conv_next = converged | ((t_new == 0) & (i == max_iter - 1))
        done = (t_new > 1) | (i >= max_iter)
        if m.early_ok is not None:
            # the model certifies the confirmation pass would recompute
            # an identical system — exit on the first converged pass
            done = done | (converged & m.early_ok)

        out = {
            "x": x_new,
            "t": t_new,
            "conv": conv_next,
            "aux": m.aux,
            "i": i + 1,
            "done": done,
            "P_inv12": P_inv12,
            "HTH": HTH,
            "dx_": dx_,
            "n_eff": n_valid.astype(dtype),
        }
        if m.gram is not None:
            # the fused path never forms P in the loop; carry the tiny
            # transport blocks of the LAST iteration so the Joseph final
            # update can rebuild P_last = T P_prop T^T once
            out["A3"], out["A6"], out["S2b"] = A3, A6, S2b
        else:
            out["P"] = P
        return out

    c0 = {
        "x": x_prop,
        "t": jnp.array(0, jnp.int32),
        "conv": jnp.array(True),
        "aux": aux0,
        "i": jnp.array(0, jnp.int32),
        "done": jnp.array(False),
        "P_inv12": jnp.zeros((ERR_DIM, n_cols), dtype),
        "HTH": jnp.zeros((n_cols, n_cols), dtype),
        "dx_": jnp.zeros(ERR_DIM, dtype),
        "n_eff": jnp.zeros((), dtype),
    }
    if fused:
        c0["A3"] = jnp.eye(3, dtype=dtype)
        c0["A6"] = jnp.eye(3, dtype=dtype)
        c0["S2b"] = jnp.eye(2, dtype=dtype)
    else:
        c0["P"] = P_prop
    c = jax.lax.while_loop(cond, body, c0)

    # Final covariance update.  The reference computes P <- L - K_x P
    # (esekfom.hpp:1841-1931) in f64; in f32 that form catastrophically
    # cancels (prior/posterior variance ratios reach ~1e6) and P drifts
    # indefinite within a few scans.  We use the algebraically equivalent
    # Joseph form, PSD by construction:
    #   P <- (I - K H) P (I - K H)^T + K R K^T,
    # with K R K^T = R * P_inv12 HTH P_inv12^T (R scalar), then the
    # manifold transport T built from the final increment dx_.
    x_fin = c["x"]
    if fused:
        # rebuild P_last = T P_prop T^T once from the carried blocks
        def rows_T(M, A3, A6, S2b):
            return (M.at[3:6].set(_mm(A3, M[3:6]))
                     .at[6:9].set(_mm(A6, M[6:9]))
                     .at[21:23].set(_mm(S2b, M[21:23])))

        Pl = rows_T(P_prop, c["A3"], c["A6"], c["S2b"])
        P_last = rows_T(Pl.T, c["A3"], c["A6"], c["S2b"]).T
        P_last = 0.5 * (P_last + P_last.T)
    else:
        P_last = c["P"]
    K_x_last = jnp.zeros((ERR_DIM, ERR_DIM), dtype).at[:, :n_cols].set(
        _mm(c["P_inv12"], c["HTH"])
    )
    T_fin, _ = _dx_transport(c["dx_"], x_fin, x_prop)
    IKH = jnp.eye(ERR_DIM, dtype=dtype) - K_x_last
    KRK = R * _mm(_mm(c["P_inv12"], c["HTH"]), c["P_inv12"].T)
    P_joseph = _mm(_mm(IKH, P_last), IKH.T) + KRK
    P_post = _mm(_mm(T_fin, P_joseph), T_fin.T)
    P_post = 0.5 * (P_post + P_post.T)

    info = {"iters": c["i"], "t": c["t"], "n_eff": c["n_eff"]}
    return x_fin, P_post, c["aux"], info
