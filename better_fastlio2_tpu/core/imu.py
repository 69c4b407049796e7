"""IMU processing: static init, forward propagation, point undistortion.

TPU-native re-design of ImuProcess (reference: src/IMU_Processing.hpp).
The per-IMU-sample predict chain is a `lax.scan` over a statically padded
sample buffer; the backward point-wise undistortion
(IMU_Processing.hpp:334-386) becomes a batched gather over the recorded
propagation poses — no per-point loop.

Conventions: all times are float seconds relative to the scan begin time
(the reference keeps absolute ROS stamps and ms offsets in `curvature`;
the host-side loaders normalise).  Buffers are padded with mask=False
rows; masked samples propagate with dt=0, i.e. exact no-ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import s2 as s2m
from ..utils import so3
from .esikf import predict, predict_jacobians, predict_mean
from .state import ERR_DIM, State, init_P

__all__ = ["ImuBatch", "ImuPoses", "imu_init", "propagate", "undistort", "build_Q"]


class ImuBatch(NamedTuple):
    """One scan's worth of IMU samples (padded to static M).

    Sample 0 must be the last sample of the previous scan (the reference
    prepends last_imu_, IMU_Processing.hpp:243-245).
    """

    acc: jax.Array  # (M, 3) raw accelerometer
    gyr: jax.Array  # (M, 3) raw gyroscope
    t: jax.Array  # (M,) sample time, seconds rel. scan begin
    mask: jax.Array  # (M,) valid rows (monotone: True... False)


class ImuPoses(NamedTuple):
    """Recorded propagation states at IMU-rate, the Pose6D analog
    (common_lib.h set_pose6d / msg/Pose6D.msg)."""

    t: jax.Array  # (M,) offset time of each pose
    pos: jax.Array  # (M, 3)
    vel: jax.Array  # (M, 3)
    rot: jax.Array  # (M, 4) quaternion [w,x,y,z]
    acc_w: jax.Array  # (M, 3) world-frame acceleration over the interval ending here
    gyr_b: jax.Array  # (M, 3) bias-corrected body angular rate over that interval


def build_Q(gyr_cov, acc_cov, b_gyr_cov, b_acc_cov, dtype=jnp.float32) -> jax.Array:
    """Process noise Q from config covariances (IMU_Processing.hpp:305-308)."""
    d = jnp.concatenate(
        [
            jnp.full(3, gyr_cov, dtype),
            jnp.full(3, acc_cov, dtype),
            jnp.full(3, b_gyr_cov, dtype),
            jnp.full(3, b_acc_cov, dtype),
        ]
    )
    return jnp.diag(d)


def imu_init(
    acc: jax.Array,
    gyr: jax.Array,
    mask: jax.Array,
    off_r: jax.Array,
    off_t: jax.Array,
    dtype=jnp.float32,
) -> tuple[State, jax.Array, jax.Array]:
    """Static initialisation from a buffer of stationary IMU samples
    (IMU_init, IMU_Processing.hpp:174-233).

    Gravity = -mean_acc/|mean_acc| * G on the S2 manifold; gyro bias =
    mean_gyr; extrinsics injected from config; P = the reference's
    hand-set diagonal.  Returns (state, P, mean_acc_norm) — the norm is
    the accelerometer scale factor used during propagation
    (IMU_Processing.hpp:287).
    """
    w = mask.astype(dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean_acc = jnp.sum(acc * w, axis=0) / n
    mean_gyr = jnp.sum(gyr * w, axis=0) / n
    acc_norm = jnp.linalg.norm(mean_acc)
    grav = -mean_acc / jnp.maximum(acc_norm, 1e-6) * s2m.GRAVITY

    st = State(
        pos=jnp.zeros(3, dtype),
        rot=so3.quat_identity(dtype),
        off_r=off_r.astype(dtype),
        off_t=off_t.astype(dtype),
        vel=jnp.zeros(3, dtype),
        bg=mean_gyr.astype(dtype),
        ba=jnp.zeros(3, dtype),
        grav=grav.astype(dtype),
    )
    return st, init_P(dtype), acc_norm


def propagate(
    x: State,
    P: jax.Array,
    batch: ImuBatch,
    Q: jax.Array,
    acc_norm,
    last_scan_end_t,
    scan_end_t,
    last_acc_w: jax.Array,
    last_gyr_b: jax.Array,
) -> tuple[State, jax.Array, ImuPoses]:
    """Forward propagation over one scan's IMU samples (UndistortPcl's
    forward pass, IMU_Processing.hpp:239-333).

    Midpoint integration per consecutive pair; accelerometer scaled by
    G/|mean_acc|; the first interval starts at last_scan_end_t.  Pose 0
    records the incoming state with the previous scan's terminal
    acceleration (the reference seeds IMUpose with acc_s_last/angvel_last).
    Returns (state_at_scan_end, P, poses) — the final segment propagates
    from the last IMU sample to scan_end_t (clamped non-negative; the
    reference's `note*(pcl_end-imu_end)` always steps forward by the
    absolute gap, IMU_Processing.hpp:324-327, which we tighten).

    The mean chain is PARALLEL, not a lax.scan: within one scan the
    biases/extrinsics/gravity are constants of the integration, so the
    Euler chain reassociates exactly —
      R_i   = R_0 ∘ Exp(ω_0 dt_0) ∘ ... ∘ Exp(ω_{i-1} dt_{i-1})
              (associative prefix product of the per-interval increments)
      v_i   = v_0 + Σ_{j<i} (R_j a_j + g) dt_j        (prefix sum)
      p_i   = p_0 + Σ_{j<i} v_j dt_j                   (prefix sum)
    — the same floats as the serial chain up to reassociation rounding
    and one deferred quaternion normalize.  The serial form cost
    ~2.3 ms/scan on v5e (M-1 = 15 steps × ~30 tiny latency-bound ops);
    the parallel form is ~10 batched kernels of depth log2(M).
    """
    M = batch.t.shape[0]
    dtype = batch.acc.dtype
    g_scale = s2m.GRAVITY / jnp.maximum(acc_norm, 1e-6)

    ok = batch.mask[1:] & batch.mask[:-1]
    acc_all = 0.5 * (batch.acc[:-1] + batch.acc[1:]) * g_scale  # (M-1, 3)
    gyr_all = 0.5 * (batch.gyr[:-1] + batch.gyr[1:])
    t0 = jnp.maximum(batch.t[:-1], last_scan_end_t)
    # padding rows carry t = inf; keep the arithmetic NaN-free
    tt_safe = jnp.where(ok, batch.t[1:], 0.0)
    t0_safe = jnp.where(ok, t0, 0.0)
    dt_all = jnp.where(ok & (tt_safe > t0_safe), tt_safe - t0_safe, 0.0)

    # rotation prefix: dq_i = Exp(ω_i dt_i); masked rows have dt = 0 ->
    # identity, so the prefix holds the last valid rotation through the
    # padded tail (same for the vel/pos cumsums below)
    omega = gyr_all - x.bg
    dq = so3.quat_exp(omega, scale=dt_all[:, None])
    qpre = jax.lax.associative_scan(so3.quat_multiply, dq)
    rot_post = so3.quat_normalize(so3.quat_multiply(x.rot[None], qpre))
    rot_pre = jnp.concatenate([x.rot[None], rot_post[:-1]])

    a_body = acc_all - x.ba
    a_w_pre = so3.quat_rotate(rot_pre, a_body) + x.grav
    vel_post = x.vel + jnp.cumsum(a_w_pre * dt_all[:, None], axis=0)
    vel_pre = jnp.concatenate([x.vel[None], vel_post[:-1]])
    pos_post = x.pos + jnp.cumsum(vel_pre * dt_all[:, None], axis=0)
    pos_pre = jnp.concatenate([x.pos[None], pos_post[:-1]])

    # recorded per-pose rates (post-state rotation, the reference records
    # acc_s_last after the step); masked rows freeze to the PRECEDING
    # valid value via a forward-fill (cummax of valid indices), matching
    # the old serial scan even if a sensor dropout punches a hole
    # mid-stream — a single global last-valid index would leak a FUTURE
    # sample into the hole.  Rows before the first valid sample fall back
    # to the previous scan's terminal rates.
    gyr_b_all = gyr_all - x.bg
    acc_w_all = so3.quat_rotate(rot_post, a_body) + x.grav
    idx_m = jnp.arange(ok.shape[0], dtype=jnp.int32)
    ffill = jax.lax.associative_scan(
        jnp.maximum, jnp.where(ok, idx_m, -1)
    )
    has_prev = ffill >= 0
    src = jnp.maximum(ffill, 0)
    acc_w_rec = jnp.where(has_prev[:, None], acc_w_all[src], last_acc_w)
    gyr_b_rec = jnp.where(has_prev[:, None], gyr_b_all[src], last_gyr_b)

    poses = (batch.t[1:], pos_post, vel_post, rot_post, acc_w_rec,
             gyr_b_rec)
    x_end = x._replace(pos=pos_post[-1], rot=rot_post[-1], vel=vel_post[-1])

    def bcast(v):
        return jnp.broadcast_to(v[None], (M - 1,) + v.shape)

    x_pre = State(pos=pos_pre, rot=rot_pre, off_r=bcast(x.off_r),
                  off_t=bcast(x.off_t), vel=vel_pre, bg=bcast(x.bg),
                  ba=bcast(x.ba), grav=bcast(x.grav))
    x_post = State(pos=pos_post, rot=rot_post, off_r=bcast(x.off_r),
                   off_t=bcast(x.off_t), vel=vel_post, bg=bcast(x.bg),
                   ba=bcast(x.ba), grav=bcast(x.grav))

    # batched Jacobians of every step, then covariance composition:
    #   P_{i+1} = F_i P_i F_i^T + G_i,  G_i = F_w Q F_w^T
    # composes associatively as (F, G) with
    #   (F2, G2) ∘ (F1, G1) = (F2 F1, F2 G1 F2^T + G2)
    F_all, Fw_all = jax.vmap(predict_jacobians)(
        x_pre, x_post, acc_all, gyr_all, dt_all
    )
    G_all = jnp.einsum("nij,jk,nlk->nil", Fw_all, Q, Fw_all)

    def compose(a, b):  # a = earlier prefix, b = later element
        Fa, Ga = a
        Fb, Gb = b
        return Fb @ Fa, jnp.einsum("...ij,...jk,...lk->...il", Fb, Ga, Fb) + Gb

    # only the TOTAL composition is needed (an associative_scan would
    # compute every prefix — ~2x the batched matmuls for values nobody
    # reads): binary-tree reduce, identity-padded to a power of two
    Fr, Gr = F_all, G_all
    n_lvl = Fr.shape[0]
    pow2 = 1 << (n_lvl - 1).bit_length()
    if pow2 != n_lvl:
        eye_pad = jnp.broadcast_to(jnp.eye(ERR_DIM, dtype=dtype),
                                   (pow2 - n_lvl, ERR_DIM, ERR_DIM))
        Fr = jnp.concatenate([Fr, eye_pad])
        Gr = jnp.concatenate([Gr, jnp.zeros_like(eye_pad)])
    while Fr.shape[0] > 1:
        Fr, Gr = compose((Fr[0::2], Gr[0::2]), (Fr[1::2], Gr[1::2]))
    F_tot, G_tot = Fr[0], Gr[0]
    P_end = F_tot @ P @ F_tot.T + G_tot

    # prepend pose 0 = incoming state at scan start
    t_arr = jnp.concatenate([jnp.zeros(1, batch.t.dtype), poses[0]])
    pos_arr = jnp.concatenate([x.pos[None], poses[1]])
    vel_arr = jnp.concatenate([x.vel[None], poses[2]])
    rot_arr = jnp.concatenate([x.rot[None], poses[3]])
    acc_arr = jnp.concatenate([last_acc_w[None], poses[4]])
    gyr_arr = jnp.concatenate([last_gyr_b[None], poses[5]])

    # masked tail poses: clamp their timestamps to the last valid time so
    # searchsorted never lands on padding
    last_t = jnp.max(jnp.where(jnp.concatenate([jnp.ones(1, bool), ok]), t_arr, -jnp.inf))
    valid_pose = jnp.concatenate([jnp.ones(1, bool), ok])
    t_arr = jnp.where(valid_pose, t_arr, jnp.inf)

    # final hop: propagate to scan end using the last sample's rates
    last_idx = jnp.sum(batch.mask.astype(jnp.int32)) - 1
    acc_last = 0.5 * (batch.acc[jnp.maximum(last_idx - 1, 0)] + batch.acc[last_idx])
    gyr_last = 0.5 * (batch.gyr[jnp.maximum(last_idx - 1, 0)] + batch.gyr[last_idx])
    dt_tail = jnp.maximum(scan_end_t - last_t, 0.0)
    x_fin, P_fin = predict(x_end, P_end, acc_last * g_scale, gyr_last, dt_tail, Q)

    return x_fin, P_fin, ImuPoses(t_arr, pos_arr, vel_arr, rot_arr, acc_arr, gyr_arr)


def undistort(
    x_end: State,
    poses: ImuPoses,
    pts: jax.Array,
    pt_t: jax.Array,
) -> jax.Array:
    """Motion-compensate points to the scan-end lidar frame
    (IMU_Processing.hpp:334-386, formula at :374-376):

        p_e = R_il^T ( R_we^T ( R_i (R_il p + t_il) + T_ei ) - t_il )

    with R_i = R_head Exp(gyr * dt), T_ei = pos_head + vel_head dt
    + 0.5 acc_tail dt^2 - pos_end.  Batched: each point gathers its
    bracketing propagation pose via searchsorted.
    """
    idx = jnp.clip(
        jnp.searchsorted(poses.t, pt_t, side="right") - 1, 0, poses.t.shape[0] - 2
    )
    t_h = poses.t[idx]
    dt = jnp.maximum(pt_t - t_h, 0.0)[:, None]
    rot_h = poses.rot[idx]
    pos_h = poses.pos[idx]
    vel_h = poses.vel[idx]
    acc_t = poses.acc_w[idx + 1]
    gyr_t = poses.gyr_b[idx + 1]

    # R_i = R_head * Exp(gyr_tail * dt)
    q_i = so3.quat_multiply(rot_h, so3.quat_exp(gyr_t * dt))
    p_imu = so3.quat_rotate(x_end.off_r, pts) + x_end.off_t
    p_w_i = so3.quat_rotate(q_i, p_imu) + pos_h + vel_h * dt + 0.5 * acc_t * dt * dt
    p_imu_e = so3.quat_inv_rotate(x_end.rot, p_w_i - x_end.pos)
    return so3.quat_inv_rotate(x_end.off_r, p_imu_e - x_end.off_t)
