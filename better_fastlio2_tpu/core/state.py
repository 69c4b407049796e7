"""ESIKF state manifold: the 23-DoF error-state / 24-dim flat state.

TPU-native re-design of the reference's compile-time manifold composition
(reference: include/use-ikfom.hpp:21-30, MTK_BUILD_MANIFOLD).  The state is

    pos(3) . rot(SO3) . offset_R_L_I(SO3) . offset_T_L_I(3)
    . vel(3) . bg(3) . ba(3) . grav(S2)

Error-state (tangent) layout, 23 dims — identical index layout to the
reference so Jacobian blocks line up with use-ikfom.hpp:70-97:

    [0:3]   pos        [3:6]   rot          [6:9]   offset_R_L_I
    [9:12]  offset_T   [12:15] vel          [15:18] bg
    [18:21] ba         [21:23] grav (2-dof S2 chart)

The flat (oplus) layout is 24-dim with grav occupying [21:24].

The state is a pytree of arrays (quaternions [w,x,y,z]) so it jits, vmaps,
shards, and crosses `lax.scan` boundaries freely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import s2 as s2m
from ..utils import so3

__all__ = ["State", "identity_state", "boxplus", "boxminus", "oplus_flat", "init_P"]

# Error-state block offsets (match use-ikfom.hpp layout).
POS, ROT, EXT_R, EXT_T, VEL, BG, BA, GRAV = 0, 3, 6, 9, 12, 15, 18, 21
ERR_DIM = 23
FLAT_DIM = 24
NOISE_DIM = 12  # [ng(3), na(3), nbg(3), nba(3)]  (use-ikfom.hpp:37-42)


class State(NamedTuple):
    """ESIKF nominal state (all arrays share a dtype)."""

    pos: jax.Array  # (3,) world position of IMU
    rot: jax.Array  # (4,) world_R_imu quaternion [w,x,y,z]
    off_r: jax.Array  # (4,) imu_R_lidar extrinsic quaternion
    off_t: jax.Array  # (3,) imu_t_lidar extrinsic
    vel: jax.Array  # (3,) world velocity
    bg: jax.Array  # (3,) gyro bias
    ba: jax.Array  # (3,) accel bias
    grav: jax.Array  # (3,) gravity vector, |grav| = s2.GRAVITY (S2 manifold)

    @property
    def dtype(self):
        return self.pos.dtype


def identity_state(dtype=jnp.float32) -> State:
    return State(
        pos=jnp.zeros(3, dtype),
        rot=so3.quat_identity(dtype),
        off_r=so3.quat_identity(dtype),
        off_t=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=s2m.s2_init(dtype),
    )


def boxplus(x: State, dx: jax.Array) -> State:
    """x ⊞ dx for a 23-dim error vector (MTK boxplus per sub-manifold)."""
    return State(
        pos=x.pos + dx[POS : POS + 3],
        rot=so3.quat_normalize(
            so3.quat_multiply(x.rot, so3.quat_exp(dx[ROT : ROT + 3]))
        ),
        off_r=so3.quat_normalize(
            so3.quat_multiply(x.off_r, so3.quat_exp(dx[EXT_R : EXT_R + 3]))
        ),
        off_t=x.off_t + dx[EXT_T : EXT_T + 3],
        vel=x.vel + dx[VEL : VEL + 3],
        bg=x.bg + dx[BG : BG + 3],
        ba=x.ba + dx[BA : BA + 3],
        grav=s2m.s2_boxplus(x.grav, dx[GRAV : GRAV + 2]),
    )


def boxminus(x: State, y: State) -> jax.Array:
    """23-dim error vector x ⊟ y (per-sub-manifold boxminus)."""
    return jnp.concatenate(
        [
            x.pos - y.pos,
            so3.quat_log(so3.quat_multiply(so3.quat_conjugate(y.rot), x.rot)),
            so3.quat_log(so3.quat_multiply(so3.quat_conjugate(y.off_r), x.off_r)),
            x.off_t - y.off_t,
            x.vel - y.vel,
            x.bg - y.bg,
            x.ba - y.ba,
            s2m.s2_boxminus(x.grav, y.grav),
        ]
    )


def oplus_flat(x: State, f: jax.Array, dt) -> State:
    """x.oplus(f, dt): integrate the 24-dim flat derivative for time dt.

    Mirrors esekfom.hpp:280-289 (state x_.oplus(f_, dt)): vect blocks are
    Euler steps, SO3 blocks right-multiply Exp(dt*f_seg), the S2 block
    rotates by Exp(dt*f_seg) (f_seg is 0 for gravity in this model).
    """
    return State(
        pos=x.pos + dt * f[0:3],
        rot=so3.quat_normalize(
            so3.quat_multiply(x.rot, so3.quat_exp(f[3:6], scale=dt))
        ),
        off_r=so3.quat_normalize(
            so3.quat_multiply(x.off_r, so3.quat_exp(f[6:9], scale=dt))
        ),
        off_t=x.off_t + dt * f[9:12],
        vel=x.vel + dt * f[12:15],
        bg=x.bg + dt * f[15:18],
        ba=x.ba + dt * f[18:21],
        grav=so3.quat_rotate(so3.quat_exp(f[21:24], scale=dt), x.grav),
    )


def init_P(dtype=jnp.float32) -> jax.Array:
    """Initial covariance after IMU init (IMU_Processing.hpp:226-233).

    Identity with: extrinsic rot/trans 1e-5, gravity-chart 1e-4 ... the
    reference sets P(6..11)=1e-5 (extrinsics), P(15..17)=1e-4,
    P(18..20)=1e-3, P(21,22)=1e-5.
    """
    d = jnp.ones(ERR_DIM, dtype)
    d = d.at[6:12].set(0.00001)
    d = d.at[15:18].set(0.0001)
    d = d.at[18:21].set(0.001)
    d = d.at[21:23].set(0.00001)
    return jnp.diag(d)
