"""SE(3) pose utilities: [quat(w,x,y,z) | t] 7-vectors, batched.

Pose conventions match the reference's gtsam::Pose3 / Eigen usage
(reference: src/laserMapping.cpp getCurPose/trans2gtsamPose,
common_lib.h): a pose T = (R, t) maps body to world, composition is
T_a * T_b = (R_a R_b, R_a t_b + t_a).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

__all__ = [
    "identity",
    "make",
    "rot",
    "trans",
    "compose",
    "inverse",
    "between",
    "apply",
    "from_rot_trans",
    "exp",
    "log",
]


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.concatenate([so3.quat_identity(dtype), jnp.zeros(3, dtype)])


def make(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([q, t], axis=-1)


def rot(p: jax.Array) -> jax.Array:
    return p[..., :4]


def trans(p: jax.Array) -> jax.Array:
    return p[..., 4:]


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    q = so3.quat_multiply(rot(a), rot(b))
    t = so3.quat_rotate(rot(a), trans(b)) + trans(a)
    return make(so3.quat_normalize(q), t)


def inverse(a: jax.Array) -> jax.Array:
    qc = so3.quat_conjugate(rot(a))
    return make(qc, -so3.quat_rotate(qc, trans(a)))


def between(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^-1 * b (gtsam Pose3::between)."""
    return compose(inverse(a), b)


def apply(p: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform points (..., 3) by pose (broadcasts over leading dims)."""
    return so3.quat_rotate(rot(p), pts) + trans(p)


def from_rot_trans(R: jax.Array, t: jax.Array) -> jax.Array:
    return make(so3.matrix_to_quat(R), t)


def exp(xi: jax.Array) -> jax.Array:
    """Retract a 6-vector [rho(3 trans), theta(3 rot)] — the split
    SO3 x R^3 retraction (not the full SE3 exponential): R = Exp(theta),
    t = rho."""
    return make(so3.quat_exp(xi[..., 3:6]), xi[..., 0:3])


def log(p: jax.Array) -> jax.Array:
    """Inverse of exp: [t, Log(R)]."""
    return jnp.concatenate([trans(p), so3.quat_log(rot(p))], axis=-1)
