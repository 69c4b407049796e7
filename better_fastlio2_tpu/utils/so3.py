"""SO(3) manifold primitives as pure JAX, batched and dtype-polymorphic.

TPU-native re-design of the MTK manifold algebra used by the reference
LiDAR-inertial engine (reference: include/IKFoM_toolkit/mtk/src/mtkmath.hpp,
include/IKFoM_toolkit/mtk/types/SOn.hpp).  Everything here is a pure function
on arrays so it vmaps/jits and fuses; quaternions use the [w, x, y, z] layout.

Numerical notes
---------------
* Small-angle branches use Taylor expansions selected with `jnp.where` (no
  data-dependent control flow), keeping everything XLA-traceable.
* The reference computes in f64; on TPU we are f32-first.  All functions
  follow the dtype of their inputs so tests can run them in f64 on CPU.
* The reference contains a C++ integer-division quirk: `scalar_type(1/2)`
  evaluates to 0, so several `Exp` calls inside the covariance propagation
  (esekfom.hpp:313,345 and S2.hpp:277) silently return identity.  We
  implement the mathematically intended forms; the difference is second
  order in (angular rate * dt) and improves, not degrades, accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "hat",
    "quat_multiply",
    "quat_conjugate",
    "quat_normalize",
    "quat_identity",
    "quat_rotate",
    "quat_inv_rotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "quat_exp",
    "quat_log",
    "so3_exp_matrix",
    "A_matrix",
]

# Threshold below which Taylor series replace trig closed forms.  Generous
# enough for f32: at theta^2 = 1e-6 the truncation error is ~1e-19.
_SMALL_SQ = 1e-6


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector; batched over leading dims.

    Matches MTK::hat (mtkmath.hpp:180-187).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q*p, both [w,x,y,z]."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _cos_sinc_sqrt(x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(cos(sqrt(x2)), sinc(sqrt(x2))) with a Taylor small-angle branch.

    Behavioral analog of MTK::cos_sinc_sqrt (mtkmath.hpp:134-160).
    """
    safe = jnp.maximum(x2, _SMALL_SQ)
    x = jnp.sqrt(safe)
    cos_big = jnp.cos(x)
    sinc_big = jnp.sin(x) / x
    # Taylor: cos = 1 - x2/2 + x2^2/24; sinc = 1 - x2/6 + x2^2/120
    cos_small = 1.0 - x2 / 2.0 + x2 * x2 / 24.0
    sinc_small = 1.0 - x2 / 6.0 + x2 * x2 / 120.0
    use_small = x2 < _SMALL_SQ
    return (
        jnp.where(use_small, cos_small, cos_big),
        jnp.where(use_small, sinc_small, sinc_big),
    )


def quat_exp(v: jax.Array, scale=1.0) -> jax.Array:
    """Quaternion exponential of rotation vector `scale * v` ([w,x,y,z]).

    Equals MTK::exp(result, v, scale/2) + w (mtkmath.hpp:249-256) composed
    the way SO3::exp uses it (SOn.hpp:284-288): the quaternion representing
    a rotation of angle |scale*v| about v.
    """
    half = 0.5 * scale
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    cos_half, sinc_half = _cos_sinc_sqrt(half * half * n2)
    return jnp.concatenate([cos_half, sinc_half * half * v], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Rotation vector of quaternion q (inverse of quat_exp, scale=1).

    Matches MTK::log with scale=2, plus_minus_periodicity=true
    (mtkmath.hpp:259-285) as used by SO3::log: result = 2*atan(|v|/w)/|v|*v.
    """
    w = q[..., :1]
    v = q[..., 1:]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _SMALL_SQ * _SMALL_SQ))
    # atan(n/w)/n, with Taylor for small n: 1/w - n^2/(3w^3)
    big = jnp.arctan2(jnp.sign(w) * n, jnp.sign(w) * w) / n
    small = 1.0 / w - n2 / (3.0 * w**3)
    s = jnp.where(n2 < _SMALL_SQ * _SMALL_SQ, small, big)
    return 2.0 * s * v


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (R(q) @ v) without forming R."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_inv_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the conjugate of q (R(q)^T @ v)."""
    return quat_rotate(quat_conjugate(q), v)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix of [w,x,y,z] quaternion; batched."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Quaternion [w,x,y,z] of a rotation matrix; branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Four candidate constructions; pick the numerically best per element.
    q0 = mk(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)
    # Scores: which diagonal dominates.
    s0 = tr
    s1 = m00 - m11 - m22
    s2 = m11 - m00 - m22
    s3 = m22 - m00 - m11
    scores = jnp.stack([s0, s1, s2, s3], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_exp_matrix(v: jax.Array) -> jax.Array:
    """Rodrigues' formula: Exp(v) as a rotation matrix; batched.

    Behavioral analog of math_tools.h Exp() used for point undistortion.
    """
    n2 = jnp.sum(v * v, axis=-1)[..., None, None]
    K = hat(v)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    cos, sinc = _cos_sinc_sqrt(n2)
    # (1-cos)/n2 with Taylor 1/2 - n2/24
    one_minus_cos_over = jnp.where(
        n2 < _SMALL_SQ, 0.5 - n2 / 24.0, (1.0 - cos) / jnp.maximum(n2, _SMALL_SQ)
    )
    return eye + sinc * K + one_minus_cos_over * KK


def A_matrix(v: jax.Array) -> jax.Array:
    """MTK::A_matrix (mtkmath.hpp:236-247): the (transposed) right Jacobian.

    A(v) = I + (1-cos|v|)/|v|^2 hat(v) + (1 - sin|v|/|v|)/|v|^2 hat(v)^2.
    Satisfies d/dd [ Log(Exp(v)^-1 Exp(v+d)) ] = A(v)^T at d=0.
    """
    n2 = jnp.sum(v * v, axis=-1)[..., None, None]
    K = hat(v)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    cos, sinc = _cos_sinc_sqrt(n2)
    c1 = jnp.where(
        n2 < _SMALL_SQ, 0.5 - n2 / 24.0, (1.0 - cos) / jnp.maximum(n2, _SMALL_SQ)
    )
    c2 = jnp.where(
        n2 < _SMALL_SQ,
        1.0 / 6.0 - n2 / 120.0,
        (1.0 - sinc) / jnp.maximum(n2, _SMALL_SQ),
    )
    return eye + c1 * K + c2 * KK
