"""S^2 manifold (gravity sphere) primitives as pure JAX.

Re-design of MTK::S2 (reference: include/IKFoM_toolkit/mtk/types/S2.hpp) for
the gravity state of the error-state iterated Kalman filter.  The manifold
element is a 3-vector of fixed norm `length` (the reference instantiates
S2<double, 98090, 10000, 1> => length = 9.809 m/s^2, use-ikfom.hpp:8); the
tangent space is 2-dimensional.

All functions are pure, batched over leading dims, and dtype-follow inputs.
S2_typ is fixed to 3 (z-axis chart) to match the reference instantiation...
note the reference's typedef says S2_typ=1 as the 4th template arg is `1`;
but MTK's template order is <scalar, den, num, S2_typ> and use-ikfom.hpp:8
passes S2_typ=1, i.e. the x-axis chart.  We therefore implement the x-axis
chart (S2.hpp:216-233) as the default `S2_TYP = 1`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .so3 import A_matrix, hat, quat_exp, quat_rotate, so3_exp_matrix

__all__ = [
    "GRAVITY",
    "s2_init",
    "s2_bx",
    "s2_boxplus",
    "s2_boxminus",
    "s2_nx_yy",
    "s2_mx",
]

# length = den/num = 98090/10000 (use-ikfom.hpp:8)
GRAVITY = 9.809

_TOL = 1e-7


def s2_init(dtype=jnp.float32, length: float = GRAVITY) -> jax.Array:
    """Default S2 element for the x-axis chart: length * (1, 0, 0).

    (S2.hpp:113-117 with S2_typ=1.)
    """
    return jnp.array([length, 0.0, 0.0], dtype=dtype)


def s2_bx(vec: jax.Array, length: float = GRAVITY) -> jax.Array:
    """Chart basis Bx(vec): 3x2 matrix spanning the tangent plane.

    x-axis chart (S2.hpp:216-233): valid whenever vec[0] + length > tol;
    the degenerate branch (vec ~ -length*e_x) uses a fixed frame.  Gravity
    in the reference is initialised to -mean_acc*G (pointing down, i.e.
    g_z ~ -9.8 with x,y small => vec[0] ~ 0), so the regular branch is the
    live one; we keep the degenerate fallback via `where`.
    """
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    denom = jnp.where(jnp.abs(x + length) < _TOL, 1.0, x + length)
    r0 = jnp.stack([-y, -z], axis=-1)
    r1 = jnp.stack([length - y * y / denom, -z * y / denom], axis=-1)
    r2 = jnp.stack([-z * y / denom, length - z * z / denom], axis=-1)
    regular = jnp.stack([r0, r1, r2], axis=-2) / length
    degen = jnp.zeros_like(regular)
    degen = degen.at[..., 1, 1].set(-1.0)
    degen = degen.at[..., 2, 0].set(1.0)
    use_degen = (x + length <= _TOL)[..., None, None]
    return jnp.where(use_degen, degen, regular)


def s2_boxplus(vec: jax.Array, delta: jax.Array, length: float = GRAVITY) -> jax.Array:
    """vec ⊞ delta: rotate vec by Exp(Bx @ delta) (S2.hpp:139-145)."""
    Bu = jnp.einsum("...ij,...j->...i", s2_bx(vec, length), delta)
    q = quat_exp(Bu)
    return quat_rotate(q, vec)


def s2_boxminus(vec: jax.Array, other: jax.Array, length: float = GRAVITY) -> jax.Array:
    """2-vector chart coordinates of `vec` around `other` (S2.hpp:147-170)."""
    v_sin = jnp.linalg.norm(jnp.cross(vec, other), axis=-1)
    v_cos = jnp.sum(vec * other, axis=-1)
    theta = jnp.arctan2(v_sin, v_cos)
    bx_o = s2_bx(other, length)
    # res = theta/v_sin * Bx(other)^T @ (hat(other) @ vec).  As vec -> other
    # the ratio theta/v_sin -> 1/v_cos; using that branch keeps the function
    # differentiable at the coincidence point (needed: the ESIKF autodiff
    # golden tests differentiate through boxminus at dx = 0).
    ho_v = jnp.cross(other, vec)
    coeff = jnp.where(
        v_sin < _TOL,
        1.0 / jnp.maximum(v_cos, _TOL),
        theta / jnp.maximum(v_sin, _TOL),
    )
    res = coeff[..., None] * jnp.einsum("...ij,...i->...j", bx_o, ho_v)
    # Antipodal fallback: reference returns (pi, 0) when v_sin ~ 0 but
    # theta large (S2.hpp:152-156).
    anti = (v_sin < _TOL) & (jnp.abs(theta) > _TOL)
    pi_vec = jnp.zeros_like(res).at[..., 0].set(jnp.pi)
    return jnp.where(anti[..., None], pi_vec, res)


def s2_nx_yy(vec: jax.Array, length: float = GRAVITY) -> jax.Array:
    """N(x,x): 2x3 tangent projection, (1/len^2) Bx^T hat(vec) (S2.hpp:252-257)."""
    bx = s2_bx(vec, length)
    return jnp.einsum("...ij,...ik->...jk", bx, hat(vec)) / (length * length)


def s2_mx(vec: jax.Array, delta: jax.Array, length: float = GRAVITY) -> jax.Array:
    """M(x, delta): 3x2 chart differential (S2.hpp:259-279).

    For |delta| ~ 0: -hat(vec) @ Bx.  Otherwise
    -Exp(Bu) @ hat(vec) @ A(Bu)^T @ Bx with Bu = Bx @ delta.  (The reference
    binary evaluates Exp(Bu) as identity due to the C++ `scalar(1/2)`
    integer-division quirk at S2.hpp:277; we use the intended rotation.)
    """
    bx = s2_bx(vec, length)
    Bu = jnp.einsum("...ij,...j->...i", bx, delta)
    small = jnp.sum(delta * delta, axis=-1) < _TOL * _TOL
    R = so3_exp_matrix(Bu)
    hv = hat(vec)
    At = jnp.swapaxes(A_matrix(Bu), -1, -2)
    full = -(R @ hv @ At @ bx)
    simple = -(hv @ bx)
    return jnp.where(small[..., None, None], simple, full)
