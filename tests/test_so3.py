"""Golden numerics tests for SO(3) primitives against the MTK formulas
(reference: include/IKFoM_toolkit/mtk/src/mtkmath.hpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.utils import so3


def rand_vecs(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale)


def test_exp_log_roundtrip(rng):
    v = rand_vecs(rng, 64, scale=0.8)
    q = so3.quat_exp(v)
    v2 = so3.quat_log(q)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-9)


def test_exp_log_roundtrip_small(rng):
    v = rand_vecs(rng, 16, scale=1e-8)
    q = so3.quat_exp(v)
    np.testing.assert_allclose(np.asarray(so3.quat_log(q)), np.asarray(v), atol=1e-12)


def test_quat_exp_matches_rodrigues(rng):
    v = rand_vecs(rng, 32, scale=2.0)
    R_quat = so3.quat_to_matrix(so3.quat_exp(v))
    R_rod = so3.so3_exp_matrix(v)
    np.testing.assert_allclose(np.asarray(R_quat), np.asarray(R_rod), atol=1e-9)


def test_quat_rotate_matches_matrix(rng):
    v = rand_vecs(rng, 32)
    q = so3.quat_exp(v)
    x = rand_vecs(rng, 32)
    r1 = so3.quat_rotate(q, x)
    r2 = jnp.einsum("nij,nj->ni", so3.quat_to_matrix(q), x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-9)
    r3 = so3.quat_inv_rotate(q, x)
    r4 = jnp.einsum("nji,nj->ni", so3.quat_to_matrix(q), x)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r4), atol=1e-9)


def test_matrix_to_quat_roundtrip(rng):
    v = rand_vecs(rng, 64, scale=2.5)
    q = so3.quat_exp(v)
    q_canon = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = so3.matrix_to_quat(so3.quat_to_matrix(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q_canon), atol=1e-8)


def test_quat_multiply_vs_matrix_product(rng):
    a, b = rand_vecs(rng, 16), rand_vecs(rng, 16)
    qa, qb = so3.quat_exp(a), so3.quat_exp(b)
    R1 = so3.quat_to_matrix(so3.quat_multiply(qa, qb))
    R2 = so3.quat_to_matrix(qa) @ so3.quat_to_matrix(qb)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-9)


def test_A_matrix_closed_form(rng):
    """A(v) against the literal MTK::A_matrix expression (mtkmath.hpp:236)."""
    v = np.asarray(rand_vecs(rng, 8, scale=1.5))
    got = np.asarray(so3.A_matrix(jnp.asarray(v)))
    for i in range(v.shape[0]):
        n = np.linalg.norm(v[i])
        K = np.array(
            [
                [0, -v[i, 2], v[i, 1]],
                [v[i, 2], 0, -v[i, 0]],
                [-v[i, 1], v[i, 0], 0],
            ]
        )
        want = (
            np.eye(3)
            + (1 - np.cos(n)) / n**2 * K
            + (1 - np.sin(n) / n) / n**2 * (K @ K)
        )
        np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_A_matrix_is_left_jacobian(rng):
    """Exp(v + d) ~= Exp(A(v) d) Exp(v) to first order (left Jacobian)."""
    v = rand_vecs(rng, 4, scale=1.0)
    d = rand_vecs(rng, 4, scale=1e-6)
    lhs = so3.so3_exp_matrix(v + d)
    Ad = jnp.einsum("nij,nj->ni", so3.A_matrix(v), d)
    rhs = so3.so3_exp_matrix(Ad) @ so3.so3_exp_matrix(v)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_hat(rng):
    v, x = rand_vecs(rng, 8), rand_vecs(rng, 8)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", so3.hat(v), x)),
        np.asarray(jnp.cross(v, x)),
        atol=1e-12,
    )
