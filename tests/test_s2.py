"""Golden numerics tests for the S^2 gravity manifold
(reference: include/IKFoM_toolkit/mtk/types/S2.hpp, x-axis chart)."""

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.utils import s2 as s2m

L = s2m.GRAVITY


def rand_grav(rng, n=8):
    """Random downward-ish gravity vectors of norm L (regular chart zone)."""
    v = rng.normal(size=(n, 3)) * np.array([0.2, 0.2, 0.2]) + np.array([0, 0, -1.0])
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * L
    return jnp.asarray(v)


def test_norm_preserved(rng):
    g = rand_grav(rng)
    d = jnp.asarray(rng.normal(size=(8, 2)) * 0.3)
    g2 = s2m.s2_boxplus(g, d)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(g2, axis=-1)), L, atol=1e-9
    )


def test_boxplus_boxminus_roundtrip(rng):
    g = rand_grav(rng)
    d = jnp.asarray(rng.normal(size=(8, 2)) * 0.2)
    g2 = s2m.s2_boxplus(g, d)
    d2 = s2m.s2_boxminus(g2, g)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-7)


def test_boxminus_identity(rng):
    g = rand_grav(rng)
    np.testing.assert_allclose(
        np.asarray(s2m.s2_boxminus(g, g)), 0.0, atol=1e-9
    )


def test_bx_columns_tangent(rng):
    """Bx columns span the tangent plane: g^T Bx = 0 and Bx^T Bx = I/ L-scale."""
    g = rand_grav(rng)
    bx = s2m.s2_bx(g)
    gtb = jnp.einsum("ni,nij->nj", g, bx)
    np.testing.assert_allclose(np.asarray(gtb), 0.0, atol=1e-8)


def test_nx_mx_identity(rng):
    """N(x,x) @ M(x, 0) = I_2 — required so that the ESIKF S2 covariance
    block passes through unchanged when dx = 0 (esekfom.hpp:1687-1703)."""
    g = rand_grav(rng)
    Nx = s2m.s2_nx_yy(g)
    Mx = s2m.s2_mx(g, jnp.zeros((8, 2), g.dtype))
    prod = Nx @ Mx
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(2), (8, 2, 2)), atol=1e-7
    )


def test_mx_is_boxplus_jacobian(rng):
    """M(x, d) = d(x ⊞ d)/dd — checked with jax.jacfwd."""
    g = rand_grav(rng, 4)
    d0 = jnp.asarray(rng.normal(size=(4, 2)) * 0.1)
    for i in range(4):
        J = jax.jacfwd(lambda dd: s2m.s2_boxplus(g[i], dd))(d0[i])
        Mx = s2m.s2_mx(g[i], d0[i])
        np.testing.assert_allclose(np.asarray(J), np.asarray(Mx), atol=1e-6)


def test_nx_is_boxminus_jacobian(rng):
    """N(x,x) = d(y ⊟ x)/dy |_{y=x} restricted to tangent motions."""
    g = rand_grav(rng, 4)
    for i in range(4):
        J = jax.jacfwd(lambda dd: s2m.s2_boxminus(s2m.s2_boxplus(g[i], dd), g[i]))(
            jnp.zeros(2, g.dtype)
        )
        # d(boxminus ∘ boxplus)/dd at 0 = Nx @ Mx(0) = I, indirectly checks Nx.
        np.testing.assert_allclose(np.asarray(J), np.eye(2), atol=1e-6)
