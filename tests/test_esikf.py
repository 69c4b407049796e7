"""ESIKF predict/update golden tests.

The discrete transition Jacobian F_x is validated against automatic
differentiation of the boxminus/boxplus-composed propagation map — the
defining property of the error-state Jacobian (esekfom.hpp:280-402), and
the update gain against the textbook Kalman identity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.core import esikf
from better_fastlio2_tpu.core.state import (
    ERR_DIM,
    State,
    boxminus,
    boxplus,
    identity_state,
    init_P,
)
from better_fastlio2_tpu.utils import so3


def random_state(rng, dtype=jnp.float64) -> State:
    return State(
        pos=jnp.asarray(rng.normal(size=3), dtype),
        rot=so3.quat_exp(jnp.asarray(rng.normal(size=3) * 0.5, dtype)),
        off_r=so3.quat_exp(jnp.asarray(rng.normal(size=3) * 0.1, dtype)),
        off_t=jnp.asarray(rng.normal(size=3) * 0.1, dtype),
        vel=jnp.asarray(rng.normal(size=3), dtype),
        bg=jnp.asarray(rng.normal(size=3) * 0.01, dtype),
        ba=jnp.asarray(rng.normal(size=3) * 0.01, dtype),
        grav=jnp.asarray([0.3, -0.2, -9.79], dtype)
        / np.linalg.norm([0.3, -0.2, -9.79])
        * 9.809,
    )


def test_boxplus_boxminus_roundtrip(rng):
    x = random_state(rng)
    dx = jnp.asarray(rng.normal(size=ERR_DIM) * 0.1)
    dx2 = boxminus(boxplus(x, dx), x)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-7)


def test_get_f_kinematics(rng):
    x = random_state(rng)
    acc = jnp.asarray(rng.normal(size=3) + [0, 0, 9.8])
    gyro = jnp.asarray(rng.normal(size=3) * 0.2)
    f = esikf.get_f(x, acc, gyro)
    np.testing.assert_allclose(np.asarray(f[0:3]), np.asarray(x.vel))
    np.testing.assert_allclose(np.asarray(f[3:6]), np.asarray(gyro - x.bg))
    want_a = so3.quat_rotate(x.rot, acc - x.ba) + x.grav
    np.testing.assert_allclose(np.asarray(f[12:15]), np.asarray(want_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(f[15:24]), 0.0)
    np.testing.assert_allclose(np.asarray(f[6:12]), 0.0)


def test_predict_Fx_matches_autodiff(rng):
    """F_x == d[ predict(x ⊞ d) ⊟ predict(x) ]/dd at d=0."""
    x = random_state(rng)
    acc = jnp.asarray(rng.normal(size=3) + [0, 0, 9.8])
    gyro = jnp.asarray(rng.normal(size=3) * 0.3)
    dt = 0.005
    Q = esikf.default_Q(jnp.float64)
    P0 = init_P(jnp.float64)

    x_pred, _ = esikf.predict(x, P0, acc, gyro, dt, Q)

    def prop_map(d):
        xp = boxplus(x, d)
        xn, _ = esikf.predict(xp, P0, acc, gyro, dt, Q)
        return boxminus(xn, x_pred)

    J = jax.jacfwd(prop_map)(jnp.zeros(ERR_DIM, jnp.float64))

    # Reconstruct F_x the way predict builds it (F_x1 + fx_err*dt).
    # Instead of re-deriving, check P propagation consistency: propagate a
    # rank-1 P and compare against J P J^T.
    rnd = rng.normal(size=(ERR_DIM, ERR_DIM))
    P = jnp.asarray(rnd @ rnd.T * 1e-4 + np.eye(ERR_DIM) * 1e-6)
    _, P_new = esikf.predict(x, P, acc, gyro, dt, Q)

    # noise contribution
    fw = esikf.df_dw(x)
    # project noise rows like predict does (approximately: J_noise via autodiff)
    def noise_map(w):
        # inject noise into the flat derivative then propagate
        f_flat = esikf.get_f(x, acc, gyro) + fw @ w
        from better_fastlio2_tpu.core.state import oplus_flat

        xn = oplus_flat(x, f_flat, dt)
        return boxminus(xn, x_pred)

    Jw = jax.jacfwd(noise_map)(jnp.zeros(12, jnp.float64))
    P_want = J @ P @ J.T + Jw @ Q @ Jw.T
    np.testing.assert_allclose(np.asarray(P_new), np.asarray(P_want), atol=2e-6)


def test_predict_dt_zero_is_identity(rng):
    x = random_state(rng)
    P = init_P(jnp.float64)
    acc = jnp.asarray(rng.normal(size=3))
    gyro = jnp.asarray(rng.normal(size=3))
    x2, P2 = esikf.predict(x, P, acc, gyro, 0.0, esikf.default_Q(jnp.float64))
    np.testing.assert_allclose(np.asarray(boxminus(x2, x)), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), atol=1e-12)


def test_update_matches_kalman_identity(rng):
    """One ESIKF iteration from x == x_prop must equal the textbook KF:
    dx = (H^T R^-1 H + P^-1)^-1 H^T R^-1 z == P H^T (H P H^T + R)^-1 z."""
    x = identity_state(jnp.float64)
    P = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, ERR_DIM)))
    N = 64
    R = 0.001
    H12 = rng.normal(size=(N, 12))
    # small residuals keep second-order manifold-transport effects (the
    # A(dx)^T / Nx Mx projections, which are genuine ESIKF behavior, not
    # error) below the comparison tolerance
    z = rng.normal(size=N) * 1e-4

    def measure(xs, conv, aux):
        # truly linear measurement: residual shrinks as x moves toward z
        dx = boxminus(xs, x)
        h_now = jnp.asarray(z) - jnp.asarray(H12) @ dx[:12]
        return esikf.MeasurementOut(
            h_x=jnp.asarray(H12),
            h=h_now,
            mask=jnp.ones(N, bool),
            aux=aux,
        )

    x_post, P_post, _, info = esikf.update_iterated(
        x, P, measure, None, max_iter=1, R=R, limit=1e9
    )
    # For a linear model the iterated update's fixed point is the textbook
    # posterior regardless of iteration count; dx = K z.
    dx_got = np.asarray(boxminus(x_post, x))

    Hfull = np.zeros((N, ERR_DIM))
    Hfull[:, :12] = H12
    Pn = np.asarray(P)
    K = Pn @ Hfull.T @ np.linalg.inv(Hfull @ Pn @ Hfull.T + R * np.eye(N))
    dx_want = K @ z
    np.testing.assert_allclose(dx_got, dx_want, atol=1e-7)

    # Covariance: (I - K H) P, transported (transport ~ I for tiny dx).
    P_want = (np.eye(ERR_DIM) - K @ Hfull) @ Pn
    np.testing.assert_allclose(np.asarray(P_post), P_want, atol=1e-6)


def test_update_masked_rows_equal_compaction(rng):
    """Masked-out rows must not influence the solution (replaces the
    reference's dynamic compaction, laserMapping.cpp:1944-1954)."""
    x = identity_state(jnp.float64)
    P = init_P(jnp.float64)
    N = 32
    H12 = rng.normal(size=(N, 12))
    z = rng.normal(size=N) * 0.01
    mask = rng.uniform(size=N) > 0.4

    def measure_masked(xs, conv, aux):
        return esikf.MeasurementOut(
            h_x=jnp.asarray(H12), h=jnp.asarray(z), mask=jnp.asarray(mask), aux=aux
        )

    def measure_compact(xs, conv, aux):
        return esikf.MeasurementOut(
            h_x=jnp.asarray(H12[mask]),
            h=jnp.asarray(z[mask]),
            mask=jnp.ones(int(mask.sum()), bool),
            aux=aux,
        )

    xa, Pa, _, _ = esikf.update_iterated(x, P, measure_masked, None, max_iter=3)
    xb, Pb, _, _ = esikf.update_iterated(x, P, measure_compact, None, max_iter=3)
    np.testing.assert_allclose(
        np.asarray(boxminus(xa, xb)), 0.0, atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pb), atol=1e-10)
