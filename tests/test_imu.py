"""IMU processing golden tests: static init, propagation consistency,
undistortion invariants (the scan-level property tests SURVEY.md §4
prescribes — the reference has no equivalent)."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.core import esikf, imu
from better_fastlio2_tpu.core.state import boxminus, identity_state, init_P
from better_fastlio2_tpu.utils import s2 as s2m
from better_fastlio2_tpu.utils import so3


def make_batch(ts, acc, gyr, M=32):
    A = np.zeros((M, 3))
    G = np.zeros((M, 3))
    T = np.full(M, np.inf)
    K = np.zeros(M, bool)
    k = len(ts)
    A[:k], G[:k], T[:k], K[:k] = acc, gyr, ts, True
    return imu.ImuBatch(
        acc=jnp.asarray(A), gyr=jnp.asarray(G), t=jnp.asarray(T),
        mask=jnp.asarray(K),
    )


def test_imu_init_gravity_and_bias(rng):
    acc = np.tile([0.05, -0.02, 9.79], (30, 1)) + rng.normal(
        scale=1e-4, size=(30, 3)
    )
    gyr = np.tile([0.001, -0.002, 0.0005], (30, 1))
    st, P, acc_norm = imu.imu_init(
        jnp.asarray(acc), jnp.asarray(gyr), jnp.ones(30, bool),
        so3.quat_identity(jnp.float64), jnp.zeros(3, jnp.float64),
        jnp.float64,
    )
    # gravity = -mean_acc/|mean_acc| * G (IMU_Processing.hpp:217)
    g = np.asarray(st.grav)
    np.testing.assert_allclose(np.linalg.norm(g), s2m.GRAVITY, atol=1e-6)
    np.testing.assert_allclose(
        g / np.linalg.norm(g), -np.mean(acc, 0) / np.linalg.norm(np.mean(acc, 0)),
        atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(st.bg), np.mean(gyr, 0), atol=1e-9)
    assert abs(float(acc_norm) - 9.79) < 0.01


def test_propagate_stationary_is_still(rng):
    """Perfect stationary IMU (acc = -gravity in body frame) must not
    move the state."""
    x0 = identity_state(jnp.float64)
    g = np.asarray(x0.grav)  # s2 default chart init
    acc_body = -g  # R = I
    ts = np.linspace(-0.01, 0.1, 12)
    batch = make_batch(ts, np.tile(acc_body, (12, 1)), np.zeros((12, 3)))
    Q = esikf.default_Q(jnp.float64)
    x1, P1, poses = imu.propagate(
        x0, init_P(jnp.float64), batch, Q, jnp.linalg.norm(jnp.asarray(acc_body)),
        jnp.float64(-0.0), jnp.float64(0.1), jnp.zeros(3, jnp.float64),
        jnp.zeros(3, jnp.float64),
    )
    np.testing.assert_allclose(np.asarray(x1.pos), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(x1.vel), 0.0, atol=1e-9)


def test_propagate_constant_velocity(rng):
    """With an initial velocity and stationary-gravity accelerometer the
    state integrates pos = v t."""
    x0 = identity_state(jnp.float64)._replace(
        vel=jnp.asarray([1.0, 0.5, 0.0])
    )
    g = np.asarray(x0.grav)
    ts = np.linspace(-0.01, 0.1, 12)
    batch = make_batch(ts, np.tile(-g, (12, 1)), np.zeros((12, 3)))
    Q = esikf.default_Q(jnp.float64)
    x1, _, _ = imu.propagate(
        x0, init_P(jnp.float64), batch, Q, jnp.float64(np.linalg.norm(g)),
        jnp.float64(-0.0), jnp.float64(0.1), jnp.zeros(3, jnp.float64),
        jnp.zeros(3, jnp.float64),
    )
    np.testing.assert_allclose(
        np.asarray(x1.pos), [0.1, 0.05, 0.0], atol=1e-6
    )


def test_undistort_identity_when_static():
    """No motion => undistortion is exactly the (identity) extrinsic
    transform: points unchanged."""
    x0 = identity_state(jnp.float64)
    g = np.asarray(x0.grav)
    ts = np.linspace(-0.01, 0.1, 12)
    batch = make_batch(ts, np.tile(-g, (12, 1)), np.zeros((12, 3)))
    Q = esikf.default_Q(jnp.float64)
    x1, _, poses = imu.propagate(
        x0, init_P(jnp.float64), batch, Q, jnp.float64(np.linalg.norm(g)),
        jnp.float64(-0.0), jnp.float64(0.1), jnp.zeros(3, jnp.float64),
        jnp.zeros(3, jnp.float64),
    )
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-10, 10, (200, 3)))
    t = jnp.asarray(rng.uniform(0, 0.1, 200))
    out = imu.undistort(x1, poses, pts, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-9)


def test_undistort_compensates_pure_rotation():
    """Constant yaw rate: a point captured at time t in the rotating
    lidar frame maps back to the same world point as the scan-end frame
    sees it."""
    x0 = identity_state(jnp.float64)
    g = np.asarray(x0.grav)
    w = 0.5  # rad/s yaw
    ts = np.linspace(-0.01, 0.1, 23)
    gyr = np.tile([0, 0, w], (23, 1))
    # rotating frame: accelerometer still measures -R^T g; R = Rz(w t),
    # and R^T g = g (gravity on z axis is invariant to yaw)
    batch = make_batch(ts, np.tile(-g, (23, 1)), gyr)
    Q = esikf.default_Q(jnp.float64)
    x1, _, poses = imu.propagate(
        x0, init_P(jnp.float64), batch, Q, jnp.float64(np.linalg.norm(g)),
        jnp.float64(-0.0), jnp.float64(0.1), jnp.zeros(3, jnp.float64),
        jnp.zeros(3, jnp.float64),
    )
    # world point seen from the rotating sensor at time t
    p_world = np.array([4.0, 1.0, 0.5])
    t_pts = np.linspace(0.0, 0.0999, 40)

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    body = np.stack([Rz(w * t).T @ p_world for t in t_pts])
    out = np.asarray(
        imu.undistort(x1, poses, jnp.asarray(body), jnp.asarray(t_pts))
    )
    # undistorted points = scan-end body frame of the SAME world point
    yaw_end = float(so3.quat_log(x1.rot)[2])
    want = (Rz(yaw_end).T @ p_world)[None, :].repeat(40, 0)
    np.testing.assert_allclose(out, want, atol=5e-3)
