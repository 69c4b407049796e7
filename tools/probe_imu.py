"""One-off probe: where does the IMU propagate stage's time go?

Chained on-device (lax.scan over repeated calls inside one jit), min of
groups.  Variants: full propagate; Jacobian+covariance tree only; mean
chain only; final predict hop only.  Input shapes = bench config
(n_imu=16).  MULTICHIP/serial-stage analysis input.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _watchdog import child_ready, run_watchdog  # noqa: E402


def main():
    child_ready()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from better_fastlio2_tpu.core import imu
    from better_fastlio2_tpu.core.state import identity_state, init_P

    dtype = jnp.float32
    M = 16
    x0 = identity_state(dtype)
    P0 = init_P(dtype)
    Q = imu.build_Q(0.1, 0.1, 1e-4, 1e-4, dtype)
    rng = np.random.default_rng(0)
    ts = np.full(M, np.inf, np.float32)
    k = 12
    ts[:k] = np.linspace(0.0, 0.1, k)
    acc = np.zeros((M, 3), np.float32)
    acc[:k] = rng.normal([0, 0, 9.81], 0.1, (k, 3))
    gyr = np.zeros((M, 3), np.float32)
    gyr[:k] = rng.normal(0, 0.05, (k, 3))
    mask = np.zeros(M, bool)
    mask[:k] = True
    batch = imu.ImuBatch(acc=jnp.asarray(acc), gyr=jnp.asarray(gyr),
                         t=jnp.asarray(ts), mask=jnp.asarray(mask))
    an = jnp.asarray(9.81, dtype)
    z3 = jnp.zeros(3, dtype)

    REP = 64

    def chained(fn):
        @jax.jit
        def run(x, P):
            def body(c, _):
                x, P = c
                xf, Pf, poses = fn(x, P)
                # keep the full output live so nothing dead-code-elides
                drain = (jnp.sum(poses.pos) + jnp.sum(poses.rot)
                         + jnp.sum(poses.acc_w))
                return (xf, Pf + 0.0 * drain), None

            c, _ = jax.lax.scan(body, (x, P), None, length=REP)
            return c

        run(x0, P0)[1].block_until_ready()  # compile
        best = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            r = run(x0, P0)
            r[1].block_until_ready()
            best = min(best, (time.perf_counter() - t0) / REP * 1e3)
        return best

    def full(x, P):
        return imu.propagate(x, P, batch, Q, an, jnp.asarray(0.0, dtype),
                             jnp.asarray(0.1, dtype), z3, z3)

    ms_full = chained(full)
    print(f"propagate full           : {ms_full:.3f} ms", flush=True)

    # no-covariance variant: monkeypatch predict_jacobians to identity
    orig_pj = imu.predict_jacobians
    ERR = P0.shape[0]

    def cheap_pj(xp, xq, a, g, dt):
        return (jnp.eye(ERR, dtype=dtype), jnp.zeros((ERR, 12), dtype))

    imu.predict_jacobians = cheap_pj
    ms_nojac = chained(full)
    imu.predict_jacobians = orig_pj
    print(f"propagate w/ identity Fs : {ms_nojac:.3f} ms "
          f"(jacobian-build cost ~ {ms_full - ms_nojac:.3f})", flush=True)

    # no final-hop variant
    orig_predict = imu.predict

    def cheap_predict(x, P, a, g, dt, Q_):
        return x, P

    imu.predict = cheap_predict
    ms_nohop = chained(full)
    imu.predict = orig_predict
    print(f"propagate w/o final hop  : {ms_nohop:.3f} ms "
          f"(final predict() hop ~ {ms_full - ms_nohop:.3f})", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
