"""Chained probe: per-scan cost of the iterated-update GLUE — the
tiny-matrix algebra around the fused Pallas solve (Woodbury gain,
transport blocks, boxplus/minus, Joseph final).  Times update_iterated
with a measure_fn whose Gram is a precomputed constant (solve cost ~0),
at max_iter=4, so the measured time is glue + loop machinery.  Also
times a single fused_normal_eqs pass for reference."""

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

    from better_fastlio2_tpu.core import esikf
    from better_fastlio2_tpu.core.esikf import MeasurementOut
    from better_fastlio2_tpu.core.state import identity_state, init_P

    dtype = jnp.float32
    x0 = identity_state(dtype)
    P0 = init_P(dtype)
    rng = np.random.default_rng(0)
    # realistic well-conditioned Gram
    Hs = rng.normal(size=(2048, 6)).astype(np.float32)
    hs = (0.01 * rng.normal(size=2048)).astype(np.float32)
    G = np.zeros((8, 8), np.float32)
    G[:6, :6] = Hs.T @ Hs
    G[:6, 6] = Hs.T @ hs
    G[7, 7] = 2048.0
    Gj = jnp.asarray(G)

    def measure(s, conv, aux):
        # gram = const + 1e-9*aux so the loop carry stays live
        return MeasurementOut(
            h_x=jnp.zeros((0, 6), dtype), h=jnp.zeros(0, dtype),
            mask=jnp.zeros(0, bool),
            aux=aux + 1.0, gram=Gj * (1.0 + 1e-12 * aux),
        )

    REP = 256

    def bench(label, max_iter):
        @jax.jit
        def run(x, P):
            def body(c, _):
                x, P, k = c
                x2, P2, aux, info = esikf.update_iterated(
                    x, P, measure, k, max_iter=max_iter, n_cols=6, limit=0.0)
                # reset toward x0 so the state stays bounded
                x3 = jax.tree_util.tree_map(
                    lambda a, b: 0.99 * a + 0.01 * b, x2, x)
                return (x3, 0.5 * (P2 + P2.T), aux), info["iters"]

            (x, P, _), it = jax.lax.scan(
                body, (x, P, jnp.zeros((), dtype)), None, length=REP)
            return x.pos[0] + P[0, 0], jnp.sum(it)

        r = run(x0, P0)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0, P0))
            best = min(best, (time.perf_counter() - t0) / REP * 1e3)
        iters = float(r[1]) / REP
        print(f"{label}: {best:.3f} ms/scan at {iters:.2f} passes/scan",
              flush=True)
        return best

    a1 = bench("glue max_iter=1", 1)
    a4 = bench("glue max_iter=4", 4)
    print(f"per-extra-pass glue: {(a4 - a1) / 3:.3f} ms", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
