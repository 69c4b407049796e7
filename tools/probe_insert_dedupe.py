"""A/B probe: cost of the unconditional replace-dedupe (argsort over the
mom_budget compacted rows) inside insert_dense_moments, at bench shapes
(budget 4096, (8,8,7) torus).  Chained timing, dedupe on vs off
(monkeypatched no-op), on the real chip."""

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

    from better_fastlio2_tpu.map import voxel_hash as vh

    dtype = jnp.float32
    dshape = (256, 256, 128, 2)
    G = 256 * 256 * 128
    rng = np.random.default_rng(0)
    dmom = jnp.zeros((G, vh.DMOM_CH), dtype)
    # bench-like batch: 16k rows, ~12k valid, unique-ish voxels
    n = 1 << 14
    pts = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-10, 20, size=n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[: (3 * n) // 4] = True
    vs = jnp.asarray(0.5, dtype)
    REP = 64

    def bench(label):
        @jax.jit
        def run(dm, p):
            def body(c, _):
                dm, k = c
                dm, nn = vh.insert_dense_moments(
                    dm, dshape, vs, p + 1e-4 * k, jnp.asarray(valid),
                    mom_cap=24, mom_budget=4096)
                return (dm, k + 1.0), nn

            (dm, _), nn = jax.lax.scan(body, (dm, 0.0), None, length=REP)
            return dm[0, 0] + jnp.sum(nn)

        run(dmom, jnp.asarray(pts)).block_until_ready()
        best = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            run(dmom, jnp.asarray(pts)).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / REP * 1e3)
        print(f"{label}: {best:.3f} ms/insert", flush=True)
        return best

    a = bench("dedupe ON ")
    import better_fastlio2_tpu.map.voxel_hash as vhm

    vhm._DEDUPE_ENABLED = False
    b = bench("dedupe OFF")
    vhm._DEDUPE_ENABLED = True
    print(f"delta: {a - b:.3f} ms/insert", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
