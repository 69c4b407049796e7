"""One-off probe: does the dense-moment association actually scale with
the query count?  Times neighborhood_moment_sums + finalize_plane + SoA
pack + one fused kernel pass, chained in one jit, at N = 16384 / 8192 /
4096 queries against the same bench-scale dmom table.  Also times the
pieces separately.  MULTICHIP serial/parallel split input."""

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

    from better_fastlio2_tpu.core import measurement as meas
    from better_fastlio2_tpu.map import voxel_hash as vh
    from better_fastlio2_tpu.ops import pallas_kernels as pk

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    # bench-scale map: (8,8,7) dense torus at 0.5 m voxels, populated
    m = vh.make_map(capacity_log2=20, bucket=4, voxel_size=0.5,
                    dtype=dtype, dense_log2=(8, 8, 7), moments=True)
    pts = rng.uniform(-55, 55, size=(200_000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-10, 14, size=len(pts)).astype(np.float32)
    for i in range(0, len(pts), 16384):
        blk = np.zeros((16384, 3), np.float32)
        v = np.zeros(16384, bool)
        n = len(pts[i:i + 16384])
        blk[:n] = pts[i:i + 16384]
        v[:n] = True
        m = vh.insert(m, jnp.asarray(blk), jnp.asarray(v))
    dmom = vh.build_dense_moments(m, center=np.zeros(3))
    md = m._replace(dmom=dmom)
    print("# map ready", flush=True)

    REP = 64

    def chained(fn, *args):
        # the carry PERTURBS the query input every iteration (sub-mm,
        # keeps voxel assignment) so XLA cannot hoist the loop-invariant
        # body out of the scan — without this the whole probe would
        # measure one call + an empty loop
        @jax.jit
        def run(mm, q, *rest):
            def body(c, _):
                out = fn(mm, q + 1e-6 * c, *rest)
                drain = sum(jnp.sum(jnp.asarray(o, dtype))
                            for o in jax.tree_util.tree_leaves(out)
                            if o.dtype != jnp.int32)
                return c + 1e-12 * drain, None

            c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None,
                                length=REP)
            return c

        run(*args).block_until_ready()
        best = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            run(*args).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / REP * 1e3)
        return best

    for N in (16384, 8192, 4096):
        q = jnp.asarray(pts[:N] * 0.95)
        val = jnp.ones(N, bool)

        ms_sums = chained(
            lambda mm, q, v: meas.neighborhood_moment_sums(mm, q),
            md, q, val)

        def full_assoc(mm, q, v):
            n, d, ok = meas.plane_from_moments(mm, q, v)
            invb = jnp.ones(q.shape[0], dtype)
            ijk = vh._voxel_of(q, mm.voxel_size)
            soa = pk.pack_soa(q, n, d, invb, ok, ijk, v)
            params = jnp.concatenate(
                [jnp.eye(3, dtype=dtype).reshape(-1), jnp.zeros(3, dtype),
                 jnp.asarray([0.5], dtype), jnp.zeros(3, dtype)])
            return pk.fused_normal_eqs(soa, params)

        ms_full = chained(full_assoc, md, q, val)
        print(f"N={N:6d}: moment sums {ms_sums:.3f} ms | "
              f"sums+finalize+pack+1 kernel pass {ms_full:.3f} ms",
              flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
