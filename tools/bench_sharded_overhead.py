"""Sharded-program overhead on ONE real chip: the multi-chip scan tick
(parallel.sharded.make_sharded_step_fn) on a 1-device mesh vs the
single-chip production step, chained on-device — isolates what the
shard_map program structure itself costs before any communication
(MULTICHIP.md's measured input; VERDICT r2 next-step #4).

Run: python tools/bench_sharded_overhead.py   (watchdog-wrapped)
"""

from __future__ import annotations

import json
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

    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig,
                                            MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.core import imu as imu_mod
    from better_fastlio2_tpu.core.state import identity_state, init_P
    from better_fastlio2_tpu.io.synthetic import make_bench_sequence
    from better_fastlio2_tpu.parallel import sharded
    from better_fastlio2_tpu.map import voxel_hash

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16, map_capacity_log2=20,
        map_bucket=4, map_max_probe=6, knn_chunk=1 << 14,
        map_dense_log2=None)  # the sharded map carries no dense index
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0,
                                surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=4, filter_size_map_min=0.5,
                                plane_cache=True)

    groups = make_bench_sequence("room", 24)
    print("# sequence ready", flush=True)

    mesh = sharded.make_mesh(jax.devices()[:1])
    sstep = sharded.make_sharded_step_fn(cfg, mesh)
    msh = sharded.make_sharded_map(mesh, capacity_log2_per_dev=20, bucket=4,
                                   voxel_size=0.5, moments=True)
    dtype = jnp.float32
    x, P = identity_state(dtype), init_P(dtype)
    sh = cfg.shapes

    def pack(g):
        pts = np.zeros((sh.n_raw, 3), np.float32)
        tt = np.zeros(sh.n_raw, np.float32)
        vv = np.zeros(sh.n_raw, bool)
        n = min(len(g["pts"]), sh.n_raw)
        pts[:n], tt[:n], vv[:n] = g["pts"][:n], g["pt_t"][:n], True
        m = sh.n_imu
        A = np.zeros((m, 3), np.float32)
        G = np.zeros((m, 3), np.float32)
        T = np.full(m, np.inf, np.float32)
        Mk = np.zeros(m, bool)
        k = min(len(g["imu_acc"]), m)
        A[:k], G[:k], T[:k], Mk[:k] = (g["imu_acc"][:k], g["imu_gyr"][:k],
                                       g["imu_t"][:k], True)
        return (jnp.asarray(pts), jnp.asarray(tt), jnp.asarray(vv),
                imu_mod.ImuBatch(jnp.asarray(A), jnp.asarray(G),
                                 jnp.asarray(T), jnp.asarray(Mk)),
                jnp.asarray(float(g["scan_end_t"]), dtype))

    lo = jnp.full(3, -200.0, dtype)
    hi = jnp.full(3, 200.0, dtype)
    z3 = jnp.zeros(3, dtype)
    an = jnp.asarray(9.809, dtype)
    tail = jnp.zeros((2, 3), dtype)

    packed = [pack(g) for g in groups]
    # warmup/build with 5-NN, then steady plane-cache scans
    for i, (pts, tt, vv, batch, se) in enumerate(packed[:12]):
        x, P, msh, tail = sstep(x, P, msh, pts, tt, vv, batch,
                                jnp.asarray(0.0, dtype), se, an, lo, hi,
                                tail[0], tail[1], jnp.asarray(True))
    jax.block_until_ready(tail)
    print("# warmup done", flush=True)

    def timed(use_knn, reps=3):
        nonlocal x, P, msh, tail
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for (pts, tt, vv, batch, se) in packed[12:20]:
                x, P, msh, tail = sstep(x, P, msh, pts, tt, vv, batch,
                                        jnp.asarray(0.0, dtype), se, an,
                                        lo, hi, tail[0], tail[1],
                                        jnp.asarray(use_knn))
            jax.block_until_ready(tail)
            best = min(best, 1e3 * (time.perf_counter() - t0) / 8)
        return best

    timed(False, reps=1)  # compile the plane-cache branch
    ms_pc = timed(False)
    ms_knn = timed(True)
    print(json.dumps({
        "metric": "sharded_1dev_ms_per_scan",
        "plane_cache_ms": round(ms_pc, 2),
        "knn_ms": round(ms_knn, 2),
        "note": ("sharded shard_map program on a 1-device mesh; compare "
                 "BENCH device_ms_per_scan for the single-chip production "
                 "step (which additionally has window batching, fused "
                 "solve, dense index and insert budgets)"),
    }), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
