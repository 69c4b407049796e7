"""SPMD-program overhead on ONE real chip (MULTICHIP.md's measured
input; VERDICT r3 next-step #3).

Measures the PRODUCTION-parity multi-chip window step
(parallel.sharded.make_spmd_window_step_fn — map replicated, per-point
work query-sharded, Gram psum'd, same dense index / fused solve /
window batching / insert budgets as production) on a 1-device mesh,
chained on-device, against the single-chip production window step on
the SAME state and inputs.  The delta is the cost of the shard_map
program structure + identity collectives — the serial-overhead term of
the scaling model.  Also reports the legacy ownership-sharded tick
(--legacy) for the historical comparison.

Run: python tools/bench_sharded_overhead.py   (watchdog-wrapped)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _watchdog import child_ready, run_watchdog  # noqa: E402


def bench_cfg():
    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig,
                                            MappingConfig, ShapesConfig)

    # exactly bench.py's room workload config
    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16, map_capacity_log2=20,
        map_bucket=4, map_max_probe=6, knn_chunk=1 << 14,
        map_dense_log2=(8, 8, 7), knn_max_live=12,
        insert_claim_budget=2048, insert_dense_budget=2048,
        insert_mom_budget=4096)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0,
                                surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=4, filter_size_map_min=0.5,
                                single_association=True, plane_cache=True,
                                plane_cache_warmup=16, mom_dense=True,
                                early_converge=True)
    return cfg


def main():
    child_ready()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from better_fastlio2_tpu.io.synthetic import make_bench_sequence
    from better_fastlio2_tpu.parallel import sharded
    from better_fastlio2_tpu.pipeline.lio import (LIOPipeline, WindowInputs,
                                                  make_window_step_fn)

    W = 8
    cfg = bench_cfg()
    groups = make_bench_sequence("room", 64)
    print("# sequence ready", flush=True)

    # warm the filter + map to the steady dense-moment program through
    # the production pipeline, then measure both programs from ITS state
    pipe = LIOPipeline(cfg, window=W, unroll=W)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    pipe.flush()
    assert pipe.ls.map.dmom is not None
    print("# warmup done", flush=True)

    dtype = pipe.dtype
    an = jnp.asarray(pipe.acc_norm, dtype)
    last = groups[-W:]
    cols = [pipe._pad_points(g["pts"], g["pt_t"]) for g in last]
    imus = [pipe._pad_imu(g["imu_acc"], g["imu_gyr"], g["imu_t"])
            for g in last]
    win = WindowInputs(
        pts=jnp.asarray(np.stack([c[0] for c in cols])),
        pt_t=jnp.asarray(np.stack([c[1] for c in cols])),
        pt_valid=jnp.asarray(np.stack([c[2] for c in cols])),
        imu_acc=jnp.asarray(np.stack([i[0] for i in imus])),
        imu_gyr=jnp.asarray(np.stack([i[1] for i in imus])),
        imu_t=jnp.asarray(np.stack([i[2] for i in imus])),
        imu_mask=jnp.asarray(np.stack([i[3] for i in imus])),
        last_end_rel=jnp.zeros(W, dtype),
        scan_end_t=jnp.asarray([float(g["scan_end_t"]) for g in last],
                               dtype),
        scan_valid=jnp.ones(W, bool),
    )

    def copy_ls(ls):
        return jax.tree_util.tree_map(lambda a: jnp.array(a), ls)

    def chained_ms(wstep, ls, chain=4, n_groups=8):
        ls, infos = wstep(ls, win, an)  # compile + first run
        np.asarray(infos[0])
        group_ms = []
        for _ in range(n_groups):
            t0 = time.perf_counter()
            for _i in range(chain):
                ls, infos = wstep(ls, win, an)
            np.asarray(infos[0])
            group_ms.append(
                1e3 * (time.perf_counter() - t0) / (chain * W))
        return float(np.min(group_ms))

    # production single-chip window program (unquantized variant: both
    # programs read identical on-device inputs; wire format is not what
    # this tool measures)
    prod = make_window_step_fn(cfg, W, unroll=W)
    ms_prod = chained_ms(prod, copy_ls(pipe.ls))
    print(f"# production W={W}: {ms_prod:.2f} ms/scan", flush=True)

    # SPMD window program on a 1-device mesh
    mesh = sharded.make_mesh(jax.devices()[:1])
    spmd = sharded.make_spmd_window_step_fn(cfg, mesh, W, pipe.ls,
                                            unroll=W)
    ms_spmd = chained_ms(spmd, copy_ls(pipe.ls))
    print(f"# spmd 1-dev W={W}: {ms_spmd:.2f} ms/scan", flush=True)

    # simulated per-device load of a D-device mesh, measured on the one
    # real chip (override_ndev hook): T_serial + T_parallel/D directly,
    # modulo (a) the full-width undistort (overcounts by ud*(1-1/D)),
    # (b) the missing (1-1/D) of the insert scatter, (c) collectives —
    # all small and accounted in MULTICHIP.md
    sims = {}
    for D in (2, 4, 8):
        s = sharded.make_spmd_window_step_fn(cfg, mesh, W, pipe.ls,
                                             unroll=W, override_ndev=D)
        sims[D] = chained_ms(s, copy_ls(pipe.ls))
        print(f"# spmd sim D={D} per-device W={W}: {sims[D]:.2f} ms/scan",
              flush=True)

    print(json.dumps({
        "metric": "spmd_1dev_overhead",
        "production_ms_per_scan": round(ms_prod, 2),
        "spmd_1dev_ms_per_scan": round(ms_spmd, 2),
        "overhead_ratio": round(ms_spmd / ms_prod, 3),
        "sim_per_device_ms": {str(d): round(v, 2)
                              for d, v in sims.items()},
        "window": W,
        "note": ("production-parity SPMD window step (replicated map, "
                 "query-sharded points, psum'd Gram) on a 1-device mesh "
                 "vs the single-chip production window step, both "
                 "chained on-device, min-of-groups; sim_per_device_ms "
                 "= measured per-device step of a D-device mesh via "
                 "override_ndev"),
    }), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
