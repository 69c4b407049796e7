"""Scaling-model probe: measured per-device step of the SPMD window
program (override_ndev hook) at TWO operating points — the KITTI-class
bench workload (16k matched points) and a heavy 2x workload (32k
matched) — plus an insert-budget A/B.  The MULTICHIP.md E(D) table is
computed from these direct measurements.

Run: python tools/probe_scaling.py   (watchdog-wrapped)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _watchdog import child_ready, run_watchdog  # noqa: E402
from bench_sharded_overhead import bench_cfg  # noqa: E402


def main():
    child_ready()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from better_fastlio2_tpu.io.synthetic import make_bench_sequence
    from better_fastlio2_tpu.parallel import sharded
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline, WindowInputs

    W = 8

    def measure(cfg, n_points, tag):
        groups = make_bench_sequence("room", 64, n_points=n_points)
        pipe = LIOPipeline(cfg, window=W, unroll=W)
        for g in groups:
            pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                              g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                              g["scan_end_t"])
        pipe.flush()
        assert pipe.ls.map.dmom is not None
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
            scan_end_t=jnp.asarray(
                [float(g["scan_end_t"]) for g in last], dtype),
            scan_valid=jnp.ones(W, bool),
        )

        def copy_ls(ls):
            return jax.tree_util.tree_map(lambda a: jnp.array(a), ls)

        def chained_ms(wstep, ls, chain=4, n_groups=8):
            ls, infos = wstep(ls, win, an)
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

        mesh = sharded.make_mesh(jax.devices()[:1])
        out = {}
        for D in (1, 2, 4):
            s = sharded.make_spmd_window_step_fn(
                cfg, mesh, W, pipe.ls, unroll=W, override_ndev=D)
            out[D] = chained_ms(s, copy_ls(pipe.ls))
            print(f"# {tag} sim D={D}: {out[D]:.2f} ms/scan", flush=True)
        e2 = out[1] / (2 * out[2])
        e4 = out[1] / (4 * out[4])
        print(f"# {tag}: E(2)={e2:.3f} E(4)={e4:.3f}", flush=True)
        return out

    # the plain 16k / heavy-32k tables were captured in the first run
    # of this tool (tpu_queue.log 2026-08-21T15:49) — this run adds the
    # spmd_local_downsample variants ("--all" re-measures everything)
    results = {}
    if "--all" in sys.argv:
        results["bench_16k"] = measure(bench_cfg(), 30_000, "bench 16k")

    cfg_l = bench_cfg()
    cfg_l.shapes.spmd_local_downsample = True
    results["bench_16k_localds"] = measure(cfg_l, 30_000,
                                           "bench 16k local-ds")

    if "--all" in sys.argv:
        cfg_h = bench_cfg()
        cfg_h.shapes.n_raw = 1 << 16
        cfg_h.shapes.n_ds = 1 << 15
        cfg_h.shapes.knn_chunk = 1 << 15
        results["heavy_32k"] = measure(cfg_h, 60_000, "heavy 32k")

    cfg_hl = bench_cfg()
    cfg_hl.shapes.n_raw = 1 << 16
    cfg_hl.shapes.n_ds = 1 << 15
    cfg_hl.shapes.knn_chunk = 1 << 15
    cfg_hl.shapes.spmd_local_downsample = True
    results["heavy_32k_localds"] = measure(cfg_hl, 60_000,
                                           "heavy 32k local-ds")

    print(json.dumps({"metric": "spmd_scaling_sim",
                      "window": W,
                      "per_device_ms": {k: {str(d): round(v, 2)
                                            for d, v in r.items()}
                                        for k, r in results.items()}}),
          flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__, child_deadline_s=2000))
