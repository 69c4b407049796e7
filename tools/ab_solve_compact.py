"""In-process A/B of valid-lane solve compaction (shapes.solve_compact)
on the hostile outdoor workload (VERDICT r3 next #4).

Runs the IDENTICAL W=8 quantized window pipeline twice back-to-back in
one process (same tunnel state — the only A/B form that survives the
remote-transport variance, see PERF.md measurement discipline):
solve_compact=0 vs 3/4*n_ds.  Reports steady median ms/scan for each
and the delta.  The outdoor association hit rate is 0.74-0.78, so ~25%
of fused-solve lanes are dead there; the compacted kernel should save
roughly that fraction of the per-iteration solve cost.

    python tools/ab_solve_compact.py            # parent: respawn loop
    python tools/ab_solve_compact.py --child    # the actual run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _watchdog import child_ready, run_watchdog  # noqa: E402


def main():
    import numpy as np

    child_ready()

    from better_fastlio2_tpu import config as cfgmod
    from better_fastlio2_tpu.io.synthetic import make_bench_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline

    def build_cfg(solve_compact: int):
        cfg = cfgmod.LIOConfig()
        cfg.shapes = cfgmod.ShapesConfig(
            n_raw=1 << 15, n_ds=1 << 14, n_imu=16,
            map_capacity_log2=20, map_bucket=4, map_max_probe=6,
            knn_chunk=1 << 14, map_dense_log2=(8, 8, 7), knn_max_live=12,
            insert_claim_budget=2048, insert_dense_budget=2048,
            insert_mom_budget=4096, solve_compact=solve_compact)
        cfg.mapping = cfgmod.MappingConfig(
            det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
            extrinsic_est_en=False)
        cfg.ikdtree = cfgmod.IkdtreeConfig(
            max_iteration=4, filter_size_map_min=0.5,
            single_association=True, plane_cache=True,
            plane_cache_warmup=16, mom_dense=True, early_converge=True)
        return cfg

    W = 8
    n_scans = 240
    groups = make_bench_sequence("outdoor", n_scans)
    print("# sequence ready", flush=True)

    def run_once(solve_compact: int):
        pipe = LIOPipeline(build_cfg(solve_compact), pipelined=True,
                           window=W, quantized=True, unroll=W)
        warmup = 5 * W
        marks = []
        for i, g in enumerate(groups):
            if pipe.inited and i >= warmup and (i - warmup) % W == 0:
                marks.append(time.perf_counter())
            if i % 80 == 0:
                print(f"# sc={solve_compact} scan {i}", flush=True)
            pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                              g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                              g["scan_end_t"])
        pipe.flush()
        marks.append(time.perf_counter())
        traj = np.asarray(pipe.trajectory)
        assert np.all(np.isfinite(traj))
        durs = np.diff(np.array(marks))
        return 1e3 * float(np.median(durs)) / W, traj[-1, :3]

    # interleave A/B/A/B to cancel slow tunnel drift
    res = {0: [], (3 * (1 << 14)) // 4: []}
    ends = {}
    for rep in range(2):
        for sc in res:
            ms, end = run_once(sc)
            res[sc].append(ms)
            ends[sc] = end
            print(f"# rep{rep} solve_compact={sc}: {ms:.2f} ms/scan",
                  flush=True)
    b = (3 * (1 << 14)) // 4
    end_delta = float(np.linalg.norm(ends[0] - ends[b]))
    print(json.dumps({
        "metric": "ab_solve_compact_outdoor_ms_per_scan",
        "off": round(min(res[0]), 2), "on": round(min(res[b]), 2),
        "delta_ms": round(min(res[0]) - min(res[b]), 2),
        "end_pos_delta_m": round(end_delta, 4),
        "budget": b, "window": W,
    }), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__))
