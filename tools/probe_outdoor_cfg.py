import sys; sys.path.insert(0, "/root/repo")
"""One-process outdoor-config A/B: runs bench.py's exact outdoor feed
loop (240 scans, W=8, quantized, pipelined) for several candidate
(n_ds, solve_compact, max_iteration) configs back to back, reporting
wall ms/scan + accuracy for each.  Shares the persistent compile cache
with bench.py, so repeat shapes skip the multi-minute tunnel compile.
Probe only — the official artifact always comes from bench.py.
"""
import json
import time

import numpy as np


def run_cfg(groups, n_ds, solve_compact, max_iter, window=8):
    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig,
                                            MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 15, n_ds=n_ds, n_imu=16, map_capacity_log2=20,
        map_bucket=4, map_max_probe=6, knn_chunk=n_ds,
        map_dense_log2=(8, 8, 7), knn_max_live=12,
        insert_claim_budget=2048, insert_dense_budget=2048,
        insert_mom_budget=4096, solve_compact=solve_compact,
        ds_drop_high_z=True)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0,
                                surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=max_iter,
                                filter_size_map_min=0.5,
                                single_association=True, plane_cache=True,
                                plane_cache_warmup=16, mom_dense=True,
                                early_converge=True)
    pipe = LIOPipeline(cfg, pipelined=True, window=window, quantized=True,
                       unroll=window)
    warmup = 5 * window
    marks, gt_pos = [], []
    for i, g in enumerate(groups):
        if pipe.inited and i >= warmup and (i - warmup) % window == 0:
            marks.append(time.perf_counter())
        if pipe.inited:
            gt_pos.append(g["gt_pos"])
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    pipe.flush()
    marks.append(time.perf_counter())
    traj = np.array(pipe.trajectory)
    ngt = min(len(traj), len(gt_pos))
    est = traj[:ngt, :3] - traj[0, :3]
    gt = np.asarray(gt_pos[:ngt]) - np.asarray(gt_pos[0])
    err = np.linalg.norm(est - gt, axis=1)
    durs = np.diff(np.array(marks))
    med = float(np.median(durs))
    return {
        "n_ds": n_ds, "solve_compact": solve_compact, "max_iter": max_iter,
        "wall_ms_per_scan": round(1e3 * med / window, 2),
        "scans_per_sec": round(window / med, 2),
        "window_mad_frac": round(float(
            np.median(np.abs(durs - np.median(durs))) / med), 3),
        "n_windows": len(durs),
        "ate_m": round(float(np.sqrt(np.mean(err ** 2))), 4),
        "end_err_m": round(float(err[-1]), 4),
    }


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bflio2")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    jnp.zeros(8).block_until_ready()
    print("# READY", flush=True)
    from better_fastlio2_tpu.io.synthetic import make_bench_sequence

    groups = make_bench_sequence("outdoor", 240)
    print("# sequence ready", flush=True)
    cfgs = [
        (12288, 9216, 4),    # current committed artifact config
        (10240, 8192, 4),    # smaller budget, compaction engaged
        (8192, 7168, 4),     # aggressive budget
        (8192, 7168, 3),     # + one fewer solve pass
    ]
    for n_ds, sc, mi in cfgs:
        r = run_cfg(groups, n_ds, sc, mi)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
