import sys; sys.path.insert(0, "/root/repo")
"""bench.py with parameterized window size."""
import json, time
import numpy as np

def main(window):
    import jax
    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig, MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16, map_capacity_log2=20,
        map_bucket=4, map_max_probe=6, knn_chunk=1 << 14,
        map_dense_log2=(9, 9, 7), knn_max_live=12,
        insert_claim_budget=2048, insert_dense_budget=2048)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0, surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=4, filter_size_map_min=0.5,
                                single_association=True, plane_cache=True,
                                plane_cache_warmup=16)
    n_scans = 40 * (window // 8) + 80
    groups = list(make_lio_sequence(duration=n_scans / 10.0, scan_rate=10.0,
        imu_rate=100.0, n_points=30_000, seed=7, noise=0.004,
        traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = LIOPipeline(cfg, pipelined=True, window=window, quantized=True, unroll=min(window, 8))
    warmup = max(5 * 8, 3 * window)
    warmup = ((warmup + window - 1) // window) * window
    marks = []
    for i, g in enumerate(groups):
        if pipe.inited and i >= warmup and (i - warmup) % window == 0:
            marks.append(time.perf_counter())
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
                          g["scan_beg_abs"], g["scan_end_t"])
    pipe.flush(); marks.append(time.perf_counter())
    traj = np.array(pipe.trajectory)
    assert np.all(np.isfinite(traj))
    durs = np.diff(np.array(marks))
    sps = window / float(np.median(durs))
    print(json.dumps({"window": window, "scans_per_sec": round(sps, 2),
                      "n_windows": len(durs),
                      "end_pos": [round(float(v), 3) for v in traj[-1][:3]]}))

if __name__ == "__main__":
    main(int(sys.argv[1]))
