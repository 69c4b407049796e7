import sys; sys.path.insert(0, "/root/repo")
"""bench.py variants: dense torus size / unroll."""
import json, time
import numpy as np

def run(dense_log2, unroll, CAPL2):
    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig, MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline
    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16, map_capacity_log2=CAPL2,
        map_bucket=4, map_max_probe=6, knn_chunk=1 << 14,
        map_dense_log2=dense_log2, knn_max_live=12,
        insert_claim_budget=2048, insert_dense_budget=2048)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0, surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=4, filter_size_map_min=0.5,
                                single_association=True, plane_cache=True,
                                plane_cache_warmup=16)
    n_scans = 120; window = 8
    groups = list(make_lio_sequence(duration=n_scans / 10.0, scan_rate=10.0,
        imu_rate=100.0, n_points=30_000, seed=7, noise=0.004,
        traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = LIOPipeline(cfg, pipelined=True, window=window, quantized=True, unroll=unroll)
    warmup = 5 * window; marks = []
    for i, g in enumerate(groups):
        if pipe.inited and i >= warmup and (i - warmup) % window == 0:
            marks.append(time.perf_counter())
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
                          g["scan_beg_abs"], g["scan_end_t"])
    pipe.flush(); marks.append(time.perf_counter())
    traj = np.array(pipe.trajectory); assert np.all(np.isfinite(traj))
    durs = np.diff(np.array(marks))
    return window / float(np.median(durs))

dense = tuple(int(x) for x in sys.argv[1].split(","))
unroll = int(sys.argv[2])
caplog2 = int(sys.argv[3]) if len(sys.argv) > 3 else 20
print(json.dumps({"dense": dense, "unroll": unroll, "cap": caplog2,
                  "scans_per_sec": round(run(dense, unroll, caplog2), 2)}))
