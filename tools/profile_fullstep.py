"""Interleaved A/B of scan-tick variants — robust to the shared-TPU drift.

The tunneled TPU's effective speed drifts minute-to-minute (other
tenants), so sequential whole-run comparisons are unreliable.  This
round-robins several pipeline variants over the SAME scan stream, so all
variants see the same interference distribution, and reports per-variant
median step time.
"""

from __future__ import annotations

import time

import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline import lio as lio_mod


def make_cfg(max_iter=3, neighbors=27, max_live=0, single_assoc=False,
             n_ds=1 << 15):
    cfg = cfgmod.LIOConfig()
    cfg.shapes = cfgmod.ShapesConfig(
        n_raw=1 << 16, n_ds=n_ds, n_imu=32,
        map_capacity_log2=20, map_bucket=4, map_max_probe=6,
        knn_chunk=n_ds, knn_neighbors=neighbors, knn_max_live=max_live,
    )
    cfg.mapping = cfgmod.MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.4,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = cfgmod.IkdtreeConfig(
        max_iteration=max_iter, filter_size_map_min=0.4,
        single_association=single_assoc)
    return cfg


def main():
    variants = [
        ("27/L0", make_cfg()),
        ("27/L12", make_cfg(max_live=12)),
        ("19/L12", make_cfg(neighbors=19, max_live=12)),
        ("19/L12/sa", make_cfg(neighbors=19, max_live=12,
                               single_assoc=True)),
    ]
    groups = make_lio_sequence(
        duration=6.0, scan_rate=10.0, imu_rate=100.0, n_points=60_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0),
    )
    pipes = [(n, lio_mod.LIOPipeline(c, pipelined=True)) for n, c in variants]
    times = {n: [] for n, _ in variants}
    for g in groups:
        for n, p in pipes:
            t0 = time.perf_counter()
            p.process_scan(
                g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
                g["scan_beg_abs"], g["scan_end_t"])
            times[n].append(time.perf_counter() - t0)
    for n, p in pipes:
        p.flush()
        tr = np.array(p.trajectory)
        steady = np.array(times[n][12:])
        med = np.median(steady)
        p25 = np.percentile(steady, 25)
        print(f"{n:12s}: med {1e3*med:7.1f} ms ({1/med:5.1f}/s) "
              f"p25 {1e3*p25:7.1f} ms ({1/p25:5.1f}/s) "
              f"endpos [{tr[-1][0]:.3f} {tr[-1][1]:.3f} {tr[-1][2]:.3f}]")


if __name__ == "__main__":
    main()
