"""Regression: plane-cache + single-association must survive motion-onset
transients in unexplored terrain (the lazy re-association guard,
measurement.make_measure_fn docstring).

Without the guard the single association converges to a biased fixpoint
whose insertions contaminate the moment cache — the error compounds
scan-over-scan to meters (observed 8.99 m ATE on the full corridor run;
tools/_probe_crop2.py)."""

import numpy as np

from better_fastlio2_tpu.config import (
    IkdtreeConfig,
    LIOConfig,
    MappingConfig,
    ShapesConfig,
)
from better_fastlio2_tpu.io.synthetic import (
    SyntheticWorld,
    Trajectory,
    make_lio_sequence,
)
from better_fastlio2_tpu.pipeline.lio import LIOPipeline


def test_plane_cache_single_assoc_survives_motion_onset():
    world = SyntheticWorld(seed=3, half_x=40.0, half_y=10.0, height=6.0,
                           density=25.0)
    # partitions make the along-corridor direction observable
    rng = np.random.default_rng(5)
    extra = []
    for i, wx in enumerate(range(-36, 42, 12)):
        side = 1 if i % 2 == 0 else -1
        n = 1500
        y = rng.uniform(0 if side > 0 else -10, 10 if side > 0 else 0, n)
        z = rng.uniform(0, 6.0, n)
        extra.append(np.stack([np.full(n, float(wx)), y, z], 1))
    world.points = np.concatenate([world.points] + extra)

    traj = Trajectory(t_still=1.0, speed=3.0, yaw_amp=0.12)
    groups = make_lio_sequence(duration=5.0, n_points=2500, seed=11,
                               noise=0.004, traj=traj, world=world)

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(n_raw=4096, n_ds=4096, n_imu=32,
                              map_capacity_log2=16, map_bucket=4,
                              map_max_probe=8, knn_chunk=4096)
    cfg.mapping = MappingConfig(det_range=60., cube_len=500.,
                                surf_leaf_size=0.4, extrinsic_est_en=False)
    # warmup 6 ends BEFORE motion onset (scan 10) — the hard case: the
    # moment-plane association must absorb the velocity transient alone
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4,
                                plane_cache=True, plane_cache_warmup=6,
                                single_association=True)
    pipe = LIOPipeline(cfg)
    errs = []
    for g in groups:
        out = pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                                g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                                g["scan_end_t"])
        if out is not None:
            errs.append(np.linalg.norm(
                np.array(out["pos"]) - (g["gt_pos"] - np.array([0, 0, 1.5]))))
    final = float(np.mean(errs[-5:]))
    # without the lazy refresh this reaches ~3 m by scan 40 and keeps
    # growing; with it the filter re-locks to centimetres
    assert final < 0.3, f"motion-onset transient not absorbed: {final:.3f} m"
