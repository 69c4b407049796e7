import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from better_fastlio2_tpu.config import LIOConfig, ShapesConfig, MappingConfig, IkdtreeConfig
from better_fastlio2_tpu.io.synthetic import SyntheticWorld, Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline.lio import LIOPipeline

world = SyntheticWorld(seed=3, half_x=60.0, half_y=10.0, height=6.0, density=30.0)
rng = np.random.default_rng(5)
extra = []
for i, wx in enumerate(range(-48, 54, 12)):
    side = 1 if i % 2 == 0 else -1
    n = 2000
    y = rng.uniform(0 if side > 0 else -10, 10 if side > 0 else 0, n)
    z = rng.uniform(0, 6.0, n)
    extra.append(np.stack([np.full(n, float(wx)), y, z], 1))
world.points = np.concatenate([world.points] + extra)
traj = Trajectory(t_still=1.0, speed=3.0, yaw_amp=0.12)
groups = make_lio_sequence(duration=16.0, n_points=3000, seed=11, noise=0.004,
                           traj=traj, world=world)
cfg = LIOConfig()
cfg.shapes = ShapesConfig(n_raw=4096, n_ds=4096, n_imu=32, map_capacity_log2=16,
                          map_bucket=4, map_max_probe=8, knn_chunk=4096,
                          insert_claim_budget=1024, insert_dense_budget=1024)
cfg.mapping = MappingConfig(det_range=60., cube_len=500., surf_leaf_size=0.4,
                            extrinsic_est_en=False)
cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4,
                            plane_cache=True, plane_cache_warmup=6, mom_cap=8,
                            single_association=True)
pipe = LIOPipeline(cfg)
for i, g in enumerate(groups):
    out = pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                            g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    if out is not None and i % 5 == 0:
        e = np.linalg.norm(np.array(out["pos"]) - (g["gt_pos"] - np.array([0,0,1.5])))
        print(f"scan {i:3d} err {e:8.3f} n_eff {out.get('n_ds','?')} vox {out['map_voxels']}")
