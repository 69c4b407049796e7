import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.ops.downsample import voxel_downsample

groups = list(make_lio_sequence(duration=12.0, scan_rate=10.0, imu_rate=100.0,
    n_points=30_000, seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
occ = []
for g in groups[::10]:
    pts = np.zeros((1<<15, 3), np.float32); n = len(g["pts"])
    pts[:n] = g["pts"]; valid = np.zeros(1<<15, bool); valid[:n] = True
    out, ov = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.5, out_size=1<<15)
    occ.append(int(ov.sum()))
print("raw n:", n, "ds occupancy:", min(occ), max(occ), "padding:", 1<<14)
