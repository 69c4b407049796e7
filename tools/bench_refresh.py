import sys; sys.path.insert(0, "/root/repo")
"""Chained timing of update_iterated with/without the lazy refresh."""
import time
import jax, jax.numpy as jnp, numpy as np
from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.core import esikf, imu, measurement
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.pipeline import lio as lio_mod

cfg = cfgmod.LIOConfig()
cfg.shapes = cfgmod.ShapesConfig(
    n_raw=1 << 15, n_ds=1 << 14, n_imu=16, map_capacity_log2=20,
    map_bucket=4, map_max_probe=6, knn_chunk=1 << 14,
    map_dense_log2=(9, 9, 7), knn_max_live=12)
cfg.mapping = cfgmod.MappingConfig(det_range=60.0, cube_len=400.0,
                                   surf_leaf_size=0.5, extrinsic_est_en=False)
cfg.ikdtree = cfgmod.IkdtreeConfig(max_iteration=4, filter_size_map_min=0.5,
                                   single_association=True, plane_cache=True,
                                   plane_cache_warmup=4)
groups = list(make_lio_sequence(duration=3.0, scan_rate=10.0, imu_rate=100.0,
    n_points=30_000, seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
for g in groups:
    pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                      g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
ls = pipe.ls
from better_fastlio2_tpu.ops.downsample import voxel_downsample
g = groups[-1]
P_, T_, V_ = pipe._pad_points(g["pts"], g["pt_t"])
pts = jnp.asarray(P_); pt_valid = jnp.asarray(V_)
pts_ds, ds_valid = voxel_downsample(pts, pt_valid, 0.5, out_size=cfg.shapes.n_ds)
pts_ds = jax.device_put(pts_ds); ds_valid = jax.device_put(ds_valid)

@jax.jit
def _drain(x): return jnp.sum(jnp.ravel(x)[:16]).astype(jnp.float32)

def bench_chain(fn, reps=20):
    c = (ls.x, ls.P)
    o = fn(*c); float(np.asarray(_drain(o[1])))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*o)
    float(np.asarray(_drain(o[1])))
    return 1e3 * (time.perf_counter() - t0) / reps

from functools import partial
for rb in (0, 64, 4096):
    @partial(jax.jit, static_argnames=("rb",))
    def s_upd_m(x, Pm, m, rb):
        fn, aux0 = measurement.make_measure_fn(
            m, pts_ds, ds_valid, max_probe=6, n_neighbors=27,
            single_association=True, max_live=12, plane_cache=True,
            refresh_budget=rb)
        xo, Po, _, _ = esikf.update_iterated(x, Pm, fn, aux0, max_iter=4, n_cols=6)
        return xo, Po
    s_upd = lambda x, Pm, rb=rb: s_upd_m(x, Pm, ls.map, rb)
    print(f"update refresh_budget={rb:5d}: {bench_chain(s_upd):7.2f} ms", flush=True)
