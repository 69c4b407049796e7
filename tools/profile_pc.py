"""Sustained timings of the plane-cache step vs the 5-NN step."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.core import esikf, imu, measurement
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.ops.downsample import voxel_downsample
from better_fastlio2_tpu.pipeline import lio as lio_mod


@jax.jit
def _drain(leaf):
    return jnp.sum(jnp.ravel(leaf)[:16]).astype(jnp.float32)


def fetch(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")][0]
    return float(np.asarray(_drain(leaf)))


def bench_chain(fn, state, *args, reps=10):
    s = fn(state, *args)
    fetch(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(s, *args)
    fetch(s)
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    cfg = cfgmod.LIOConfig()
    cfg.shapes = cfgmod.ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16,
        map_capacity_log2=20, map_bucket=4, map_max_probe=6,
        knn_chunk=1 << 14, map_dense_log2=(8, 8, 7), knn_max_live=12,
    )
    cfg.mapping = cfgmod.MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = cfgmod.IkdtreeConfig(
        max_iteration=4, filter_size_map_min=0.5, single_association=True,
        plane_cache=True, plane_cache_warmup=6)
    sh = cfg.shapes

    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    ls = pipe.ls
    print(f"map voxels: {int(voxel_hash.num_voxels(ls.map))}")

    g = groups[-1]
    P_, T_, V_ = pipe._pad_points(g["pts"], g["pt_t"])
    pts = jnp.asarray(P_); pt_valid = jnp.asarray(V_)
    pts_ds, ds_valid = voxel_downsample(pts, pt_valid,
                                        cfg.mapping.surf_leaf_size,
                                        out_size=sh.n_ds)
    pw = measurement.transform_to_world(ls.x, pts_ds)

    def copy_ls(ls):
        return jax.tree_util.tree_map(jnp.copy, ls)

    # full single-scan step, both modes
    for pc in (False, True):
        step1 = lio_mod.make_step_fn(cfg, plane_cache=pc)
        batch = imu.ImuBatch(
            acc=jnp.asarray(np.zeros((sh.n_imu, 3), np.float32)),
            gyr=jnp.asarray(np.zeros((sh.n_imu, 3), np.float32)),
            t=jnp.asarray(np.full(sh.n_imu, np.inf, np.float32)),
            mask=jnp.asarray(np.zeros(sh.n_imu, bool)),
        )
        zero = jnp.asarray(0.0, jnp.float32)
        dur = jnp.asarray(0.1, jnp.float32)
        an = jnp.asarray(9.81, jnp.float32)

        def run1(ls):
            ls, _ = step1(ls, pts, jnp.asarray(T_), pt_valid, batch, zero,
                          dur, an)
            return ls

        print(f"step plane_cache={pc}: {bench_chain(run1, copy_ls(ls)):7.2f} ms")

    # association comparison
    @jax.jit
    def s_pfm(m, q, dv):
        n, d, ok = measurement.plane_from_moments(m, q, dv, max_probe=6)
        return q + 0.0 * n

    def run_pfm(q):
        return s_pfm(ls.map, q, ds_valid)

    print(f"plane_from_moments : {bench_chain(run_pfm, pw):7.2f} ms")

    # update with plane cache
    @jax.jit
    def s_upd(x, Pm, m):
        fn, aux0 = measurement.make_measure_fn(
            m, pts_ds, ds_valid, max_probe=6, single_association=True,
            plane_cache=True)
        xo, Po, _, _ = esikf.update_iterated(x, Pm, fn, aux0, max_iter=4, n_cols=6)
        return xo, Po

    def run_upd(c):
        return s_upd(*c, ls.map)

    print(f"update pc assoc+x4 : {bench_chain(run_upd, (ls.x, ls.P)):7.2f} ms")

    # insert with vs without moments
    @partial(jax.jit, donate_argnums=(0,))
    def s_ins(m, pw_, dv):
        return voxel_hash.insert(m, pw_, dv, max_probe=6)

    def run_ins(m):
        return s_ins(m, pw, ds_valid)

    m0 = jax.tree_util.tree_map(jnp.copy, ls.map)
    print(f"insert (+moments)  : {bench_chain(run_ins, m0):7.2f} ms")
    m_nm = jax.tree_util.tree_map(jnp.copy, ls.map)._replace(mom=None)
    print(f"insert (no mom)    : {bench_chain(run_ins, m_nm):7.2f} ms")


if __name__ == "__main__":
    main()
