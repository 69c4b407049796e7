"""Per-stage latency breakdown of the scan tick on the real chip.

Builds a realistic filter state by running the pipeline for a few scans,
then times each stage of the tick as its own jitted program (median of
repeats, block_until_ready).  Stage sums exceed the fused full-step time
(XLA overlaps stages inside one program); use this for RELATIVE cost.
"""

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


def bench_fn(fn, *args, reps=12, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    cfg = cfgmod.LIOConfig()
    cfg.shapes = cfgmod.ShapesConfig(
        n_raw=1 << 15, n_ds=1 << 14, n_imu=16,
        map_capacity_log2=20, map_bucket=4, map_max_probe=6,
        knn_chunk=1 << 14, map_dense_log2=(9, 9, 7), knn_max_live=12,
    )
    cfg.mapping = cfgmod.MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = cfgmod.IkdtreeConfig(
        max_iteration=4, filter_size_map_min=0.5, single_association=True)
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

    # representative inputs from the last group
    g = groups[-1]
    n_pad = sh.n_raw
    P = np.zeros((n_pad, 3), np.float32)
    T = np.zeros(n_pad, np.float32)
    V = np.zeros(n_pad, bool)
    n = min(len(g["pts"]), n_pad)
    P[:n], T[:n], V[:n] = g["pts"][:n], g["pt_t"][:n], True
    pts = jnp.asarray(P); pt_t = jnp.asarray(T); pt_valid = jnp.asarray(V)
    m_imu = sh.n_imu
    k = min(len(g["imu_acc"]), m_imu)
    A = np.zeros((m_imu, 3), np.float32); G = np.zeros((m_imu, 3), np.float32)
    Tt = np.full(m_imu, np.inf, np.float32); Mk = np.zeros(m_imu, bool)
    A[:k], G[:k], Tt[:k], Mk[:k] = g["imu_acc"][:k], g["imu_gyr"][:k], g["imu_t"][:k], True
    batch = imu.ImuBatch(acc=jnp.asarray(A), gyr=jnp.asarray(G),
                         t=jnp.asarray(Tt), mask=jnp.asarray(Mk))
    Q = imu.build_Q(cfg.mapping.gyr_cov, cfg.mapping.acc_cov,
                    cfg.mapping.b_gyr_cov, cfg.mapping.b_acc_cov, jnp.float32)
    zero = jnp.asarray(0.0, jnp.float32)
    dur = jnp.asarray(g["scan_end_t"], jnp.float32)
    an = jnp.asarray(pipe.acc_norm, jnp.float32)

    # --- stage: IMU propagate + undistort -------------------------------
    @jax.jit
    def s_imu(x, Pm, b):
        xp, Pp, poses = imu.propagate(x, Pm, b, Q, an, zero, dur,
                                      ls.last_acc_w, ls.last_gyr_b)
        return imu.undistort(xp, poses, pts, pt_t)

    print(f"imu+undistort   : {bench_fn(s_imu, ls.x, ls.P, batch):7.2f} ms")

    # --- stage: downsample ----------------------------------------------
    @jax.jit
    def s_ds(p, v):
        return voxel_downsample(p, v, cfg.mapping.surf_leaf_size,
                                out_size=sh.n_ds)

    pts_ds, ds_valid = s_ds(pts, pt_valid)
    print(f"downsample      : {bench_fn(s_ds, pts, pt_valid):7.2f} ms")

    # --- stage: kNN alone ------------------------------------------------
    pw = measurement.transform_to_world(ls.x, pts_ds)

    @partial(jax.jit, static_argnames=("ml",))
    def s_knn(m, q, ml):
        return voxel_hash.knn(m, q, k=5, max_probe=sh.map_max_probe,
                              n_neighbors=27, max_live=ml)

    print(f"knn (L=12)      : {bench_fn(s_knn, ls.map, pw, ml=12):7.2f} ms")
    print(f"knn (L=27)      : {bench_fn(s_knn, ls.map, pw, ml=0):7.2f} ms")

    # --- stage: one full measurement pass (with association) -------------
    @jax.jit
    def s_meas(m, pd, dv, x):
        fn, aux0 = measurement.make_measure_fn(
            m, pd, dv, max_probe=sh.map_max_probe,
            n_neighbors=27, max_live=sh.knn_max_live)
        return fn(x, jnp.array(True), aux0)

    print(f"measure pass    : {bench_fn(s_meas, ls.map, pts_ds, ds_valid, ls.x):7.2f} ms")

    # --- stage: full iterated update (single association) -----------------
    @jax.jit
    def s_upd(m, pd, dv, x, Pm):
        fn, aux0 = measurement.make_measure_fn(
            m, pd, dv, max_probe=sh.map_max_probe,
            n_neighbors=27, single_association=True,
            max_live=sh.knn_max_live)
        return esikf.update_iterated(x, Pm, fn, aux0, max_iter=4, n_cols=6)[:2]

    print(f"update x4 (sa)  : {bench_fn(s_upd, ls.map, pts_ds, ds_valid, ls.x, ls.P):7.2f} ms")

    # --- stage: insert -----------------------------------------------------
    pts_w = measurement.transform_to_world(ls.x, pts_ds)

    @jax.jit
    def s_ins(m, pw_, dv):
        return voxel_hash.insert(
            jax.tree_util.tree_map(jnp.copy, m), pw_, dv,
            max_probe=sh.map_max_probe)

    print(f"insert (+copy)  : {bench_fn(s_ins, ls.map, pts_w, ds_valid):7.2f} ms")

    # --- full fused step ---------------------------------------------------
    step = lio_mod.make_step_fn(cfg)
    ls2 = ls

    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        ls2, info = step(ls2, pts, pt_t, pt_valid, batch, zero, dur, an)
        jax.block_until_ready(info)
        ts.append(time.perf_counter() - t0)
    print(f"full step       : {1e3 * float(np.median(ts)):7.2f} ms")


if __name__ == "__main__":
    main()
