"""Sustained per-stage timings of the scan tick (stream-drain method).

Chains each stage's own state dependence (map -> map, (x,P) -> (x,P)) so
`reps` executions enqueue back-to-back, then drains with one scalar
readback: total/reps = sustained cost including real device compute
(see tools/profile_micro3.py for why block_until_ready is unusable).
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


@jax.jit
def _drain(leaf):
    return jnp.sum(jnp.ravel(leaf)[:16]).astype(jnp.float32)


def fetch(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ravel")][0]
    return float(np.asarray(_drain(leaf)))


def bench_chain(fn, state, *args, reps=12):
    """fn(state, *args) -> state; chains state through reps calls."""
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

    g = groups[-1]
    P_, T_, V_ = pipe._pad_points(g["pts"], g["pt_t"])
    A_, G_, Tt_, Mk_ = pipe._pad_imu(g["imu_acc"], g["imu_gyr"], g["imu_t"])
    pts = jnp.asarray(P_); pt_t = jnp.asarray(T_); pt_valid = jnp.asarray(V_)
    batch = imu.ImuBatch(acc=jnp.asarray(A_), gyr=jnp.asarray(G_),
                         t=jnp.asarray(Tt_), mask=jnp.asarray(Mk_))
    Q = imu.build_Q(cfg.mapping.gyr_cov, cfg.mapping.acc_cov,
                    cfg.mapping.b_gyr_cov, cfg.mapping.b_acc_cov, jnp.float32)
    zero = jnp.asarray(0.0, jnp.float32)
    dur = jnp.asarray(g["scan_end_t"], jnp.float32)
    an = jnp.asarray(pipe.acc_norm, jnp.float32)

    # ---- full windowed step (W=8), the production path ---------------------
    W = 8
    win = lio_mod.WindowInputs(
        pts=jnp.tile(pts[None], (W, 1, 1)),
        pt_t=jnp.tile(pt_t[None], (W, 1)),
        pt_valid=jnp.tile(pt_valid[None], (W, 1)),
        imu_acc=jnp.tile(batch.acc[None], (W, 1, 1)),
        imu_gyr=jnp.tile(batch.gyr[None], (W, 1, 1)),
        imu_t=jnp.tile(batch.t[None], (W, 1)),
        imu_mask=jnp.tile(batch.mask[None], (W, 1)),
        last_end_rel=jnp.zeros(W, jnp.float32),
        scan_end_t=jnp.full(W, float(g["scan_end_t"]), jnp.float32),
        scan_valid=jnp.ones(W, bool),
    )
    wstep = lio_mod.make_window_step_fn(cfg, W)

    def copy_ls(ls):
        return jax.tree_util.tree_map(jnp.copy, ls)

    def run_w(ls, win, an):
        ls, infos = wstep(ls, win, an)
        return ls

    t = bench_chain(run_w, copy_ls(ls), win, an, reps=6)
    print(f"window step (W=8)  : {t:8.2f} ms/window = {t / W:6.2f} ms/scan")

    # ---- single-scan jitted step -------------------------------------------
    step1 = lio_mod.make_step_fn(cfg)

    def run_1(ls):
        ls, info = step1(ls, pts, pt_t, pt_valid, batch, zero, dur, an)
        return ls

    print(f"single step        : {bench_chain(run_1, copy_ls(ls), reps=12):8.2f} ms")

    # ---- stage: imu propagate + undistort ----------------------------------
    @jax.jit
    def s_imu(x, Pm):
        xp, Pp, poses = imu.propagate(x, Pm, batch, Q, an, zero, dur,
                                      jnp.zeros(3), jnp.zeros(3))
        und = imu.undistort(xp, poses, pts, pt_t)
        return xp, Pp + 0.0 * jnp.sum(und) * jnp.eye(23)

    def run_imu(c):
        return s_imu(*c)

    print(f"imu+undistort      : {bench_chain(run_imu, (ls.x, ls.P), reps=12):8.2f} ms")

    # ---- stage: downsample --------------------------------------------------
    @jax.jit
    def s_ds(p, v):
        pd, dv = voxel_downsample(p, v, cfg.mapping.surf_leaf_size,
                                  out_size=sh.n_ds)
        return p + 0.0 * jnp.sum(pd), v

    def run_ds(c):
        return s_ds(*c)

    print(f"downsample         : {bench_chain(run_ds, (pts, pt_valid), reps=12):8.2f} ms")

    pts_ds, ds_valid = voxel_downsample(pts, pt_valid,
                                        cfg.mapping.surf_leaf_size,
                                        out_size=sh.n_ds)

    # ---- stage: update (assoc + 4 iters) ------------------------------------
    @jax.jit
    def s_upd(x, Pm, m, pd, dv):
        fn, aux0 = measurement.make_measure_fn(
            m, pd, dv, max_probe=sh.map_max_probe,
            n_neighbors=27, single_association=True,
            max_live=sh.knn_max_live)
        xo, Po, _, _ = esikf.update_iterated(x, Pm, fn, aux0, max_iter=4, n_cols=6)
        return xo, Po

    def run_upd(c, m):
        return s_upd(*c, m, pts_ds, ds_valid)

    print(f"update assoc+x4    : {bench_chain(run_upd, (ls.x, ls.P), ls.map, reps=12):8.2f} ms")

    # ---- stage: update iterations only (association outside the timing
    # would need a cached aux; instead compare against assoc-only below)
    pw = measurement.transform_to_world(ls.x, pts_ds)

    @jax.jit
    def s_knn(m, q):
        nb, d2, ok = voxel_hash.knn(m, q, k=5, max_probe=sh.map_max_probe,
                                    n_neighbors=27, max_live=sh.knn_max_live)
        return q + 0.0 * d2[:, :3]

    def run_knn(q, m):
        return s_knn(m, q)

    print(f"knn L=12           : {bench_chain(run_knn, pw, ls.map, reps=12):8.2f} ms")

    # assoc pass = knn + plane fit
    @jax.jit
    def s_assoc(m, q, pd, dv):
        nb, d2, ok = voxel_hash.knn(m, q, k=5, max_probe=sh.map_max_probe,
                                    n_neighbors=27, max_live=sh.knn_max_live)
        nn_ok = jnp.all(ok, -1) & (d2[:, 4] <= 5.0) & dv
        n, d, pok = measurement.plane_fit(nb, nn_ok)
        return q + 0.0 * n

    def run_assoc(q, m):
        return s_assoc(m, q, pts_ds, ds_valid)

    print(f"assoc (knn+plane)  : {bench_chain(run_assoc, pw, ls.map, reps=12):8.2f} ms")

    # ---- stage: insert ------------------------------------------------------
    @partial(jax.jit, donate_argnums=(0,))
    def s_ins(m, pw_, dv):
        return voxel_hash.insert(m, pw_, dv, max_probe=sh.map_max_probe)

    def run_ins(m):
        return s_ins(m, pw, ds_valid)

    m0 = jax.tree_util.tree_map(jnp.copy, ls.map)
    print(f"insert (donated)   : {bench_chain(run_ins, m0, reps=12):8.2f} ms")

    # ---- stage: crop (fov) --------------------------------------------------
    @partial(jax.jit, donate_argnums=(0,))
    def s_crop(m, lo, hi):
        return voxel_hash.crop_outside_box(m, lo, hi)

    def run_crop(m):
        return s_crop(m, ls.cube_lo, ls.cube_hi)

    m1 = jax.tree_util.tree_map(jnp.copy, ls.map)
    print(f"crop box (donated) : {bench_chain(run_crop, m1, reps=12):8.2f} ms")


if __name__ == "__main__":
    main()
