"""Per-stage timings of the PRODUCTION (bench.py) scan tick.

Same stream-drain chaining as tools/profile_window.py, with the exact
bench configuration: plane-cache association, (8,8,7) dense torus,
moments-only steady insert with claim/dense budgets, packed-key
downsample, QUANTIZED wire format, and the window filled with the last
W DISTINCT scan groups (so steady insert/claim work reflects a real
moving trajectory, not a repeated scan).  Use this to find the next
bottleneck of the number bench.py actually reports.
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
        insert_claim_budget=2048, insert_dense_budget=2048,
    )
    cfg.mapping = cfgmod.MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = cfgmod.IkdtreeConfig(
        max_iteration=4, filter_size_map_min=0.5, single_association=True,
        plane_cache=True, plane_cache_warmup=16)
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

    # ---- full windowed step (W=8), the production steady program -----------
    # quantized wire format + the last W DISTINCT scan groups, mirroring
    # bench.py (LIOPipeline(window=8, quantized=True)); a repeated scan
    # understates steady insert/claim work (every insert hits claimed
    # voxels), and the unquantized program skips dequantization.
    W = 8
    qrows = []
    for gw in groups[-W:]:
        Pw, Tw, Vw = pipe._pad_points(gw["pts"], gw["pt_t"])
        Aw, Gw, Ttw, Mkw = pipe._pad_imu(gw["imu_acc"], gw["imu_gyr"],
                                         gw["imu_t"])
        qrows.append(pipe._pack_quant(Pw, Tw, Vw, Aw, Gw, Ttw, Mkw,
                                      0.0, float(gw["scan_end_t"])))
    win = lio_mod.QuantWindowInputs(
        bulk=jnp.asarray(np.stack([r[0] for r in qrows])),
        meta=jnp.asarray(np.stack([r[1] for r in qrows])),
    )
    wstep = lio_mod.make_window_step_fn(cfg, W, plane_cache=True,
                                        quantized=True, unroll=W)

    def copy_ls(ls):
        return jax.tree_util.tree_map(jnp.copy, ls)

    def run_w(ls, win, an):
        ls, infos = wstep(ls, win, an)
        return ls

    t = bench_chain(run_w, copy_ls(ls), win, an, reps=6)
    print(f"window step (W=8)  : {t:8.2f} ms/window = {t / W:6.2f} ms/scan")

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

    # ---- stage: downsample (packed-key path, as in the tick) ----------------
    packed = (2.2 * cfg.mapping.det_range / cfg.mapping.surf_leaf_size) < 1000.

    @jax.jit
    def s_ds(p, v):
        pd, dv = voxel_downsample(p, v, cfg.mapping.surf_leaf_size,
                                  out_size=sh.n_ds, packed_key=packed)
        return p + 0.0 * jnp.sum(pd), v

    def run_ds(c):
        return s_ds(*c)

    print(f"downsample (packed): {bench_chain(run_ds, (pts, pt_valid), reps=12):8.2f} ms")

    pts_ds, ds_valid = voxel_downsample(pts, pt_valid,
                                        cfg.mapping.surf_leaf_size,
                                        out_size=sh.n_ds, packed_key=packed)

    # ---- stage: plane-cache update (assoc + 4 iters) -------------------------
    @jax.jit
    def s_upd(x, Pm, m, pd, dv):
        fn, aux0 = measurement.make_measure_fn(
            m, pd, dv, max_probe=sh.map_max_probe,
            n_neighbors=27, single_association=True,
            max_live=sh.knn_max_live, plane_cache=True)
        xo, Po, _, _ = esikf.update_iterated(x, Pm, fn, aux0, max_iter=4, n_cols=6)
        return xo, Po

    def run_upd(c, m):
        return s_upd(*c, m, pts_ds, ds_valid)

    print(f"pc update assoc+x4 : {bench_chain(run_upd, (ls.x, ls.P), ls.map, reps=12):8.2f} ms")

    # assoc only (plane-cache blend)
    @jax.jit
    def s_assoc(x, m, pd, dv):
        fn, aux0 = measurement.make_measure_fn(
            m, pd, dv, max_probe=sh.map_max_probe,
            n_neighbors=27, single_association=True,
            max_live=sh.knn_max_live, plane_cache=True)
        out = fn(x, jnp.array(False), aux0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return x, jnp.sum(leaf)

    def run_assoc2(st, m):
        return s_assoc(st[0], m, pts_ds, ds_valid)

    print(f"pc assoc only      : {bench_chain(run_assoc2, (ls.x, zero), ls.map, reps=12):8.2f} ms")

    # ---- stage: steady insert (moments-only + budgets, donated) -------------
    pw = measurement.transform_to_world(ls.x, pts_ds)

    @partial(jax.jit, donate_argnums=(0,))
    def s_ins(m, pw_, dv):
        return voxel_hash.insert(
            m, pw_, dv, max_probe=sh.map_max_probe, pre_grouped=True,
            claim_budget=sh.insert_claim_budget,
            dense_budget=sh.insert_dense_budget,
            moments_only=m.mom is not None)

    def run_ins(m):
        return s_ins(m, pw, ds_valid)

    print(f"steady insert      : {bench_chain(run_ins, copy_ls(ls).map, reps=12):8.2f} ms")

    # ---- stage: crop (steady: skip_points) -----------------------------------
    @partial(jax.jit, donate_argnums=(0,))
    def s_crop(m, lo, hi):
        return voxel_hash.crop_outside_box(m, lo, hi, skip_points=True)

    lo = ls.cube_lo; hi = ls.cube_hi

    def run_crop(m):
        return s_crop(m, lo, hi)

    print(f"crop (steady)      : {bench_chain(run_crop, copy_ls(ls).map, reps=12):8.2f} ms")


if __name__ == "__main__":
    main()
