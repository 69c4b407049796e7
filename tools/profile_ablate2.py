"""In-window ablation of the mom_dense steady program + A/B vs the slot
path, on the bench workload.  Same method as profile_ablate.py (patch a
stage to a no-op INSIDE the jitted W=8 window; the delta vs the full
window is the stage's true in-window cost), extended with:

  * insert_dense_moments / dense association ablations
  * an A/B: the identical window program with mom_dense on vs off,
    measured back-to-back in one process (same tunnel state)

Run under the watchdog wrapper (the remote tunnel wedges fresh
processes ~50% of the time in bad windows):

    python tools/profile_ablate2.py            # parent: respawn loop
    python tools/profile_ablate2.py --child    # the actual run
"""

from __future__ import annotations

import os

import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _watchdog import child_ready, run_watchdog  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    child_ready()

    from better_fastlio2_tpu import config as cfgmod
    from better_fastlio2_tpu.core import esikf, imu
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.map import voxel_hash
    from better_fastlio2_tpu.ops import downsample as ds_mod
    from better_fastlio2_tpu.pipeline import lio as lio_mod

    def build_cfg(mom_dense: bool):
        cfg = cfgmod.LIOConfig()
        cfg.shapes = cfgmod.ShapesConfig(
            n_raw=1 << 15, n_ds=1 << 14, n_imu=16,
            map_capacity_log2=20, map_bucket=4, map_max_probe=6,
            knn_chunk=1 << 14, map_dense_log2=(8, 8, 7), knn_max_live=12,
            insert_claim_budget=2048, insert_dense_budget=2048,
            insert_mom_budget=4096)
        cfg.mapping = cfgmod.MappingConfig(
            det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
            extrinsic_est_en=False)
        cfg.ikdtree = cfgmod.IkdtreeConfig(
            max_iteration=4, filter_size_map_min=0.5,
            single_association=True, plane_cache=True,
            plane_cache_warmup=16, mom_dense=mom_dense)
        return cfg

    W = 8
    groups = list(make_lio_sequence(
        duration=6.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))

    def run_pipe(cfg):
        pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
        for g in groups:
            pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                              g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                              g["scan_end_t"])
        qrows = []
        for gw in groups[-W:]:
            Pw, Tw, Vw = pipe._pad_points(gw["pts"], gw["pt_t"])
            Aw, Gw, Ttw, Mkw = pipe._pad_imu(gw["imu_acc"], gw["imu_gyr"],
                                             gw["imu_t"])
            qrows.append(pipe._pack_quant(Pw, Tw, Vw, Aw, Gw, Ttw, Mkw,
                                          0.0, float(gw["scan_end_t"])))
        win = lio_mod.QuantWindowInputs(
            bulk=jnp.asarray(np.stack([r[0] for r in qrows])),
            meta=jnp.asarray(np.stack([r[1] for r in qrows])))
        return pipe, win

    def copy_ls(ls):
        return jax.tree_util.tree_map(jnp.copy, ls)

    def timed(cfg, ls0, win, an, tag, patches, reps=8):
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            wstep = lio_mod.make_window_step_fn(cfg, W, plane_cache=True,
                                                quantized=True, unroll=W)
            s = copy_ls(ls0)
            s, infos = wstep(s, win, an)
            np.asarray(infos[0])
            best = 1e9
            for _g in range(3):
                t0 = time.perf_counter()
                for _ in range(reps):
                    s, infos = wstep(s, win, an)
                np.asarray(infos[0])
                best = min(best,
                           1e3 * (time.perf_counter() - t0) / reps)
            print(f"{tag:30s}: {best:7.2f} ms/window = "
                  f"{best / W:5.2f} ms/scan", flush=True)
            return best
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

    # ---- A/B: slot path vs mom_dense ------------------------------------
    cfg_old = build_cfg(False)
    pipe_o, win_o = run_pipe(cfg_old)
    an = jnp.asarray(pipe_o.acc_norm, jnp.float32)
    timed(cfg_old, pipe_o.ls, win_o, an, "A: slot path full window", [])

    cfg_new = build_cfg(True)
    pipe_n, win_n = run_pipe(cfg_new)
    ls0 = pipe_n.ls
    full = timed(cfg_new, ls0, win_n, an, "B: mom_dense full window", [])

    if "--iters" in sys.argv:
        # per-iteration cost probe: same program with max_iteration 2 —
        # the window-time delta / (iteration-count delta) prices ONE
        # solve pass (kernel + glue), deciding whether a mega-kernel
        # (all iterations in one pallas_call) is worth building
        cfg2 = build_cfg(True)
        cfg2.ikdtree.max_iteration = 2
        pipe2, win2 = run_pipe(cfg2)
        timed(cfg2, pipe2.ls, win2, an, "B max_iteration=2", [])
        cfg1 = build_cfg(True)
        cfg1.ikdtree.max_iteration = 1
        pipe1, win1 = run_pipe(cfg1)
        timed(cfg1, pipe1.ls, win1, an, "B max_iteration=1", [])
        return

    if "--quick" in sys.argv:  # A/B only — fast iteration on patches
        return

    # ---- stage ablations on the mom_dense program ------------------------
    def no_dmom_insert(dmom, dshape, vs, pts, valid, mom_cap, mom_budget,
                       **kw):
        return dmom, jnp.zeros((), jnp.int32)

    timed(cfg_new, ls0, win_n, an, "insert_dense -> no-op",
          [(voxel_hash, "insert_dense_moments", no_dmom_insert)])

    def no_update(x, P, fn, aux0, **k):
        return x, P, aux0, {"n_eff": jnp.zeros(())}

    timed(cfg_new, ls0, win_n, an, "update+assoc -> no-op",
          [(esikf, "update_iterated", no_update)])

    def assoc_only(x, P, fn, aux0, **k):
        m = fn(x, jnp.array(True), aux0)
        drain = jnp.sum(m.h)
        if m.gram is not None:
            drain = drain + jnp.sum(m.gram)
        drain = drain + jnp.sum(m.aux.normal) + jnp.sum(m.aux.d)
        return x, P + 0.0 * drain, m.aux, {"n_eff": jnp.zeros(())}

    timed(cfg_new, ls0, win_n, an, "update solve -> no-op",
          [(esikf, "update_iterated", assoc_only)])

    def cheap_ds(p, v, leaf, out_size, packed_key=False):
        return p[:out_size], v[:out_size]

    timed(cfg_new, ls0, win_n, an, "downsample -> slice",
          [(ds_mod, "voxel_downsample", cheap_ds),
           (lio_mod, "voxel_downsample", cheap_ds)])

    def no_undistort(x_end, poses, pts, pt_t):
        return pts

    timed(cfg_new, ls0, win_n, an, "undistort -> no-op",
          [(imu, "undistort", no_undistort)])

    def no_propagate(x, P, batch, Q, acc_norm, last_end, scan_end,
                     last_acc_w, last_gyr_b):
        M = batch.t.shape[0]
        poses = imu.ImuPoses(
            t=jnp.where(jnp.arange(M + 1) == 0, 0.0, jnp.inf),
            pos=jnp.tile(x.pos[None], (M + 1, 1)),
            vel=jnp.tile(x.vel[None], (M + 1, 1)),
            rot=jnp.tile(x.rot[None], (M + 1, 1)),
            acc_w=jnp.tile(last_acc_w[None], (M + 1, 1)),
            gyr_b=jnp.tile(last_gyr_b[None], (M + 1, 1)),
        )
        return x, P, poses

    timed(cfg_new, ls0, win_n, an, "imu propagate -> no-op",
          [(imu, "propagate", no_propagate)])
    print(f"(mom_dense full = {full:.2f} ms/window)", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(run_watchdog(__file__, child_deadline_s=1500))
