"""In-window ablation profile: time the PRODUCTION W=8 window program
with individual stages replaced by no-ops, all inside the same jitted
program.  The difference vs the full window is that stage's TRUE
in-window cost (standalone stage timings carry launch overhead and miss
XLA overlap).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.core import esikf, imu, measurement
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.ops import downsample as ds_mod
from better_fastlio2_tpu.pipeline import lio as lio_mod


def build_cfg():
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
    return cfg


def main():
    cfg = build_cfg()
    W = 8
    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    ls0 = pipe.ls
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
    an = jnp.asarray(pipe.acc_norm, jnp.float32)

    def copy_ls(ls):
        return jax.tree_util.tree_map(jnp.copy, ls)

    def timed(tag, patches):
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            wstep = lio_mod.make_window_step_fn(cfg, W, plane_cache=True,
                                                quantized=True, unroll=W)
            s = copy_ls(ls0)
            s, infos = wstep(s, win, an)
            np.asarray(infos[0])
            t0 = time.perf_counter()
            reps = 8
            for _ in range(reps):
                s, infos = wstep(s, win, an)
            np.asarray(infos[0])
            ms = 1e3 * (time.perf_counter() - t0) / reps
            print(f"{tag:28s}: {ms:7.2f} ms/window = {ms / W:5.2f} ms/scan")
            return ms
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

    full = timed("full window", [])

    # no insert
    orig_insert = voxel_hash.insert

    def no_insert(m, *a, **k):
        return m

    timed("insert -> no-op", [(voxel_hash, "insert", no_insert)])

    # no update (keep association out too)
    orig_upd = esikf.update_iterated

    def no_update(x, P, fn, aux0, **k):
        return x, P, aux0, {}

    timed("update+assoc -> no-op", [(esikf, "update_iterated", no_update)])

    # association still runs, solve iterations skipped: run fn once.
    # Drain EVERY output (h and gram) — draining h alone lets XLA
    # dead-code-eliminate the fused path's association entirely (its h
    # is the empty array; the results live in m.gram/aux)
    def assoc_only(x, P, fn, aux0, **k):
        m = fn(x, jnp.array(True), aux0)
        drain = jnp.sum(m.h)
        if m.gram is not None:
            drain = drain + jnp.sum(m.gram)
        drain = drain + jnp.sum(m.aux.normal) + jnp.sum(m.aux.d)
        return x, P + 0.0 * drain, m.aux, {}

    timed("update solve -> no-op", [(esikf, "update_iterated", assoc_only)])

    # no crop
    def no_crop(m, lo, hi, enabled=None, skip_points=False):
        return m

    timed("crop -> no-op", [(voxel_hash, "crop_outside_box", no_crop)])

    # no downsample: stride-slice instead
    orig_ds = ds_mod.voxel_downsample

    def cheap_ds(p, v, leaf, out_size, packed_key=False):
        return p[:out_size], v[:out_size]

    timed("downsample -> slice", [(ds_mod, "voxel_downsample", cheap_ds),
                                  (lio_mod, "voxel_downsample", cheap_ds)])

    # no undistort (imu propagate kept)
    def no_undistort(x_end, poses, pts, pt_t):
        return pts

    timed("undistort -> no-op", [(imu, "undistort", no_undistort)])

    # no imu propagate: identity state, trivial poses
    orig_prop = imu.propagate

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

    timed("imu propagate -> no-op", [(imu, "propagate", no_propagate)])

    print(f"(full = {full:.2f} ms/window)")

    # W=16 full window for per-window overhead amortisation
    W2 = 16
    win2 = lio_mod.QuantWindowInputs(
        bulk=jnp.concatenate([win.bulk, win.bulk], axis=0),
        meta=jnp.concatenate([win.meta, win.meta], axis=0),
    )
    wstep2 = lio_mod.make_window_step_fn(cfg, W2, plane_cache=True,
                                         quantized=True, unroll=8)
    s = copy_ls(ls0)
    s, infos = wstep2(s, win2, an)
    np.asarray(infos[0])
    t0 = time.perf_counter()
    for _ in range(6):
        s, infos = wstep2(s, win2, an)
    np.asarray(infos[0])
    ms = 1e3 * (time.perf_counter() - t0) / 6
    print(f"{'full window W=16 (unroll 8)':28s}: {ms:7.2f} ms/window = "
          f"{ms / W2:5.2f} ms/scan")


if __name__ == "__main__":
    main()
