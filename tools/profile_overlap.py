"""Does host->device input transfer overlap window compute?

(a) pure-compute rate: window inputs pre-staged on device, W-step chained;
(b) transfer+compute interleaved like the real pipeline (fresh host
    buffers transferred between dispatches).
Gap (b)-(a) = un-overlapped transfer cost per window.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline import lio as lio_mod


@jax.jit
def _drain(leaf):
    return jnp.sum(jnp.ravel(leaf)[:16]).astype(jnp.float32)


def fetch(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")][0]
    return float(np.asarray(_drain(leaf)))


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
        max_iteration=4, filter_size_map_min=0.5, single_association=True,
        plane_cache=True, plane_cache_warmup=0)

    W = 8
    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    ls = pipe.ls

    # build W quantized scan rows on the host
    g = groups[-1]
    P_, T_, V_ = pipe._pad_points(g["pts"], g["pt_t"])
    A_, G_, Tt_, Mk_ = pipe._pad_imu(g["imu_acc"], g["imu_gyr"], g["imu_t"])
    bulk_row, meta_row = pipe._pack_quant(P_, T_, V_, A_, G_, Tt_, Mk_,
                                          0.0, g["scan_end_t"])
    bulk_np = np.stack([bulk_row] * W)
    meta_np = np.stack([meta_row] * W)

    wstep = lio_mod.make_window_step_fn(cfg, W, quantized=True)
    an = jnp.asarray(pipe.acc_norm, jnp.float32)

    # (a) pure compute: staged inputs
    qwin = lio_mod.QuantWindowInputs(bulk=jnp.asarray(bulk_np),
                                     meta=jnp.asarray(meta_np))
    ls1, infos = wstep(jax.tree_util.tree_map(jnp.copy, ls), qwin, an)
    fetch(infos)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        ls1, infos = wstep(ls1, qwin, an)
    fetch(infos)
    dt_a = (time.perf_counter() - t0) / reps
    print(f"(a) staged inputs    : {dt_a*1e3:7.1f} ms/window = "
          f"{dt_a/W*1e3:5.1f} ms/scan")

    # (b) fresh transfer per window (pipeline-like; 3 distinct host
    # buffers so no caching)
    bulks = [bulk_np.copy() for _ in range(3)]
    metas = [meta_np.copy() for _ in range(3)]
    ls2, infos = wstep(jax.tree_util.tree_map(jnp.copy, ls),
                       lio_mod.QuantWindowInputs(jnp.asarray(bulks[0]),
                                                 jnp.asarray(metas[0])), an)
    fetch(infos)
    t0 = time.perf_counter()
    for i in range(reps):
        qw = lio_mod.QuantWindowInputs(jnp.asarray(bulks[i % 3]),
                                       jnp.asarray(metas[i % 3]))
        ls2, infos = wstep(ls2, qw, an)
    fetch(infos)
    dt_b = (time.perf_counter() - t0) / reps
    print(f"(b) fresh transfers  : {dt_b*1e3:7.1f} ms/window = "
          f"{dt_b/W*1e3:5.1f} ms/scan")
    print(f"un-overlapped transfer: {(dt_b-dt_a)*1e3:6.1f} ms/window")


if __name__ == "__main__":
    main()
