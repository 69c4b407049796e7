"""Per-stage TPU timing of the LIO scan tick — find the throughput floor.

Times, in isolation on the real device:
  - imu.propagate + undistort
  - voxel_downsample
  - knn slot lookup (probe) vs points gather vs top_k
  - plane_fit + one esikf iteration's linear algebra
  - voxel_hash.insert

Run: python tools/profile_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.config import (
    IkdtreeConfig,
    LIOConfig,
    MappingConfig,
    ShapesConfig,
)
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.pipeline.lio import LIOPipeline


def timeit(fn, *args, n=20, **kw):
    """Device time per call: queue n async calls, block once at the end.

    The remote-TPU transport adds 10s of ms per host-synchronized call;
    async dispatch overlaps it away, like the pipelined LIO driver does.
    """
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=1 << 16, n_ds=1 << 15, n_imu=32,
        map_capacity_log2=20, map_bucket=4, map_max_probe=6,
        knn_chunk=32768,
    )
    cfg.mapping = MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.4,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4)

    groups = make_lio_sequence(
        duration=2.0, scan_rate=10.0, imu_rate=100.0, n_points=60_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0),
    )
    pipe = LIOPipeline(cfg)
    for g in groups:
        pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
    ls = pipe.ls
    m = ls.map
    print("map voxels:", int(voxel_hash.num_voxels(m)))

    # realistic query set: last scan's world points
    g = groups[-1]
    n_ds = cfg.shapes.n_ds
    rng = np.random.default_rng(0)
    pts = g["pts"][rng.choice(len(g["pts"]), n_ds, replace=False)]
    from better_fastlio2_tpu.core.measurement import transform_to_world
    q = transform_to_world(ls.x, jnp.asarray(pts, jnp.float32))
    q = jax.block_until_ready(q)
    valid = jnp.ones(n_ds, bool)

    # ---- full kNN ----
    knn_j = jax.jit(lambda mm, qq: voxel_hash.knn(
        mm, qq, k=5, max_probe=6, n_neighbors=27))
    print(f"knn27 full:      {timeit(knn_j, m, q):8.2f} ms")
    knn7 = jax.jit(lambda mm, qq: voxel_hash.knn(
        mm, qq, k=5, max_probe=6, n_neighbors=7))
    print(f"knn7 full:       {timeit(knn7, m, q):8.2f} ms")
    knn27_l12 = jax.jit(lambda mm, qq: voxel_hash.knn(
        mm, qq, k=5, max_probe=6, n_neighbors=27, max_live=12))
    print(f"knn27 L=12:      {timeit(knn27_l12, m, q):8.2f} ms")
    knn19_l12 = jax.jit(lambda mm, qq: voxel_hash.knn(
        mm, qq, k=5, max_probe=6, n_neighbors=19, max_live=12))
    print(f"knn19 L=12:      {timeit(knn19_l12, m, q):8.2f} ms")
    # agreement check: fraction of queries whose 5-NN sets match exactly
    _, d_full, ok_full = jax.block_until_ready(knn_j(m, q))
    _, d_l12, ok_l12 = jax.block_until_ready(knn27_l12(m, q))
    same = np.isclose(np.sort(np.asarray(d_full), 1),
                      np.sort(np.asarray(d_l12), 1), atol=1e-6).all(1)
    print("  L=12 exact-match frac:", float(same.mean()))

    # ---- stage: slot lookup only ----
    offs = voxel_hash._neighbor_offsets(27)

    @jax.jit
    def lookup_only(mm, qq):
        ijk = voxel_hash._voxel_of(qq, mm.voxel_size)
        nb = ijk[:, None, :] + offs[None, :, :]
        return voxel_hash._lookup_slots(mm.key, nb.reshape(-1, 3), 6)

    slots = jax.block_until_ready(lookup_only(m, q))
    print(f"slot lookup:     {timeit(lookup_only, m, q):8.2f} ms")
    print("  resolved frac:", float(jnp.mean((slots >= 0).astype(jnp.float32))))

    # ---- stage: points gather only ----
    safe = jax.block_until_ready(jnp.maximum(slots.reshape(n_ds, 27), 0))

    @jax.jit
    def gather_only(mm, ss):
        return mm.points[ss]

    print(f"points gather:   {timeit(gather_only, m, safe):8.2f} ms")

    # ---- stage: distance + topk on pregathered ----
    cand = jax.block_until_ready(gather_only(m, safe))

    @jax.jit
    def topk_only(cand, qq):
        d2 = jnp.sum((cand - qq[:, None, None, :]) ** 2, axis=-1)
        c = qq.shape[0]
        neg, ti = jax.lax.top_k(-d2.reshape(c, -1), 5)
        pts = jnp.take_along_axis(
            cand.reshape(c, -1, 3), ti[..., None], axis=1)
        return pts, -neg

    print(f"dist+topk:       {timeit(topk_only, cand, q):8.2f} ms")

    # ---- gather experiments: fewer rows, bigger rows ----
    C = m.capacity
    for nb_rows, blk in [(n_ds * 27, 4), (n_ds * 8, 16), (n_ds * 8, 4),
                         (n_ds * 27, 1)]:
        tbl = jnp.zeros((C, blk, 3), jnp.float32)
        idx = jnp.asarray(
            rng.integers(0, C, nb_rows, dtype=np.int32))

        @jax.jit
        def g(t, i):
            return t[i]

        ms = timeit(g, tbl, idx)
        mb = nb_rows * blk * 12 / 1e6
        print(f"gather rows={nb_rows:8d} blk={blk:2d} ({mb:6.1f} MB): "
              f"{ms:8.2f} ms  ({mb/ms*1000/1e3:6.1f} GB/s)")

    # ---- insert ----
    ins = jax.jit(lambda mm, pp, vv: voxel_hash.insert(mm, pp, vv, max_probe=6))
    print(f"insert:          {timeit(ins, m, q, valid):8.2f} ms")

    # ---- imu + undistort ----
    from better_fastlio2_tpu.core import imu as imu_mod
    sh = cfg.shapes
    A = np.zeros((sh.n_imu, 3), np.float32)
    G = np.zeros((sh.n_imu, 3), np.float32)
    Tt = np.full(sh.n_imu, np.inf, np.float32)
    Mk = np.zeros(sh.n_imu, bool)
    gl = groups[-1]
    k = min(len(gl["imu_acc"]), sh.n_imu)
    A[:k], G[:k], Tt[:k], Mk[:k] = (
        gl["imu_acc"][:k], gl["imu_gyr"][:k], gl["imu_t"][:k], True)
    batch = imu_mod.ImuBatch(
        acc=jnp.asarray(A), gyr=jnp.asarray(G), t=jnp.asarray(Tt),
        mask=jnp.asarray(Mk))
    Q = imu_mod.build_Q(cfg.mapping.gyr_cov, cfg.mapping.acc_cov,
                        cfg.mapping.b_gyr_cov, cfg.mapping.b_acc_cov,
                        jnp.float32)

    @jax.jit
    def prop(x, P, b):
        return imu_mod.propagate(x, P, b, Q, jnp.float32(9.81),
                                 jnp.float32(0.0), jnp.float32(0.1),
                                 jnp.zeros(3), jnp.zeros(3))

    print(f"imu propagate:   {timeit(prop, ls.x, ls.P, batch):8.2f} ms")

    # ---- downsample ----
    from better_fastlio2_tpu.ops.downsample import voxel_downsample
    raw = jnp.asarray(
        np.pad(gl["pts"], ((0, (1 << 16) - len(gl["pts"])), (0, 0))),
        jnp.float32)
    rawv = jnp.asarray(np.arange(1 << 16) < len(gl["pts"]))
    ds = jax.jit(lambda p, v: voxel_downsample(p, v, 0.4, out_size=n_ds))
    print(f"downsample:      {timeit(ds, raw, rawv):8.2f} ms")

    # ---- full step ----
    step = pipe._step
    args = None

    t0 = time.perf_counter()
    # run three full scans through process_scan for an end-to-end number
    groups2 = make_lio_sequence(
        duration=1.0, scan_rate=10.0, imu_rate=100.0, n_points=60_000,
        seed=11, noise=0.004, traj=Trajectory(t_still=0.2, speed=3.0),
    )
    ts = []
    for g2 in groups2:
        t0 = time.perf_counter()
        pipe.process_scan(
            g2["pts"], g2["pt_t"], g2["imu_acc"], g2["imu_gyr"], g2["imu_t"],
            g2["scan_beg_abs"], g2["scan_end_t"])
        ts.append(time.perf_counter() - t0)
    print("full steps ms:", [f"{1e3*t:.1f}" for t in ts])


if __name__ == "__main__":
    main()
