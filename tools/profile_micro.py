"""Micro-benchmarks: per-program dispatch overhead and kNN sub-stages.

The stage profile (tools/profile_stages.py) shows a ~20-25 ms floor on
every individually-jitted stage regardless of its size; this tool
separates the fixed dispatch/round-trip cost of the remote-TPU path from
real device compute, and breaks the kNN program into its sub-ops.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.pipeline import lio as lio_mod


def bench(fn, *args, reps=20, **kw):
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
    # --- fixed overhead -----------------------------------------------------
    x = jnp.zeros(8, jnp.float32)

    @jax.jit
    def null_small(v):
        return v + 1.0

    print(f"null (8,)            : {bench(null_small, x):7.2f} ms")

    big = jnp.zeros((1 << 14, 128), jnp.float32)

    @jax.jit
    def null_big(v):
        return v + 1.0

    print(f"null (16k,128)       : {bench(null_big, big):7.2f} ms")

    # chained dispatches: does the overhead amortize across enqueued calls?
    @jax.jit
    def chain(v):
        return v * 1.0001 + 1.0

    def chained(v, n):
        for _ in range(n):
            v = chain(v)
        return v

    t8 = bench(chained, big, 8)
    print(f"8 chained dispatches : {t8:7.2f} ms  ({t8 / 8:5.2f} ms each)")

    # --- build a realistic map ---------------------------------------------
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
    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    m = pipe.ls.map
    rng = np.random.default_rng(0)
    pos = np.asarray(pipe.ls.x.pos)
    q = jnp.asarray(
        pos[None, :] + rng.uniform(-30, 30, size=(1 << 14, 3)).astype(np.float32)
    )
    print(f"map voxels: {int(voxel_hash.num_voxels(m))}")

    offs = voxel_hash._neighbor_offsets(27)

    # --- kNN sub-stages -----------------------------------------------------
    @jax.jit
    def s_lookup(m, q):
        ijk = voxel_hash._voxel_of(q, m.voxel_size)
        nb = ijk[:, None, :] + offs[None, :, :]
        return voxel_hash._dense_lookup(m.dense, nb)

    slots = s_lookup(m, q)
    print(f"dense lookup         : {bench(s_lookup, m, q):7.2f} ms")

    @jax.jit
    def s_aabb_topk(m, q, slots):
        ijk = voxel_hash._voxel_of(q, m.voxel_size)
        nb = ijk[:, None, :] + offs[None, :, :]
        vs = m.voxel_size
        lo = nb.astype(jnp.float32) * vs
        dq = jnp.maximum(lo - q[:, None, :], q[:, None, :] - (lo + vs))
        lb = jnp.sum(jnp.maximum(dq, 0.0) ** 2, axis=-1)
        score = jnp.where(slots >= 0, -lb, -1e17)
        _, lane = jax.lax.top_k(score, 12)
        return jnp.take_along_axis(slots, lane, axis=1)

    slots12 = s_aabb_topk(m, q, slots)
    print(f"aabb top_k 27->12    : {bench(s_aabb_topk, m, q, slots):7.2f} ms")

    @partial(jax.jit, static_argnames=("L",))
    def s_gather(m, slots, L):
        safe = jnp.maximum(slots[:, :L], 0)
        return m.points[safe]

    cand12 = s_gather(m, slots12, L=12)
    cand27 = s_gather(m, slots, L=27)
    print(f"points gather L=12   : {bench(s_gather, m, slots12, L=12):7.2f} ms")
    print(f"points gather L=27   : {bench(s_gather, m, slots, L=27):7.2f} ms")

    @jax.jit
    def s_topk5(q, cand, slots):
        d2 = jnp.sum((cand - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(slots[:, :cand.shape[1], None] >= 0, d2, 1e17)
        c, L, B = d2.shape
        neg, idx = jax.lax.top_k(-d2.reshape(c, L * B), 5)
        return -neg, idx

    print(f"d2 + top_k 48->5     : {bench(s_topk5, q, cand12, slots12):7.2f} ms")
    print(f"d2 + top_k 108->5    : {bench(s_topk5, q, cand27, slots):7.2f} ms")

    @jax.jit
    def s_argmin5(q, cand, slots):
        d2 = jnp.sum((cand - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(slots[:, :cand.shape[1], None] >= 0, d2, 1e17)
        c, L, B = d2.shape
        d2 = d2.reshape(c, L * B)
        outs_d, outs_i = [], []
        for _ in range(5):
            i = jnp.argmin(d2, axis=1)
            d = jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]
            outs_d.append(d)
            outs_i.append(i)
            d2 = d2.at[jnp.arange(c), i].set(1e17)
        return jnp.stack(outs_d, -1), jnp.stack(outs_i, -1)

    print(f"d2 + argmin x5 (48)  : {bench(s_argmin5, q, cand12, slots12):7.2f} ms")

    # full knn for reference
    @partial(jax.jit, static_argnames=("ml",))
    def s_knn(m, q, ml):
        return voxel_hash.knn(m, q, k=5, max_probe=6, n_neighbors=27,
                              max_live=ml)

    print(f"full knn L=12        : {bench(s_knn, m, q, ml=12):7.2f} ms")
    print(f"full knn L=27        : {bench(s_knn, m, q, ml=0):7.2f} ms")


if __name__ == "__main__":
    main()
