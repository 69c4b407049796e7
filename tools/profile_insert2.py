"""Insert sub-stage timings (stream-drain method): lexsort, claim loop,
bucket scatter, moment scatter, dense refresh."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu import config as cfgmod
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash as vh
from better_fastlio2_tpu.pipeline import lio as lio_mod


@jax.jit
def _drain(leaf):
    return jnp.sum(jnp.ravel(leaf)[:16]).astype(jnp.float32)


def fetch(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")][0]
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
        knn_chunk=1 << 14, map_dense_log2=(9, 9, 7), knn_max_live=12,
    )
    cfg.mapping = cfgmod.MappingConfig(
        det_range=60.0, cube_len=400.0, surf_leaf_size=0.5,
        extrinsic_est_en=False,
    )
    cfg.ikdtree = cfgmod.IkdtreeConfig(
        max_iteration=4, filter_size_map_min=0.5, single_association=True,
        plane_cache=True, plane_cache_warmup=6)
    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=30_000,
        seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
    pipe = lio_mod.LIOPipeline(cfg, pipelined=False)
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    ls = pipe.ls
    m = ls.map
    C = m.capacity
    hmask = C - 1

    rng = np.random.default_rng(0)
    pos = np.asarray(ls.x.pos)
    pw = jnp.asarray(
        (pos[None] + rng.uniform(-25, 25, (1 << 14, 3))).astype(np.float32))
    valid = jnp.ones(pw.shape[0], bool)

    # full insert
    @partial(jax.jit, donate_argnums=(0,))
    def s_ins(mm, p, v):
        return vh.insert(mm, p, v, max_probe=6)

    def run_ins(mm):
        return s_ins(mm, pw, valid)

    m0 = jax.tree_util.tree_map(jnp.copy, m)
    print(f"insert full        : {bench_chain(run_ins, m0):7.2f} ms")

    # lexsort alone
    @jax.jit
    def s_sort(p, v):
        ijk = vh._voxel_of(p, m.voxel_size)
        ijk = jnp.where(v[:, None], ijk, jnp.full_like(ijk, 2**31 - 1))
        h0 = jnp.where(v, vh._hash(ijk, hmask), 2**31 - 1)
        order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], h0))
        return p[order]

    def run_sort(p):
        return s_sort(p, valid)

    print(f"lexsort 4-key      : {bench_chain(run_sort, pw):7.2f} ms")

    @jax.jit
    def s_sort2(p, v):
        ijk = vh._voxel_of(p, m.voxel_size)
        ijk = jnp.where(v[:, None], ijk, jnp.full_like(ijk, 2**31 - 1))
        h0 = jnp.where(v, vh._hash(ijk, hmask), 2**31 - 1)
        pk = vh._pack(ijk)
        order = jnp.lexsort((pk, h0))
        return p[order]

    def run_sort2(p):
        return s_sort2(p, valid)

    print(f"lexsort 2-key      : {bench_chain(run_sort2, pw):7.2f} ms")

    # single scatter rounds
    rows = jnp.asarray(rng.integers(0, C, 1 << 14).astype(np.int32))

    @jax.jit
    def s_scatter_min(k, r):
        claim = jnp.full(C, 2**31 - 1, jnp.int32)
        claim = claim.at[r].min(jnp.arange(1 << 14, dtype=jnp.int32))
        return jnp.where(claim == 2**31 - 1, k, claim)

    def run_smin(k):
        return s_scatter_min(k, rows)

    print(f"scatter-min round  : {bench_chain(run_smin, jnp.copy(m.key)):7.2f} ms")

    # moment scatter-add
    momrows = jnp.asarray(rng.normal(size=(1 << 14, 10)).astype(np.float32))

    @partial(jax.jit, donate_argnums=(0,))
    def s_mom(mo, r, x):
        return mo.at[r].add(x)

    def run_mom(mo):
        return s_mom(mo, rows, momrows)

    print(f"moment scatter-add : {bench_chain(run_mom, jnp.copy(m.mom)):7.2f} ms")

    # bucket 2-D scatter
    cols = jnp.asarray(rng.integers(0, 4, 1 << 14).astype(np.int32))
    p3 = jnp.asarray(rng.normal(size=(1 << 14, 3)).astype(np.float32))

    @partial(jax.jit, donate_argnums=(0,))
    def s_bkt(pp, r, c, x):
        return pp.at[r, c].set(x)

    def run_bkt(pp):
        return s_bkt(pp, rows, cols, p3)

    print(f"bucket 2-D scatter : {bench_chain(run_bkt, jnp.copy(m.points)):7.2f} ms")

    # dense row scatter
    @partial(jax.jit, donate_argnums=(0,))
    def s_dense(dd, r, x):
        Gx, Gy, Gz, _ = dd.shape
        ijk = vh._voxel_of(x, m.voxel_size)
        row = jnp.stack([vh._pack(ijk), r], -1)
        return dd.at[ijk[:, 0] & (Gx - 1), ijk[:, 1] & (Gy - 1),
                     ijk[:, 2] & (Gz - 1)].set(row)

    def run_dense(dd):
        return s_dense(dd, rows, pw)

    print(f"dense row scatter  : {bench_chain(run_dense, jnp.copy(m.dense)):7.2f} ms")


if __name__ == "__main__":
    main()
