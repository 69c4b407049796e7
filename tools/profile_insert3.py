"""Insert ablation INSIDE one device program (lax.fori_loop over the real
insert body) — the stream-drain method in profile_insert2 pays the ~1.5 ms
remote-transport launch per call, and separate-scatter costs are NOT
additive inside a program (XLA overlaps them), so per-stage numbers there
mislead.  This tool times insert variants with stages knocked out.
"""

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

REPS = 30


def insert_ablated(
    m, pts_world, valid, max_probe=6,
    do_claim=True, do_points=True, do_count=True, do_mom=True,
    do_dense=True,
):
    """vh.insert pre_grouped path with stages optionally knocked out."""
    C, B = m.capacity, m.bucket
    hmask = C - 1
    n = pts_world.shape[0]
    ijk = vh._voxel_of(pts_world, m.voxel_size)
    ijk = jnp.where(valid[:, None], ijk, jnp.full_like(ijk, vh._INT_MAX))
    idx = jnp.arange(n, dtype=jnp.int32)

    ijk_s, pts_s, valid_s = ijk, pts_world, valid
    is_head = valid
    group_head = idx
    rank = jnp.zeros(n, jnp.int32)

    h_s = vh._hash(ijk_s, hmask)
    key_target = vh._pack(ijk_s)

    dslot = vh._dense_lookup(m.dense, ijk_s)
    live_ok = m.key[jnp.maximum(dslot, 0)] == key_target
    dslot = jnp.where(live_ok, dslot, -1)
    slot0 = jnp.where(is_head, dslot, -1)
    unresolved0 = is_head & (dslot < 0)

    if do_claim:
        def claim_round(st):
            slot, probe, key_arr, unresolved = st[:4]
            cand = (h_s + probe) & hmask
            kcand = key_arr[cand]
            found = unresolved & (kcand == key_target)
            slot = jnp.where(found, cand, slot)
            unresolved = unresolved & ~found
            tryc = unresolved & (kcand == vh._KEY_EMPTY)
            claim = jnp.full(C, vh._INT_MAX, jnp.int32)
            claim = claim.at[jnp.where(tryc, cand, 0)].min(
                jnp.where(tryc, idx, vh._INT_MAX))
            won = tryc & (claim[cand] == idx)
            key_arr = key_arr.at[jnp.where(won, cand, C)].set(
                key_target, mode="drop")
            slot = jnp.where(won, cand, slot)
            unresolved = unresolved & ~won
            probe = jnp.where(unresolved, probe + 1, probe)
            unresolved = unresolved & (probe < max_probe)
            return (slot, probe, key_arr, unresolved, jnp.any(unresolved))

        st = (slot0, jnp.zeros(n, jnp.int32), m.key, unresolved0,
              jnp.any(unresolved0))
        st = jax.lax.while_loop(lambda s: s[-1], claim_round, st)
        head_slot, _, key_arr, _, _ = st
    else:
        head_slot, key_arr = slot0, m.key

    slot_all = head_slot[group_head]
    slot_all = jnp.where(valid_s, slot_all, -1)

    base = m.count[jnp.maximum(slot_all, 0)]
    dest = base + rank
    ok = (slot_all >= 0) & (dest < B) & valid_s
    if do_points:
        srow = jnp.where(ok, slot_all, C)
        points = m.points.at[srow, jnp.where(ok, dest, 0)].set(
            pts_s, mode="drop")
    else:
        points = m.points

    if do_count:
        add = jnp.zeros(C, jnp.int32).at[jnp.where(ok, slot_all, 0)].add(
            ok.astype(jnp.int32))
        count = jnp.minimum(m.count + add, B)
    else:
        count = m.count

    mom = m.mom
    if do_mom and mom is not None:
        mok = (slot_all >= 0) & valid_s
        q = pts_s - ijk_s.astype(pts_s.dtype) * m.voxel_size
        one = mok.astype(pts_s.dtype)
        rows = jnp.concatenate(
            [one[:, None], q * one[:, None],
             jnp.stack([q[:, 0] * q[:, 0], q[:, 0] * q[:, 1],
                        q[:, 0] * q[:, 2], q[:, 1] * q[:, 1],
                        q[:, 1] * q[:, 2], q[:, 2] * q[:, 2]], axis=-1)
             * one[:, None]], axis=-1)
        mom = mom.at[jnp.where(mok, slot_all, C)].add(rows, mode="drop")

    dense = m.dense
    if do_dense:
        Gx, Gy, Gz, _ = dense.shape
        upd = is_head & (head_slot >= 0)
        ix = jnp.where(upd, ijk_s[:, 0] & (Gx - 1), Gx)
        row = jnp.stack([key_target, head_slot], axis=-1)
        dense = dense.at[ix, ijk_s[:, 1] & (Gy - 1),
                         ijk_s[:, 2] & (Gz - 1)].set(row, mode="drop")

    return vh.VoxelHashMap(key_arr, count, points, mom, dense, m.voxel_size)


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
    m = pipe.ls.map
    pos = np.asarray(pipe.ls.x.pos)

    rng = np.random.default_rng(0)
    pw = jnp.asarray(
        (pos[None] + rng.uniform(-25, 25, (1 << 14, 3))).astype(np.float32))
    valid = jnp.ones(pw.shape[0], bool)

    def timeit(label, **flags):
        @partial(jax.jit, donate_argnums=(0,))
        def prog(mm):
            def body(i, mm):
                return insert_ablated(
                    mm, pw + 1e-4 * i, valid, **flags)
            return jax.lax.fori_loop(0, REPS, body, mm)

        mm = jax.tree_util.tree_map(jnp.copy, m)
        mm = prog(mm)
        jax.block_until_ready(mm)
        t0 = time.perf_counter()
        mm = prog(mm)
        jax.block_until_ready(mm)
        dt = 1e3 * (time.perf_counter() - t0) / REPS
        print(f"{label:28s}: {dt:7.3f} ms")
        return dt

    def timeit_real(label, **kw):
        @partial(jax.jit, donate_argnums=(0,))
        def prog(mm):
            def body(i, mm):
                return vh.insert(mm, pw + 1e-4 * i, valid, max_probe=6,
                                 pre_grouped=True, **kw)
            return jax.lax.fori_loop(0, REPS, body, mm)

        mm = jax.tree_util.tree_map(jnp.copy, m)
        mm = prog(mm)
        jax.block_until_ready(mm)
        t0 = time.perf_counter()
        mm = prog(mm)
        jax.block_until_ready(mm)
        dt = 1e3 * (time.perf_counter() - t0) / REPS
        print(f"{label:28s}: {dt:7.3f} ms")
        return dt

    timeit_real("REAL insert (no budgets)")
    timeit_real("REAL dense_budget=2048", dense_budget=2048)
    timeit_real("REAL claim_budget=2048", claim_budget=2048)
    timeit_real("REAL both budgets=2048", dense_budget=2048,
                claim_budget=2048)

    timeit("full")
    timeit("no claim loop", do_claim=False)
    timeit("no points scatter", do_points=False)
    timeit("no count add", do_count=False)
    timeit("no mom add", do_mom=False)
    timeit("no dense refresh", do_dense=False)
    timeit("claim only", do_points=False, do_count=False, do_mom=False,
           do_dense=False)
    timeit("nothing", do_claim=False, do_points=False, do_count=False,
           do_mom=False, do_dense=False)


if __name__ == "__main__":
    main()
