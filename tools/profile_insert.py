"""Stage-level timing of voxel_hash.insert on the TPU."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.map import voxel_hash as vh


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    m = vh.make_map(capacity_log2=20, bucket=4, voxel_size=0.4)
    # build a surface-like map: ring road of points
    th = rng.uniform(0, 2 * np.pi, 400_000)
    r = rng.uniform(20, 60, len(th))
    ptsm = np.stack([r * np.cos(th), r * np.sin(th),
                     rng.uniform(-2, 3, len(th))], -1).astype(np.float32)
    m = vh.insert(m, jnp.asarray(ptsm), jnp.ones(len(ptsm), bool), max_probe=6)
    m = jax.block_until_ready(m)
    print("voxels:", int(vh.num_voxels(m)))

    n = 1 << 15
    pts = ptsm[rng.choice(len(ptsm), n, replace=False)] + rng.normal(
        0, 0.05, (n, 3)).astype(np.float32)
    pts = jnp.asarray(pts)
    valid = jnp.ones(n, bool)

    ins = jax.jit(partial(vh.insert, max_probe=6))
    print(f"insert full:    {timeit(ins, m, pts, valid):7.2f} ms")

    # stage: voxelize+lexsort+group
    C = m.capacity
    hmask = C - 1

    @jax.jit
    def sort_stage(pp, vv):
        ijk = vh._voxel_of(pp, m.voxel_size)
        ijk = jnp.where(vv[:, None], ijk, jnp.full_like(ijk, vh._INT_MAX))
        h0 = jnp.where(vv, vh._hash(ijk, hmask), vh._INT_MAX)
        order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], h0))
        ijk_s = ijk[order]
        pts_s = pp[order]
        first = jnp.concatenate(
            [jnp.array([True]), jnp.any(ijk_s[1:] != ijk_s[:-1], axis=-1)])
        idx = jnp.arange(n, dtype=jnp.int32)
        group_head = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, idx, 0))
        return ijk_s, pts_s, group_head

    print(f"sort+group:     {timeit(sort_stage, pts, valid):7.2f} ms")

    # stage: claim loop only (on presorted data)
    ijk_s, pts_s, group_head = jax.block_until_ready(sort_stage(pts, valid))
    idx = jnp.arange(n, dtype=jnp.int32)
    first = idx == group_head

    @jax.jit
    def claim_stage(key_arr, state_arr, coords_arr):
        h_s = vh._hash(ijk_s, hmask)
        key_target = vh._pack(ijk_s)
        is_head = first

        def claim_round(st):
            slot, probe, key_arr, state_arr, coords_arr, unresolved = st[:6]
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
            wslot = jnp.where(won, cand, C)
            key_arr = key_arr.at[wslot].set(key_target, mode="drop")
            state_arr = state_arr.at[wslot].set(vh.LIVE, mode="drop")
            coords_arr = coords_arr.at[wslot].set(ijk_s, mode="drop")
            slot = jnp.where(won, cand, slot)
            unresolved = unresolved & ~won
            probe = jnp.where(unresolved, probe + 1, probe)
            unresolved = unresolved & (probe < 6)
            return (slot, probe, key_arr, state_arr, coords_arr, unresolved,
                    jnp.any(unresolved))

        st = (jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.int32),
              key_arr, state_arr, coords_arr, is_head, jnp.any(is_head))
        st = jax.lax.while_loop(lambda s: s[-1], claim_round, st)
        return st[0], st[2], st[3], st[4]

    print(f"claim loop:     {timeit(claim_stage, m.key, m.state, m.coords):7.2f} ms")

    head_slot = jax.block_until_ready(
        claim_stage(m.key, m.state, m.coords))[0]

    # stage: bucket append scatter
    B = m.bucket
    rank = idx - group_head

    @jax.jit
    def append_stage(points, count):
        slot_all = head_slot[group_head]
        base = count[jnp.maximum(slot_all, 0)]
        dest = base + rank
        ok = (slot_all >= 0) & (dest < B)
        flat_idx = jnp.where(ok, slot_all * B + dest, C * B)
        pts_new = (points.reshape(C * B, 3).at[flat_idx]
                   .set(pts_s, mode="drop")).reshape(C, B, 3)
        add = jnp.zeros(C, jnp.int32).at[jnp.where(ok, slot_all, 0)].add(
            ok.astype(jnp.int32))
        return pts_new, jnp.minimum(count + add, B)

    print(f"append scatter: {timeit(append_stage, m.points, m.count):7.2f} ms")


if __name__ == "__main__" and __import__("sys").argv[-1] != "variants":
    main()


def variants():
    import jax, jax.numpy as jnp, numpy as np, time
    rng = np.random.default_rng(0)
    C, B = 1 << 20, 4
    n = 1 << 15
    pts_flat = jnp.zeros((C * B, 3), jnp.float32)
    pts_3d = jnp.zeros((C, B, 3), jnp.float32)
    slot = jnp.asarray(rng.integers(0, C, n, dtype=np.int32))
    dest = jnp.asarray(rng.integers(0, B, n, dtype=np.int32))
    vals = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))

    @jax.jit
    def scat_reshape(p3):
        flat = slot * B + dest
        return (p3.reshape(C * B, 3).at[flat].set(vals, mode="drop")
                ).reshape(C, B, 3)

    @jax.jit
    def scat_flat(pf):
        flat = slot * B + dest
        return pf.at[flat].set(vals, mode="drop")

    @jax.jit
    def scat_2d(p3):
        return p3.at[slot, dest].set(vals, mode="drop")

    @jax.jit
    def scat_flat_donate(pf):
        flat = slot * B + dest
        return pf.at[flat].set(vals, mode="drop")
    scat_flat_donate = jax.jit(
        lambda pf: pf.at[slot * B + dest].set(vals, mode="drop"),
        donate_argnums=(0,))

    print(f"scatter reshape: {timeit(scat_reshape, pts_3d):7.2f} ms")
    print(f"scatter flat:    {timeit(scat_flat, pts_flat):7.2f} ms")
    print(f"scatter 2d:      {timeit(scat_2d, pts_3d):7.2f} ms")

    # C-sized ops cost
    @jax.jit
    def fullmin():
        claim = jnp.full(C, 2**31 - 1, jnp.int32)
        return claim.at[slot].min(jnp.arange(n, dtype=jnp.int32))
    print(f"full+scattermin: {timeit(fullmin):7.2f} ms")

    key = jnp.zeros(C, jnp.int32)
    @jax.jit
    def key_update(k):
        return k.at[slot].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    print(f"key scatter:     {timeit(key_update, key):7.2f} ms")

    coords = jnp.zeros((C, 3), jnp.int32)
    @jax.jit
    def coords_update(c):
        return c.at[slot].set(jnp.stack([slot, slot, slot], -1), mode="drop")
    print(f"coords scatter:  {timeit(coords_update, coords):7.2f} ms")


if __name__ == "__main__" and __import__("sys").argv[-1] == "variants":
    variants()
