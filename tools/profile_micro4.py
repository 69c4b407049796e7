"""Round-2 microbenches for the remaining hot-path costs.

1. moment scatter-add variants (the steady insert's dominant scatter):
   baseline vs unique_indices (pre_grouped guarantees distinct slots;
   invalid rows get DISTINCT out-of-bounds indices so the uniqueness
   contract holds) vs unique+sorted.
2. plane-cache association: 7-cell blend vs 4-cell (own + 3 nearest
   faces by in-cell fractional position).
3. fused_hth Pallas kernel vs the jnp rows+matmul pair.
4. crop pass, chained (no launch overhead).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 14
C = 1 << 20


def timeit(fn, *args, reps=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"{label:34s}: {ms:7.3f} ms")
    return ms


def chain(fn, state, *args, reps=30, label=""):
    s = fn(state, *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(s, *args)
    jax.block_until_ready(s)
    ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"{label:34s}: {ms:7.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    slot = jnp.asarray(rng.permutation(C)[:N].astype(np.int32))
    ok = jnp.asarray(rng.random(N) < 0.9)
    tab = jnp.zeros((C, 10), jnp.float32)
    idx_n = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def scat_base(tab, rows, slot, ok):
        dst = jnp.where(ok, slot, C)
        return tab.at[dst].add(rows, mode="drop")

    @jax.jit
    def scat_uniq(tab, rows, slot, ok):
        dst = jnp.where(ok, slot, C + idx_n)  # distinct OOB rows
        return tab.at[dst].add(rows, mode="drop", unique_indices=True)

    @jax.jit
    def scat_uniq_sorted(tab, rows, slot, ok):
        dst = jnp.where(ok, slot, C + idx_n)
        order = jnp.argsort(dst)
        return tab.at[dst[order]].add(rows[order], mode="drop",
                                      unique_indices=True,
                                      indices_are_sorted=True)

    timeit(scat_base, tab, rows, slot, ok, label="mom scatter-add base")
    timeit(scat_uniq, tab, rows, slot, ok, label="mom scatter-add unique")
    timeit(scat_uniq_sorted, tab, rows, slot, ok,
           label="mom scatter-add unique+sort")
    a = scat_base(tab, rows, slot, ok)
    b = scat_uniq(tab, rows, slot, ok)
    print("   parity base vs unique:", float(jnp.max(jnp.abs(a - b))))

    # .set variant (dense refresh / bucket appends)
    rows2 = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
    tab2 = jnp.zeros((C, 2), jnp.float32)

    @jax.jit
    def set_base(tab, rows, slot, ok):
        return tab.at[jnp.where(ok, slot, C)].set(rows, mode="drop")

    @jax.jit
    def set_uniq(tab, rows, slot, ok):
        return tab.at[jnp.where(ok, slot, C + idx_n)].set(
            rows, mode="drop", unique_indices=True)

    timeit(set_base, tab2, rows2, slot, ok, label="row set base")
    timeit(set_uniq, tab2, rows2, slot, ok, label="row set unique")

    # int32 1-D scatter (claim loop shape: 2048 lanes)
    nb = 2048
    key1 = jnp.zeros(C, jnp.int32)
    slot_b = slot[:nb]
    val_b = jnp.arange(nb, dtype=jnp.int32)
    ok_b = ok[:nb]

    @jax.jit
    def set1_base(key1, slot_b, val_b, ok_b):
        return key1.at[jnp.where(ok_b, slot_b, C)].set(val_b, mode="drop")

    @jax.jit
    def set1_uniq(key1, slot_b, val_b, ok_b):
        return key1.at[jnp.where(ok_b, slot_b,
                                 C + jnp.arange(nb, dtype=jnp.int32))].set(
            val_b, mode="drop", unique_indices=True)

    timeit(set1_base, key1, slot_b, val_b, ok_b, label="1d set 2048 base")
    timeit(set1_uniq, key1, slot_b, val_b, ok_b, label="1d set 2048 unique")

    # ---- association: 7-cell vs 4-cell blend ------------------------------
    from better_fastlio2_tpu.core import measurement
    from better_fastlio2_tpu.map import voxel_hash

    m = voxel_hash.make_map(capacity_log2=20, bucket=4, voxel_size=0.5,
                            dense_log2=(8, 8, 7), moments=True)
    pts = jnp.asarray(
        (rng.random((1 << 15, 3)) * 60 - 30).astype(np.float32))
    val = jnp.ones(1 << 15, bool)
    m = voxel_hash.insert(m, pts, val, max_probe=6)
    q = jnp.asarray((rng.random((N, 3)) * 50 - 25).astype(np.float32))
    qv = jnp.ones(N, bool)

    @jax.jit
    def assoc7(m, q, qv):
        return measurement.plane_from_moments(m, q, qv, max_probe=6)

    timeit(assoc7, m, q, qv, label="plane_from_moments 7-cell")

    # 4-cell variant: own cell + the face neighbor on the nearer side of
    # each axis (sign from the in-cell fractional position)
    @jax.jit
    def assoc4(m, q, qv):
        dtype = q.dtype
        vs = m.voxel_size
        ijk = voxel_hash._voxel_of(q, vs)
        frac = q / vs - ijk.astype(dtype)
        sgn = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)  # (N,3)
        eye = jnp.eye(3, dtype=jnp.int32)
        offs = jnp.concatenate(
            [jnp.zeros((N, 1, 3), jnp.int32),
             sgn[:, None, :] * eye[None]], axis=1)  # (N,4,3)
        nbc = ijk[:, None, :] + offs
        slots = voxel_hash._dense_lookup(m.dense, nbc)
        safe = jnp.maximum(slots, 0)
        mom = m.mom[safe]
        mom = jnp.where(slots[..., None] >= 0, mom, 0.0)
        delta = offs.astype(dtype) * vs
        n_c = mom[..., 0]
        S1 = mom[..., 1:4]
        S1r = S1 + n_c[..., None] * delta
        S2u = mom[..., 4:10]
        dS = (delta[..., :, None] * S1[..., None, :]
              + delta[..., None, :] * S1[..., :, None])
        dd = delta[..., :, None] * delta[..., None, :]
        iu_r = jnp.array([0, 0, 0, 1, 1, 2])
        iu_c = jnp.array([0, 1, 2, 1, 2, 2])
        S2r = S2u + dS[..., iu_r, iu_c] + n_c[..., None] * dd[..., iu_r, iu_c]
        sums = jnp.concatenate(
            [jnp.sum(n_c, axis=1, keepdims=True),
             jnp.sum(S1r, axis=1), jnp.sum(S2r, axis=1)], axis=-1)
        return measurement.finalize_plane_from_sums(
            sums, ijk, vs, qv)

    timeit(assoc4, m, q, qv, label="plane_from_moments 4-cell")

    # ---- fused_hth vs jnp --------------------------------------------------
    from better_fastlio2_tpu.ops.pallas_kernels import (fused_hth,
                                                        fused_hth_reference)

    pts_b = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    p_imu = pts_b + 0.1
    nrm = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    Cv = nrm * 0.9
    pd2 = jnp.asarray(rng.normal(size=N).astype(np.float32))
    selm = jnp.asarray(rng.random(N) < 0.8)

    jf = jax.jit(lambda *a: fused_hth_reference(*a))
    pf = jax.jit(lambda *a: fused_hth(*a))
    timeit(jf, pts_b, p_imu, nrm, Cv, pd2, selm, label="HTH jnp rows+matmul")
    timeit(pf, pts_b, p_imu, nrm, Cv, pd2, selm, label="HTH pallas fused")
    a1, b1 = jf(pts_b, p_imu, nrm, Cv, pd2, selm)
    a2, b2 = pf(pts_b, p_imu, nrm, Cv, pd2, selm)
    print("   parity HTH:", float(jnp.max(jnp.abs(a1 - a2))),
          float(jnp.max(jnp.abs(b1 - b2))))

    # ---- crop chained -------------------------------------------------------
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def crop(m, lo, hi):
        return voxel_hash.crop_outside_box(m, lo, hi, skip_points=True)

    lo = jnp.full(3, -200.0)
    hi = jnp.full(3, 200.0)
    chain(crop, m, lo, hi, label="crop steady chained")


if __name__ == "__main__":
    main()
