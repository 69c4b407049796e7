import sys; sys.path.insert(0, "/root/repo")
"""Microbench: downsample variants on the TPU."""
import time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.ops.downsample import voxel_downsample

N = 1 << 15; M = 1 << 14
groups = list(make_lio_sequence(duration=3.0, scan_rate=10.0, imu_rate=100.0,
    n_points=30_000, seed=7, noise=0.004, traj=Trajectory(t_still=0.7, speed=3.0)))
g = groups[-1]
pts = np.zeros((N, 3), np.float32); n = len(g["pts"]); pts[:n] = g["pts"]
valid = np.zeros(N, bool); valid[:n] = True
pts = jnp.asarray(pts); valid = jnp.asarray(valid)
INT_MAX = jnp.iinfo(jnp.int32).max

@partial(jax.jit, static_argnames=("out_size",))
def ds_multisort(pts, valid, voxel_size, out_size):
    M = out_size
    ijk = jnp.floor(pts / voxel_size).astype(jnp.int32)
    key = jnp.where(valid,
        (ijk[:, 0] & 1023) | ((ijk[:, 1] & 1023) << 10) | ((ijk[:, 2] & 1023) << 20),
        INT_MAX)
    key_s, x_s, y_s, z_s, v_s = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2], valid), num_keys=1)
    pts_s = jnp.where(v_s[:, None], jnp.stack([x_s, y_s, z_s], -1), 0.0)
    head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]]) & v_s
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg = jnp.where(v_s, seg, M)
    sums = jnp.zeros((M, 3), pts.dtype).at[seg].add(pts_s, mode="drop")
    cnts = jnp.zeros((M,), jnp.int32).at[seg].add(v_s.astype(jnp.int32), mode="drop")
    return sums / jnp.maximum(cnts, 1)[:, None], cnts > 0

@partial(jax.jit, static_argnames=("out_size",))
def ds_multisort_cumsum(pts, valid, voxel_size, out_size):
    """multi-op sort + cumsum-diff segmented sums (gather M instead of scatter N)."""
    M = out_size
    ijk = jnp.floor(pts / voxel_size).astype(jnp.int32)
    key = jnp.where(valid,
        (ijk[:, 0] & 1023) | ((ijk[:, 1] & 1023) << 10) | ((ijk[:, 2] & 1023) << 20),
        INT_MAX)
    key_s, x_s, y_s, z_s, v_s = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2], valid), num_keys=1)
    pts_s = jnp.where(v_s[:, None], jnp.stack([x_s, y_s, z_s], -1), 0.0)
    head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]]) & v_s
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1          # group id per row
    csum = jnp.cumsum(pts_s, axis=0)
    ccnt = jnp.cumsum(v_s.astype(jnp.int32))
    # start index of each group g (first row with seg==g & head)
    starts = jnp.nonzero(head, size=M, fill_value=pts.shape[0] - 1)[0]
    ngroups = jnp.sum(head.astype(jnp.int32))
    gid = jnp.arange(M)
    ok = gid < ngroups
    nxt = jnp.where(gid + 1 < ngroups, starts[jnp.minimum(gid + 1, M - 1)], pts.shape[0])
    lo = starts
    sums = csum[nxt - 1] - jnp.where((lo > 0)[:, None], csum[jnp.maximum(lo - 1, 0)], 0.0)
    cnts = ccnt[nxt - 1] - jnp.where(lo > 0, ccnt[jnp.maximum(lo - 1, 0)], 0)
    cnts = jnp.where(ok, cnts, 0)
    return sums / jnp.maximum(cnts, 1)[:, None], cnts > 0

def bench(f, *a, reps=30):
    o = f(*a); jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); o = f(*a); jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))

o0 = voxel_downsample(pts, valid, 0.5, out_size=M, packed_key=True)  # noqa
o1 = ds_multisort(pts, valid, 0.5, M)
o2 = ds_multisort_cumsum(pts, valid, 0.5, M)
n0, n1, n2 = int(o0[1].sum()), int(o1[1].sum()), int(o2[1].sum())
# compare sets: sort rows
def canon(o):
    p = np.asarray(o[0])[np.asarray(o[1])]
    return p[np.lexsort(p.T)]
c0, c1, c2 = canon(o0), canon(o1), canon(o2)
print("counts:", n0, n1, n2,
      "match01:", c0.shape == c1.shape and np.allclose(c0, c1, atol=1e-5),
      "match02:", c0.shape == c2.shape and np.allclose(c0, c2, atol=2e-4))
print("argsort+gather :", bench(lambda: voxel_downsample(pts, valid, 0.5, out_size=M, packed_key=True)), "ms")
print("multisort      :", bench(ds_multisort, pts, valid, 0.5, M), "ms")
print("multisort+cumsum:", bench(ds_multisort_cumsum, pts, valid, 0.5, M), "ms")

# ---- stream-drain timing: chain reps, one readback ----
@jax.jit
def _drain(x):
    return jnp.sum(jnp.ravel(x)[:16]).astype(jnp.float32)

def bench_chain(f, reps=40):
    p = pts
    o = f(p); float(np.asarray(_drain(o[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(p)
        p = pts + 0.0 * o[0][:1, :].sum()  # serialize
    float(np.asarray(_drain(o[0])))
    return 1e3 * (time.perf_counter() - t0) / reps

print("chained argsort+gather :", bench_chain(lambda p: voxel_downsample(p, valid, 0.5, out_size=M, packed_key=True)))
print("chained multisort      :", bench_chain(lambda p: ds_multisort(p, valid, 0.5, M)))
print("chained multisort+cum  :", bench_chain(lambda p: ds_multisort_cumsum(p, valid, 0.5, M)))
