"""Second-level micro-benchmarks: what creates the ~25 ms floor?

Isolates per-argument marshalling (big unused buffers), top_k cost, raw
gather cost, and elementwise compute on the kNN-sized arrays.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


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
    rng = np.random.default_rng(0)
    N = 1 << 14

    dense = jnp.zeros((512, 512, 128, 2), jnp.int32)  # 268 MB
    big_pts = jnp.asarray(rng.normal(size=(1 << 20, 4, 3)).astype(np.float32))  # 50 MB
    q = jnp.asarray(rng.uniform(-50, 50, size=(N, 3)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, 1 << 20, size=(N, 27)).astype(np.int32))
    scores = jnp.asarray(rng.normal(size=(N, 27)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(N, 108)).astype(np.float32))

    @jax.jit
    def unused_big(dense, big_pts, q):
        return q + 1.0

    print(f"unused big args         : {bench(unused_big, dense, big_pts, q):7.2f} ms")

    @jax.jit
    def gather_dense(dense, q):
        ijk = jnp.floor(q / 0.5).astype(jnp.int32)
        row = dense[ijk[:, 0] & 511, ijk[:, 1] & 511, ijk[:, 2] & 127]
        return row

    print(f"dense row gather 16k    : {bench(gather_dense, dense, q):7.2f} ms")

    @jax.jit
    def gather_pts(big_pts, slots):
        return big_pts[slots & ((1 << 20) - 1)]

    print(f"points gather 16k x 27  : {bench(gather_pts, big_pts, slots):7.2f} ms")

    @jax.jit
    def topk12(s):
        return jax.lax.top_k(s, 12)

    print(f"top_k (16k,27)->12      : {bench(topk12, scores):7.2f} ms")

    @jax.jit
    def topk5(s):
        return jax.lax.top_k(s, 5)

    print(f"top_k (16k,108)->5      : {bench(topk5, d2):7.2f} ms")

    @jax.jit
    def sort27(s):
        return jax.lax.sort(s)

    print(f"sort (16k,27) last axis : {bench(sort27, scores):7.2f} ms")

    @jax.jit
    def elementwise(s):
        return jnp.sum(s * 1.0001 + 2.0, axis=-1)

    print(f"elementwise (16k,108)   : {bench(elementwise, d2):7.2f} ms")

    # is it the number of args?  same compute, map-as-pytree arg
    class M(jax.tree_util.Partial):
        pass

    @jax.jit
    def many_args(a, b, c, d, e):
        return a + 1.0

    print(f"5 small args            : {bench(many_args, q, q, q, q, q):7.2f} ms")

    # big OUTPUT?
    @jax.jit
    def big_out(q):
        return jnp.zeros((1 << 20, 4, 3), jnp.float32) + q[0, 0]

    print(f"big (50MB) output       : {bench(big_out, q):7.2f} ms")

    # donated big in/out (like the map through the step)
    @jax.jit
    def donate_pass(big_pts, q):
        return big_pts * 1.0, q

    print(f"big in+out (no donate)  : {bench(donate_pass, big_pts, q):7.2f} ms")


if __name__ == "__main__":
    main()
