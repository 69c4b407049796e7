"""Micro-benchmarks v3 — stream-draining methodology.

block_until_ready does not actually wait on the remote-TPU (axon) path,
so per-call timings are meaningless.  Instead: enqueue `reps` executions
(the TPU stream is in-order), then force a host readback of a scalar
reduced from the LAST output; total/reps = sustained per-call cost
including real device compute.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _drain(leaf):
    return jnp.sum(jnp.ravel(leaf)[:128]).astype(jnp.float32)


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_drain(leaf)))


def bench(fn, *args, reps=20):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = time.perf_counter() - t0
    return 1e3 * dt / reps


def main():
    rng = np.random.default_rng(0)
    N = 1 << 14

    dense = jnp.zeros((512, 512, 128, 2), jnp.int32)  # 268 MB
    big_pts = jnp.asarray(rng.normal(size=(1 << 20, 4, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-50, 50, size=(N, 3)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, 1 << 20, size=(N, 27)).astype(np.int32))
    slots12 = slots[:, :12]
    scores = jnp.asarray(rng.normal(size=(N, 27)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(N, 108)).astype(np.float32))

    @jax.jit
    def null_fn(q):
        return q + 1.0

    print(f"null                    : {bench(null_fn, q):7.3f} ms")

    @jax.jit
    def gather_dense(dense, q):
        ijk = jnp.floor(q / 0.5).astype(jnp.int32)
        return dense[ijk[:, 0] & 511, ijk[:, 1] & 511, ijk[:, 2] & 127]

    print(f"dense row gather 16k    : {bench(gather_dense, dense, q):7.3f} ms")

    @jax.jit
    def gather_dense27(dense, q):
        ijk = jnp.floor(q / 0.5).astype(jnp.int32)
        offs = jnp.stack(jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2),
                                      jnp.arange(-1, 2), indexing="ij"),
                         axis=-1).reshape(27, 3)
        nb = ijk[:, None, :] + offs[None]
        return dense[nb[..., 0] & 511, nb[..., 1] & 511, nb[..., 2] & 127]

    print(f"dense row gather 16kx27 : {bench(gather_dense27, dense, q):7.3f} ms")

    @jax.jit
    def gather_pts27(big_pts, slots):
        return big_pts[slots]

    print(f"points gather 16k x 27  : {bench(gather_pts27, big_pts, slots):7.3f} ms")

    @jax.jit
    def gather_pts12(big_pts, slots12):
        return big_pts[slots12]

    print(f"points gather 16k x 12  : {bench(gather_pts12, big_pts, slots12):7.3f} ms")

    @jax.jit
    def topk12(s):
        return jax.lax.top_k(s, 12)

    print(f"top_k (16k,27)->12      : {bench(topk12, scores):7.3f} ms")

    @jax.jit
    def topk5(s):
        return jax.lax.top_k(s, 5)

    print(f"top_k (16k,108)->5      : {bench(topk5, d2):7.3f} ms")

    @jax.jit
    def argmin5(s):
        d = s
        c = d.shape[0]
        outs = []
        for _ in range(5):
            i = jnp.argmin(d, axis=1)
            outs.append(i)
            d = d.at[jnp.arange(c), i].set(1e17)
        return jnp.stack(outs, -1)

    print(f"argmin x5 (16k,108)     : {bench(argmin5, d2):7.3f} ms")

    @jax.jit
    def elementwise(s):
        return jnp.sum(s * 1.0001 + 2.0, axis=-1)

    print(f"elementwise (16k,108)   : {bench(elementwise, d2):7.3f} ms")

    @jax.jit
    def big_copy(big_pts):
        return big_pts * 1.0001

    print(f"50MB stream r+w         : {bench(big_copy, big_pts):7.3f} ms")

    @jax.jit
    def dense_copy(dense):
        return dense + 1

    print(f"268MB stream r+w        : {bench(dense_copy, dense):7.3f} ms")

    # scatter costs (insert path)
    upd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 1 << 20, size=N).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, 4, size=N).astype(np.int32))

    @jax.jit
    def scatter2d(big_pts, rows, cols, upd):
        return big_pts.at[rows, cols].set(upd)

    print(f"2D scatter 16k rows     : {bench(scatter2d, big_pts, rows, cols, upd):7.3f} ms")


if __name__ == "__main__":
    main()
