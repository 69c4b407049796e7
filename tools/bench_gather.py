import sys; sys.path.insert(0, "/root/repo")
"""Gather-pattern microbench: hash-slot mom gather vs torus layouts."""
import time
import jax, jax.numpy as jnp, numpy as np

N = 1 << 14
C = 1 << 20
key = jax.random.PRNGKey(0)
mom_hash = jax.random.normal(key, (C, 10), jnp.float32)
dense = jax.random.randint(key, (512, 512, 128, 2), 0, C, jnp.int32)
mom_torus = jax.random.normal(key, (256, 256, 64, 12), jnp.float32)
q_ijk = jax.random.randint(key, (N, 3), 40, 200, jnp.int32)

offs = jnp.array([[0,0,0],[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1]], jnp.int32)

@jax.jit
def hash_path(q, dense, mom_hash):
    nb = q[:, None, :] + offs[None]
    lin = ((nb[..., 0] & 511) * 512 + (nb[..., 1] & 511)) * 128 + (nb[..., 2] & 127)
    rows = dense.reshape(-1, 2)[lin]
    slots = rows[..., 1] & (C - 1)
    mom = mom_hash[slots]
    return jnp.sum(mom, axis=(1, 2)) + jnp.sum(rows[..., 0], 1).astype(jnp.float32)

@jax.jit
def torus_rows_path(q, mom_torus):
    nb = q[:, None, :] + offs[None]
    rows = mom_torus[nb[..., 0] & 255, nb[..., 1] & 255, nb[..., 2] & 63]
    return jnp.sum(rows, axis=(1, 2))

@jax.jit
def torus_slice_path(q, mom_torus):
    qw = jnp.stack([q[:, 0] & 255, q[:, 1] & 255, q[:, 2] & 63], -1)
    start = jnp.stack([qw[:, 0], jnp.maximum(qw[:, 1] - 1, 0), jnp.maximum(qw[:, 2] - 1, 0)], -1)
    sl = jax.vmap(lambda s: jax.lax.dynamic_slice(mom_torus, (s[0], s[1], s[2], 0), (1, 3, 3, 12)))(start)
    r1 = mom_torus[(qw[:, 0] + 1) & 255, qw[:, 1], qw[:, 2]]
    r2 = mom_torus[(qw[:, 0] - 1) & 255, qw[:, 1], qw[:, 2]]
    return jnp.sum(sl, axis=(1, 2, 3, 4)) + jnp.sum(r1, 1) + jnp.sum(r2, 1)

@jax.jit
def torus_zrun_path(q, mom_torus):
    qw = jnp.stack([q[:, 0] & 255, q[:, 1] & 255, q[:, 2] & 63], -1)
    start = jnp.stack([qw[:, 0], qw[:, 1], jnp.maximum(qw[:, 2] - 1, 0)], -1)
    sl = jax.vmap(lambda s: jax.lax.dynamic_slice(mom_torus, (s[0], s[1], s[2], 0), (1, 1, 3, 12)))(start)
    r = [mom_torus[(qw[:, 0] + d) & 255, (qw[:, 1] + e) & 255, qw[:, 2]]
         for d, e in ((1, 0), (-1, 0), (0, 1), (0, -1))]
    return jnp.sum(sl, axis=(1, 2, 3, 4)) + sum(jnp.sum(x, 1) for x in r)

@jax.jit
def _drain(x):
    return jnp.sum(jnp.ravel(x)[:16]).astype(jnp.float32)

def bench_chain(f, *args, reps=40):
    q = q_ijk
    o = f(q, *args); float(np.asarray(_drain(o)))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(q, *args)
        q = q_ijk + (o[:1].astype(jnp.int32) * 0)[:, None]
    float(np.asarray(_drain(o)))
    return 1e3 * (time.perf_counter() - t0) / reps

print("hash 7dense+7mom", f"{bench_chain(hash_path, dense, mom_hash):7.3f} ms", flush=True)
print("torus 7 rows    ", f"{bench_chain(torus_rows_path, mom_torus):7.3f} ms", flush=True)
print("torus (3,3)+2   ", f"{bench_chain(torus_slice_path, mom_torus):7.3f} ms", flush=True)
print("torus zrun+4    ", f"{bench_chain(torus_zrun_path, mom_torus):7.3f} ms", flush=True)
