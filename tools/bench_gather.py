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

# --- round-3 variants: what does the (N,7) 48B row gather really cost? ---
lin_t = None

@jax.jit
def torus_flat_lin(q, mom_torus):
    nb = q[:, None, :] + offs[None]
    G = 256 * 256 * 64
    lin = ((nb[..., 0] & 255) * 256 + (nb[..., 1] & 255)) * 64 + (nb[..., 2] & 63)
    rows = mom_torus.reshape(G, 12)[lin.reshape(-1)].reshape(-1, 7, 12)
    return jnp.sum(rows, axis=(1, 2))

mom_torus16 = jax.random.normal(key, (256, 256, 64, 16), jnp.float32)

@jax.jit
def torus_rows16(q, mom_torus16):
    nb = q[:, None, :] + offs[None]
    rows = mom_torus16[nb[..., 0] & 255, nb[..., 1] & 255, nb[..., 2] & 63]
    return jnp.sum(rows, axis=(1, 2))

# own-cell only (16k lanes x 48B): the floor of a 1-gather association
@jax.jit
def torus_own_only(q, mom_torus):
    rows = mom_torus[q[:, 0] & 255, q[:, 1] & 255, q[:, 2] & 63]
    return jnp.sum(rows, axis=1)

# plane-table read: (N,) rows of 32B (8 ch)
plane_tab = jax.random.normal(key, (256 * 256 * 64, 8), jnp.float32)

@jax.jit
def plane_read(q, plane_tab):
    lin = ((q[:, 0] & 255) * 256 + (q[:, 1] & 255)) * 64 + (q[:, 2] & 63)
    return jnp.sum(plane_tab[lin], axis=1)

print("torus flat lin  ", f"{bench_chain(torus_flat_lin, mom_torus):7.3f} ms", flush=True)
print("torus 7r 16ch   ", f"{bench_chain(torus_rows16, mom_torus16):7.3f} ms", flush=True)
print("torus own only  ", f"{bench_chain(torus_own_only, mom_torus):7.3f} ms", flush=True)
print("plane table read", f"{bench_chain(plane_read, plane_tab):7.3f} ms", flush=True)

# flat (G,12) storage, reshaped to 4-D INSIDE jit for the gather: same
# buffer, multi-dim index lowering
mom_flat = mom_torus.reshape(-1, 12)

@jax.jit
def torus_flat_reshaped(q, mom_flat):
    t4 = mom_flat.reshape(256, 256, 64, 12)
    nb = q[:, None, :] + offs[None]
    rows = t4[nb[..., 0] & 255, nb[..., 1] & 255, nb[..., 2] & 63]
    return jnp.sum(rows, axis=(1, 2))

# header read (tag,count 2ch) in both forms
@jax.jit
def hdr_flat(q, mom_flat):
    lin = ((q[:, 0] & 255) * 256 + (q[:, 1] & 255)) * 64 + (q[:, 2] & 63)
    return jnp.sum(mom_flat[lin, 0:2], axis=1)

@jax.jit
def hdr_4d(q, mom_flat):
    t4 = mom_flat.reshape(256, 256, 64, 12)
    return jnp.sum(t4[q[:, 0] & 255, q[:, 1] & 255, q[:, 2] & 63, 0:2], axis=1)

print("torus flat->4d  ", f"{bench_chain(torus_flat_reshaped, mom_flat):7.3f} ms", flush=True)
print("hdr flat lin    ", f"{bench_chain(hdr_flat, mom_flat):7.3f} ms", flush=True)
print("hdr 4d          ", f"{bench_chain(hdr_4d, mom_flat):7.3f} ms", flush=True)
