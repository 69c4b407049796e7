"""Multi-chip sharding: distributed measurement reduction + distributed GN.

The reference's parallelism is host-level (OpenMP fork-join over scan
points, pthreads for the map, a loop-closure thread — SURVEY.md §2.6).
Here the same axes become SPMD over a `jax.sharding.Mesh`:

  dp — scan points sharded across chips for the point-to-plane
       residual/Jacobian construction (the OpenMP-for of
       laserMapping.cpp:1883-1886 → P1).  Each chip reduces its shard to
       H^T H (12x12) and H^T h (12,) and a psum over ICI yields the
       global normal equations: the communication per ESIKF iteration is
       156 floats — essentially free.
  fp — pose-graph factors sharded across chips for the backend GN
       (the distributed Schur/CG of SURVEY.md §5.7 → P7): each chip
       scatter-adds its factors' J^T W J v contributions, psum merges.

The map is replicated in round 1 (each chip holds the voxel table —
~100 MB of HBM); map-shard migration over collective_permute is the
round-2 target (SURVEY.md P3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg
from jax.sharding import Mesh, PartitionSpec as P

from ..backend import posegraph as pg
from ..core import esikf, measurement
from ..core.state import ERR_DIM, State
from ..map import voxel_hash
from ..utils import se3, so3

__all__ = [
    "make_mesh",
    "sharded_hth_reduce",
    "sharded_update_step",
    "sharded_posegraph_hvp",
    "sharded_gn_step",
    "make_sharded_map",
    "sharded_map_insert",
    "sharded_map_knn",
]


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def sharded_hth_reduce(mesh: Mesh, axis: str = "dp"):
    """Build a shard_map'd reducer: (h_x (N,12) sharded, h (N,) sharded,
    mask sharded) -> (HtH (12,12), Hth (12,)) replicated."""

    def local(h_x, h, mask):
        w = mask.astype(h_x.dtype)
        hx = h_x * w[:, None]
        hh = h * w
        HtH = jax.lax.psum(hx.T @ hx, axis)
        Hth = jax.lax.psum(hx.T @ hh, axis)
        return HtH, Hth

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )


def sharded_update_step(mesh: Mesh, cfg=None, axis: str = "dp"):
    """One ESIKF measurement iteration with points sharded over `axis`.

    The map table is replicated; each device runs kNN + plane fit + row
    construction on its point shard, reduces to the 12x12 normal
    equations, psums, and the (tiny) 23x23 solve happens replicated —
    numerically identical to single-chip.
    """

    def local(x: State, P_: jax.Array, m: voxel_hash.VoxelHashMap,
              pts: jax.Array, valid: jax.Array):
        # per-shard measurement rows
        p_imu = so3.quat_rotate(x.off_r, pts) + x.off_t
        p_world = so3.quat_rotate(x.rot, p_imu) + x.pos
        nb, d2, ok = voxel_hash.knn(m, p_world, k=5, chunk=pts.shape[0])
        nn_ok = jnp.all(ok, axis=-1) & (d2[:, 4] <= measurement.MAX_NN_DIST2) & valid
        n, d, plane_ok = measurement.plane_fit(nb, nn_ok)
        pd2 = jnp.einsum("ni,ni->n", n, p_world) + d
        srob = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(
            jnp.maximum(jnp.linalg.norm(pts, axis=-1), 1e-8)
        )
        sel = plane_ok & (srob > measurement.ROBUST_S_GATE)
        C = so3.quat_inv_rotate(x.rot, n)
        h_x = jnp.concatenate(
            [n, jnp.cross(p_imu, C), jnp.zeros_like(n), jnp.zeros_like(n)],
            axis=-1,
        )
        h = -pd2
        w = sel.astype(h_x.dtype)
        hx = h_x * w[:, None]
        HtH = jax.lax.psum(hx.T @ hx, axis)
        Hth = jax.lax.psum(hx.T @ (h * w), axis)

        # replicated tiny solve: dx = (HtH + (P/R)^-1)^-1 Hth
        R = 0.001
        eyeP = jnp.eye(ERR_DIM, dtype=P_.dtype)
        S_inv = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(P_ / R), True), eyeP
        )
        A = S_inv.at[:12, :12].add(HtH)
        rhs = jnp.zeros(ERR_DIM, P_.dtype).at[:12].set(Hth)
        dx = jnp.linalg.solve(A, rhs)
        return dx, jnp.sum(w)

    # replicated map WITHOUT the dense index (None): the dense torus grid
    # is a single-chip lookup accelerator; replicating 268 MB per chip
    # buys nothing the probe path doesn't already do here
    mspec = voxel_hash.VoxelHashMap(
        key=P(), count=P(), points=P(), mom=None, dense=None, voxel_size=P()
    )
    xspec = State(*([P()] * 8))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, P(), mspec, P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Sharded voxel map (SURVEY.md P3): the map's voxel blocks distributed
# across chips.  Ownership is a pure function of the voxel coordinates
# (an independent hash, so table-slot placement and ownership don't
# correlate); every device holds a full-size VoxelHashMap pytree whose
# leading (slot) axis is its OWN shard — aggregate capacity scales
# linearly with the device count, the HBM per chip stays constant.
#
#   insert: the scan batch is replicated; each device masks the batch to
#           voxels it owns and runs the ordinary single-chip insert on
#           its local table.  ZERO inter-chip communication.
#   kNN:    queries are replicated; each device searches the (up to 27)
#           neighborhood cells it owns, reduces to a local per-query
#           top-k, and an all_gather + re-top-k merges the per-device
#           partials — (N, k) * 16 bytes * D over ICI, ~2 MB at N=16k,
#           D=8.  Exactness: the union of per-device candidate cells is
#           the full neighborhood, so the merged top-k equals the
#           single-chip result.
# ---------------------------------------------------------------------------


def _owner_of(ijk: jax.Array, n_dev: int) -> jax.Array:
    """Owning device of a voxel coord — independent of the slot hash
    (different prime mixing + avalanche shift so ownership and in-table
    placement decorrelate)."""
    import numpy as np

    c0, c1, c2 = (jnp.int32(np.uint32(c).astype(np.int32))
                  for c in (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D))
    h = ijk[..., 0] * c0 ^ ijk[..., 1] * c1 ^ ijk[..., 2] * c2
    h = (h ^ (h >> 13)) & 0x7FFFFFFF
    return h % n_dev


def make_sharded_map(
    mesh: Mesh,
    capacity_log2_per_dev: int = 18,
    bucket: int = 4,
    voxel_size: float = 0.5,
    dtype=jnp.float32,
    axis: str = "dp",
) -> voxel_hash.VoxelHashMap:
    """Allocate an empty device-sharded map: a VoxelHashMap whose arrays
    have a leading axis of D local tables, sharded one-per-device.
    (No dense torus index in sharded mode: the probe path covers lookup
    and keeps per-chip HBM flat.)"""
    n_dev = mesh.devices.size
    local = voxel_hash.make_map(
        capacity_log2=capacity_log2_per_dev, bucket=bucket,
        voxel_size=voxel_size, dtype=dtype, dense_log2=None,
    )
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), local
    )
    sh = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh) if a.ndim > 0 else a, stacked
    )


def sharded_map_insert(mesh: Mesh, axis: str = "dp", max_probe: int = 16):
    """insert(m_sharded, pts_world (N,3) replicated, valid (N,)) — each
    device claims only its owned voxels; no communication."""
    n_dev = mesh.devices.size

    def local(m, pts_world, valid):
        m = jax.tree_util.tree_map(lambda a: a[0], m)  # local table
        me = jax.lax.axis_index(axis)
        ijk = voxel_hash._voxel_of(pts_world, m.voxel_size)
        mine = valid & (_owner_of(ijk, n_dev) == me)
        m2 = voxel_hash.insert(m, pts_world, mine, max_probe=max_probe)
        return jax.tree_util.tree_map(lambda a: a[None], m2)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )


def sharded_map_knn(
    mesh: Mesh,
    axis: str = "dp",
    k: int = 5,
    max_probe: int = 16,
    n_neighbors: int = 27,
):
    """knn(m_sharded, queries (N,3) replicated) ->
    (neighbors (N,k,3), d2 (N,k), ok (N,k)) replicated.

    Per-device local search over owned cells, then an all_gather +
    re-top-k merge — the multi-chip Nearest_Search replacement."""
    n_dev = mesh.devices.size
    offs = voxel_hash._neighbor_offsets(n_neighbors)

    def local(m, q):
        m = jax.tree_util.tree_map(lambda a: a[0], m)
        me = jax.lax.axis_index(axis)
        N = q.shape[0]
        B = m.bucket
        dtype = m.points.dtype
        BIG = jnp.asarray(1e17, dtype)

        ijk = voxel_hash._voxel_of(q, m.voxel_size)
        nb = ijk[:, None, :] + offs[None, :, :]  # (N, NB, 3)
        mine = _owner_of(nb, n_dev) == me
        slots = voxel_hash._lookup_slots(
            m.key, nb.reshape(-1, 3), max_probe
        ).reshape(N, -1)
        slots = jnp.where(mine, slots, -1)

        safe = jnp.maximum(slots, 0)
        cand = m.points[safe]  # (N, NB, B, 3)
        d2 = jnp.sum((cand - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(slots[..., None] >= 0, d2, BIG)
        NB = offs.shape[0]
        neg, top_i = jax.lax.top_k(-d2.reshape(N, NB * B), k)
        pts_k = jnp.take_along_axis(
            cand.reshape(N, NB * B, 3), top_i[..., None], axis=1
        )  # (N, k, 3)

        # merge partials: (D, N, k) -> per-query top-k of D*k
        all_d2 = jax.lax.all_gather(-neg, axis)  # (D, N, k)
        all_pts = jax.lax.all_gather(pts_k, axis)  # (D, N, k, 3)
        all_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(N, n_dev * k)
        all_pts = jnp.moveaxis(all_pts, 0, 1).reshape(N, n_dev * k, 3)
        negm, mi = jax.lax.top_k(-all_d2, k)
        d2m = -negm
        ptsm = jnp.take_along_axis(all_pts, mi[..., None], axis=1)
        return ptsm, d2m, d2m < BIG

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def sharded_posegraph_hvp(mesh: Mesh, axis: str = "dp"):
    """Distributed H·v for the pose-graph CG: factors sharded, poses
    replicated, psum merges the scatter-adds."""

    def local(poses, bw_i, bw_j, bw_meas, bw_w, v):
        e, Ji, Jj = pg._between_residual_jac(poses, bw_i, bw_j, bw_meas)
        Jv = jnp.einsum("fab,fb->fa", Ji, v[bw_i]) + jnp.einsum(
            "fab,fb->fa", Jj, v[bw_j]
        )
        WJv = bw_w * Jv
        out = jnp.zeros_like(v)
        out = out.at[bw_i].add(jnp.einsum("fab,fa->fb", Ji, WJv), mode="drop")
        out = out.at[bw_j].add(jnp.einsum("fab,fa->fb", Jj, WJv), mode="drop")
        return jax.lax.psum(out, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )


def sharded_gn_step(mesh: Mesh, axis: str = "dp", cg_iters: int = 10):
    """One distributed Gauss-Newton step over a between-factor graph:
    residuals + rhs + `cg_iters` CG iterations, all with factors sharded
    over `axis` and only psum/ICI traffic between chips."""

    def local(poses, bw_i, bw_j, bw_meas, bw_w, prior_w):
        K = poses.shape[0]
        dtype = poses.dtype
        e, Ji, Jj = pg._between_residual_jac(poses, bw_i, bw_j, bw_meas)

        b = jnp.zeros((K, 6), dtype)
        b = b.at[bw_i].add(jnp.einsum("fab,fa->fb", Ji, bw_w * e),
                           mode="drop")
        b = b.at[bw_j].add(jnp.einsum("fab,fa->fb", Jj, bw_w * e),
                           mode="drop")
        b = -jax.lax.psum(b, axis)
        # gauge prior on pose 0 (replicated)
        b = b.at[0].add(-prior_w * jnp.zeros(6, dtype))

        def hvp(v):
            Jv = jnp.einsum("fab,fb->fa", Ji, v[bw_i]) + jnp.einsum(
                "fab,fb->fa", Jj, v[bw_j]
            )
            WJv = bw_w * Jv
            out = jnp.zeros((K, 6), dtype)
            out = out.at[bw_i].add(jnp.einsum("fab,fa->fb", Ji, WJv),
                                   mode="drop")
            out = out.at[bw_j].add(jnp.einsum("fab,fa->fb", Jj, WJv),
                                   mode="drop")
            out = jax.lax.psum(out, axis)
            out = out.at[0].add(prior_w * v[0])
            return out + 1e-6 * v

        def cg_step(c, _):
            xv, r, p, rr = c
            Ap = hvp(p)
            alpha = rr / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            xv = xv + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.vdot(r, r)
            p = r + (rr_new / jnp.maximum(rr, 1e-20)) * p
            return (xv, r, p, rr_new), None

        x0 = jnp.zeros((K, 6), dtype)
        (dx, *_), _ = jax.lax.scan(
            cg_step, (x0, b, b, jnp.vdot(b, b)), None, length=cg_iters
        )
        new_t = se3.trans(poses) + dx[:, 0:3]
        new_q = so3.quat_normalize(
            so3.quat_multiply(se3.rot(poses), so3.quat_exp(dx[:, 3:6]))
        )
        return se3.make(new_q, new_t)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
