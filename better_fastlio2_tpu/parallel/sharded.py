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
        key=P(), count=P(), points=P(), dense=None, voxel_size=P()
    )
    xspec = State(*([P()] * 8))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, P(), mspec, P(axis), P(axis)),
        out_specs=(P(), P()),
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
