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
    "make_sharded_step_fn",
    "make_spmd_window_step_fn",
    "slab_owner",
    "sharded_slab_insert",
    "sharded_slab_migrate",
    "comm_volume_per_scan",
    "spmd_comm_volume_per_scan",
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
    moments: bool = False,
) -> voxel_hash.VoxelHashMap:
    """Allocate an empty device-sharded map: a VoxelHashMap whose arrays
    have a leading axis of D local tables, sharded one-per-device.
    (No dense torus index in sharded mode: the probe path covers lookup
    and keeps per-chip HBM flat.)  moments=True is required for the
    sharded scan tick (make_sharded_step_fn)."""
    n_dev = mesh.devices.size
    local = voxel_hash.make_map(
        capacity_log2=capacity_log2_per_dev, bucket=bucket,
        voxel_size=voxel_size, dtype=dtype, dense_log2=None,
        moments=moments,
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


def _local_knn_merge(m_loc, q, me, n_dev, axis, k=5, max_probe=16,
                     n_neighbors=27):
    """Inside shard_map: k-NN of replicated queries against the
    ownership-sharded map — local top-k over owned cells, then an
    all_gather + re-top-k merge.  Exact vs the single-chip search."""
    offs = voxel_hash._neighbor_offsets(n_neighbors)
    N = q.shape[0]
    B = m_loc.bucket
    dtype = m_loc.points.dtype
    BIG = jnp.asarray(1e17, dtype)

    ijk = voxel_hash._voxel_of(q, m_loc.voxel_size)
    nb = ijk[:, None, :] + offs[None, :, :]  # (N, NB, 3)
    mine = _owner_of(nb, n_dev) == me
    slots = voxel_hash._lookup_slots(
        m_loc.key, nb.reshape(-1, 3), max_probe
    ).reshape(N, -1)
    slots = jnp.where(mine, slots, -1)

    safe = jnp.maximum(slots, 0)
    cand = m_loc.points[safe]  # (N, NB, B, 3)
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

    def local(m, q):
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m)
        me = jax.lax.axis_index(axis)
        return _local_knn_merge(m_loc, q, me, n_dev, axis, k=k,
                                max_probe=max_probe,
                                n_neighbors=n_neighbors)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def make_sharded_step_fn(cfg, mesh: Mesh, axis: str = "dp"):
    """Full multi-chip scan tick: points data-parallel AND the map
    ownership-sharded, in one shard_map program.

    Layout per device d of D:
      - raw scan points: shard d holds N/D rows (undistortion,
        downsample, and measurement rows are local);
      - the voxel map: a full-size local table holding only the voxels
        d OWNS (make_sharded_map);
      - filter state x, P, IMU batch, cube: replicated.

    Communication per scan (all ICI collectives):
      - all_gather of the downsampled shards (~n_ds*3 floats) so every
        owner sees the full batch for insert and association;
      - psum of the (n_ds, 10) per-query moment partial sums (each
        device blends only its OWNED neighborhood cells — moment sums
        are associative across shards, so the psum equals the
        single-chip 7-cell blend exactly);
      - psum of the 12x12/12 normal equations + valid count per ESIKF
        iteration (esikf.update_iterated psum_axis) — 156 floats.

    Association: the 5-NN merge path (use_knn=True — the warmup while
    the moment cache densifies, all_gather top-k merge) or the
    plane-cache path (use_knn=False, psum'd moment partials); both live
    in one program behind lax.cond, the host flips the flag after the
    first ~dozen scans exactly like LIOPipeline's warmup switch.

    Returns step(x, P, m_sharded, pts_sh, pt_t_sh, pt_valid_sh, imu_b,
    last_end_rel, scan_end_t, acc_norm, cube_lo, cube_hi, last_acc_w,
    last_gyr_b, use_knn) -> (x', P', m_sharded', tail (2,3): the scan's
    terminal world acceleration / bias-corrected gyro to feed back).
    """
    from ..core import esikf as esikf_mod
    from ..core import imu as imu_mod
    from ..core import measurement as meas
    from ..core.esikf import MeasurementOut
    from ..ops.downsample import voxel_downsample

    n_dev = mesh.devices.size
    sh = cfg.shapes
    mp = cfg.mapping
    dtype = jnp.dtype(cfg.dtype)

    def local(x, P_, m, pts, pt_t, pt_valid, imu_b, last_end_rel,
              scan_end_t, acc_norm, cube_lo, cube_hi, last_acc_w,
              last_gyr_b, use_knn):
        me = jax.lax.axis_index(axis)
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m)

        Q_ = imu_mod.build_Q(mp.gyr_cov, mp.acc_cov, mp.b_gyr_cov,
                             mp.b_acc_cov, dtype)
        # replicated propagation; local undistortion of the point shard
        x_prop, P_prop, poses = imu_mod.propagate(
            x, P_, imu_b, Q_, acc_norm, last_end_rel, scan_end_t,
            last_acc_w, last_gyr_b,
        )
        pts_body = imu_mod.undistort(x_prop, poses, pts, pt_t)

        # local downsample of the shard, then all_gather the batch as
        # int16 positions (same idea as the host->device v2 wire format
        # of pipeline/lio.py, but with a per-config scale derived from
        # det_range below, NOT the fixed POS_SCALE constant): halves the
        # dominant all_gather payload at a sub-noise quantization step.
        # Invalid rows quantize to 0 harmlessly (dv_all masks them);
        # points beyond the clip range saturate silently — upstream
        # det_range culling is what keeps them in range.  The moment-partial psum stays f32: a
        # psum accumulates quantization error D-fold and exact
        # cross-shard additivity is what makes the sharded blend equal
        # the single-chip one.
        n_ds_loc = sh.n_ds // n_dev
        ds_loc, dv_loc = voxel_downsample(
            pts_body, pt_valid, mp.surf_leaf_size, out_size=n_ds_loc
        )
        # scale sized to the config's sensor range (not a fixed 120 m —
        # a 260 m det_range config would silently clip): quantization
        # step stays sub-noise (det_range/32767, e.g. 8 mm at 260 m)
        pos_scale = jnp.asarray(
            max(1.1 * mp.det_range, 120.0) / 32767.0, dtype)
        ds_q = jnp.clip(jnp.round(ds_loc / pos_scale),
                        -32767, 32767).astype(jnp.int16)
        ds_all = (jax.lax.all_gather(ds_q, axis).reshape(-1, 3)
                  .astype(dtype) * pos_scale)
        dv_all = jax.lax.all_gather(dv_loc, axis).reshape(-1)

        # ---- association: 5-NN merge (warmup) or psum'd moment blend --
        def measure(s, converged, aux):
            p_world = meas.transform_to_world(s, ds_all)

            def search_moments(_):
                sums, ijk = meas.neighborhood_moment_sums(
                    m_loc, p_world, max_probe=sh.map_max_probe,
                    cell_mask_fn=lambda nb: _owner_of(nb, n_dev) == me,
                )
                sums = jax.lax.psum(sums, axis)
                n, d, ok = meas.finalize_plane_from_sums(
                    sums, ijk, m_loc.voxel_size, dv_all
                )
                return meas.MeasureAux(n, d, ok, jnp.array(True),
                                       aux.assoc_ijk, jnp.array(True))

            def search_knn(_):
                nbp, d2, okk = _local_knn_merge(
                    m_loc, p_world, me, n_dev, axis, k=5,
                    max_probe=sh.map_max_probe)
                nn_ok = (jnp.all(okk, -1)
                         & (d2[:, 4] <= meas.MAX_NN_DIST2) & dv_all)
                n, d, ok = meas.plane_fit(nbp, nn_ok)
                return meas.MeasureAux(n, d, ok, jnp.array(True),
                                       aux.assoc_ijk, jnp.array(True))

            def do_search(_):
                return jax.lax.cond(use_knn, search_knn, search_moments,
                                    None)

            aux = jax.lax.cond(jnp.logical_not(aux.searched), do_search,
                               lambda a: a, aux)
            n, d, plane_ok = aux.normal, aux.d, aux.fit_ok

            # each device builds rows for ITS slice of the batch; the
            # normal equations psum inside update_iterated
            start = me * n_ds_loc
            dsl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, n_ds_loc)
            pw_s = dsl(p_world)
            n_s, d_s, ok_s = dsl(n), dsl(d), dsl(plane_ok)
            pts_b_s = dsl(ds_all)
            pd2 = jnp.einsum("ni,ni->n", n_s, pw_s) + d_s
            body_norm = jnp.linalg.norm(pts_b_s, axis=-1)
            srob = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(
                jnp.maximum(body_norm, 1e-8))
            sel = ok_s & (srob > meas.ROBUST_S_GATE)
            p_imu = so3.quat_rotate(s.off_r, pts_b_s) + s.off_t
            Crow = so3.quat_inv_rotate(s.rot, n_s)
            h_x = jnp.concatenate(
                [n_s, jnp.cross(p_imu, Crow)], axis=-1)
            return MeasurementOut(h_x=h_x, h=-pd2, mask=sel, aux=aux)

        aux0 = meas.MeasureAux(
            normal=jnp.zeros((ds_all.shape[0], 3), dtype),
            d=jnp.zeros(ds_all.shape[0], dtype),
            fit_ok=jnp.zeros(ds_all.shape[0], bool),
            searched=jnp.array(False),
            assoc_ijk=jnp.zeros((ds_all.shape[0], 3), jnp.int32),
            refreshed=jnp.array(False),
        )
        x_post, P_post, _, _ = esikf_mod.update_iterated(
            x_prop, P_prop, measure, aux0,
            max_iter=cfg.ikdtree.max_iteration, psum_axis=axis,
            n_cols=6,
        )

        # ---- owner-masked insert + local FoV crop --------------------
        pts_world = meas.transform_to_world(x_post, ds_all)
        ijk_all = voxel_hash._voxel_of(pts_world, m_loc.voxel_size)
        mine = dv_all & (_owner_of(ijk_all, n_dev) == me)
        m_new = voxel_hash.insert(m_loc, pts_world, mine,
                                  max_probe=sh.map_max_probe)
        m_new = voxel_hash.crop_outside_box(m_new, cube_lo, cube_hi)

        tail = jnp.stack([poses.acc_w[-1], poses.gyr_b[-1]])
        m_out = jax.tree_util.tree_map(lambda a: a[None], m_new)
        return x_post, P_post, m_out, tail

    xspec = State(*([P()] * 8))
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, P(), P(axis), P(axis), P(axis), P(axis), P(),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(xspec, P(), P(axis), P()),
        check_vma=False,
    ), donate_argnums=(2,))


def make_spmd_window_step_fn(cfg, mesh: Mesh, window: int, ls_example,
                             axis: str = "dp",
                             plane_cache: bool | None = None,
                             unroll: int = 1,
                             override_ndev: int | None = None):
    """PRODUCTION-parity multi-chip window step: the full windowed LIO
    device loop (lio.make_window_step_fn) as one shard_map program over
    `mesh`.

    This is the scaling path the MULTICHIP.md model describes as
    implemented: map + filter state REPLICATED, per-point work sharded
    by query rows — undistortion on the raw-point shard, association /
    plane finalize / fused solve-row packing on this device's 1/D slice
    of the downsampled batch, Gram psum per ESIKF iteration, and the
    dense-moment insert's arithmetic sharded with an all_gather of
    budgeted delta rows (see lio._make_step_core spmd docstring for the
    layout rationale; the ownership-sharded map variants above remain
    the aggregate-HBM-scaling alternative).  The program body IS the
    production step core — same dense index, fused Pallas solve, window
    lax.scan, insert budgets — so a 1-device mesh runs the production
    program plus identity collectives.

    `ls_example`: a live LIOState whose pytree structure (which optional
    map tables exist) fixes the replicated in/out specs.

    Returns wstep(ls, w: lio.WindowInputs, acc_norm) -> (ls', infos)
    where w.pts/pt_t/pt_valid are sharded over their POINT axis
    (NamedSharding(mesh, P(None, axis))) and everything else is
    replicated.

    override_ndev (scaling-model measurement hook ONLY — one real chip,
    many modeled): build the per-device program of a D-device mesh but
    run it on this (typically 1-device) mesh.  The device then executes
    exactly one device's share of the D-way-sharded work (1/D query
    slice, 1/D insert arithmetic, full replicated stages) — a direct
    on-chip measurement of T_serial + T_parallel/D, missing only the
    collectives (accounted separately) and (1-1/D) of the insert
    scatter.  NOT a correct multi-chip program on this mesh — outputs
    are 1/D-partial by construction.
    """
    from ..core import imu as imu_mod
    from ..pipeline import lio

    n_dev = override_ndev or mesh.devices.size
    core = lio._make_step_core(cfg, plane_cache, spmd_axis=axis,
                               spmd_ndev=n_dev)

    def local(ls, w, acc_norm):
        def body(ls, xs):
            batch = imu_mod.ImuBatch(acc=xs.imu_acc, gyr=xs.imu_gyr,
                                     t=xs.imu_t, mask=xs.imu_mask)
            return core(ls, xs.pts, xs.pt_t, xs.pt_valid, batch,
                        xs.last_end_rel, xs.scan_end_t, acc_norm,
                        scan_valid=xs.scan_valid)

        ls, infos = jax.lax.scan(body, ls, w, unroll=unroll)
        return ls, infos

    ls_spec = jax.tree_util.tree_map(lambda _: P(), ls_example)
    w_spec = lio.WindowInputs(
        pts=P(None, axis), pt_t=P(None, axis), pt_valid=P(None, axis),
        imu_acc=P(), imu_gyr=P(), imu_t=P(), imu_mask=P(),
        last_end_rel=P(), scan_end_t=P(), scan_valid=P(),
    )
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(ls_spec, w_spec, P()),
        out_specs=(ls_spec, P()),
        check_vma=False,
    ), donate_argnums=(0,))


def spmd_comm_volume_per_scan(cfg, n_dev: int) -> dict:
    """Per-device ICI bytes for one scan of the production-parity SPMD
    window step (make_spmd_window_step_fn).  Ring accounting: an
    all_gather of global size S receives S(D-1)/D bytes per device; a
    psum (all-reduce) moves 2S(D-1)/D.

    vs the ownership-sharded tick (comm_volume_per_scan): the (n_ds, 10)
    moment-partial psum is GONE (each device reads its replica), leaving
    the raw-point all_gather + the per-iteration Gram/scalar psums + the
    insert delta-row all_gather — an order of magnitude less wire.
    """
    sh = cfg.shapes
    f = (n_dev - 1) / n_dev
    iters = cfg.ikdtree.max_iteration + 1  # worst-case ESIKF passes
    S_raw = sh.n_raw * 3 * 4  # undistorted f32 rows (bit-exact gather)
    S_gram = 8 * 8 * 4 + 2 * 4  # Gram + n_moved/n_val scalars
    budget = max(getattr(sh, "insert_mom_budget", 0), 1024)
    S_ins = budget * (13 * 4 + 4)  # delta rows (DMOM_CH+pad) + dst idx
    vol = {
        "all_gather_raw_points_bytes": S_raw * f,
        "psum_gram_bytes": 2 * S_gram * f * iters,
        "all_gather_insert_delta_bytes": S_ins * f,
        "n_devices": n_dev,
    }
    vol["steady_total_bytes_per_scan"] = sum(
        v for k, v in vol.items() if k.endswith("_bytes"))
    return vol


# ---------------------------------------------------------------------------
# Slab ownership + collective_permute repartitioning (SURVEY.md P6): the
# spatially-partitioned alternative to hash ownership.  Device d owns
# x-slabs with ((slab_index - shift) mod D) == d.  Slab ownership gives
# neighborhood locality (a query's 27-cell neighborhood spans at most 2
# adjacent slabs, so kNN partials need only neighbor exchanges instead
# of a full all_gather) at the price of load skew when the point density
# is anisotropic along x.
#
# Moving-FoV accounting: with `shift` FIXED, advancing the FoV cube
# needs NO migration at all — slabs entering the front are claimed by
# their cyclic owner on first insert, slabs leaving the rear are cropped
# locally — the same zero-communication property as hash ownership.
# `shift` exists for REBALANCING: rotating it by +1 reassigns every slab
# from owner d to d-1, a pure ring handoff, which sharded_slab_migrate
# executes as lax.ppermute steps (each device compacts the rows it no
# longer owns into a fixed-size buffer, sends it to its ring
# predecessor, tombstones them locally, and bulk-inserts the received
# rows).  This is the collective_permute map-shard migration path; the
# production default remains hash ownership (_owner_of), which never
# migrates.
# ---------------------------------------------------------------------------


def slab_owner(ijk: jax.Array, n_dev: int, shift, slab_log2: int = 4
               ) -> jax.Array:
    """Owning device of a voxel under x-slab partitioning: slabs of
    2^slab_log2 cells along x, cyclically assigned, rotated by `shift`."""
    slab = ijk[..., 0] >> slab_log2
    return jnp.mod(slab - shift, n_dev)


def sharded_slab_insert(mesh: Mesh, axis: str = "dp", slab_log2: int = 4,
                        max_probe: int = 16):
    """insert(m_sharded, shift, pts_world (N,3) replicated, valid) under
    slab ownership — each device claims only voxels it owns at `shift`."""
    n_dev = mesh.devices.size

    def local(m, shift, pts_world, valid):
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m)
        me = jax.lax.axis_index(axis)
        ijk = voxel_hash._voxel_of(pts_world, m_loc.voxel_size)
        mine = valid & (slab_owner(ijk, n_dev, shift, slab_log2) == me)
        m2 = voxel_hash.insert(m_loc, pts_world, mine, max_probe=max_probe)
        return jax.tree_util.tree_map(lambda a: a[None], m2)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis), check_vma=False,
    )


def sharded_slab_migrate(mesh: Mesh, axis: str = "dp", slab_log2: int = 4,
                         max_rows: int = 4096, max_probe: int = 16):
    """One collective_permute migration step: advance slab ownership to
    `shift_new` (old was shift_new - 1) and hand off rows ring-wise.

    Returns migrate(m_sharded, shift_new) -> (m_sharded', n_left,
    bytes_moved, n_lost): n_left counts rows still mis-owned after this
    step (buffer overflow — call again until 0; the per-step cap bounds
    both the ppermute payload and the compaction cost), bytes_moved the
    actual ICI payload this step (sum over devices of sent-row bytes),
    n_lost the rows whose receiver-side slot claim failed (probe-chain
    exhaustion — 0 in practice at sane load factors; the claim probes
    4x deeper than lookups because a lost row is lost map content).
    """
    n_dev = mesh.devices.size
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local(m, shift_new):
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m)
        me = jax.lax.axis_index(axis)
        C = m_loc.capacity
        has_mom = m_loc.mom is not None

        live = (m_loc.key & voxel_hash._LIVE_BIT) != 0
        coords = m_loc.coords  # from first stored point (live rows)
        owner = slab_owner(coords, n_dev, shift_new, slab_log2)
        send = live & (owner != me)

        sel = jnp.nonzero(send, size=max_rows, fill_value=C)[0].astype(
            jnp.int32)
        act = sel < C
        safe = jnp.minimum(sel, C - 1)
        b_coords = jnp.where(act[:, None], coords[safe], 0)
        b_count = jnp.where(act, m_loc.count[safe], 0)
        b_pts = jnp.where(act[:, None, None], m_loc.points[safe],
                          voxel_hash._SENTINEL)
        b_mom = (jnp.where(act[:, None], m_loc.mom[safe], 0.0)
                 if has_mom else None)

        # tombstone the handed-off rows (chains stay walkable)
        dst = jnp.where(act, sel, C)
        key = m_loc.key.at[dst].set(voxel_hash._KEY_TOMB, mode="drop")
        count = m_loc.count.at[dst].set(0, mode="drop")
        points = m_loc.points.at[dst].set(
            jnp.full((m_loc.bucket, 3), voxel_hash._SENTINEL,
                     m_loc.points.dtype), mode="drop")
        mom = (m_loc.mom.at[dst].set(0.0, mode="drop") if has_mom
               else None)
        m_loc = m_loc._replace(key=key, count=count, points=points, mom=mom)

        # ring handoff: every mis-owned row's new owner is me-1 exactly
        # (owner = (slab - shift) mod D and shift grew by 1)
        r_coords = jax.lax.ppermute(b_coords, axis, perm)
        r_count = jax.lax.ppermute(b_count, axis, perm)
        r_pts = jax.lax.ppermute(b_pts, axis, perm)
        r_act = jax.lax.ppermute(act, axis, perm)
        r_mom = (jax.lax.ppermute(b_mom, axis, perm) if has_mom else None)

        # bulk insert: claim a slot per received voxel (its center claims
        # the right cell), then write the rows wholesale — receivers
        # cannot already hold these voxels (single-owner invariant)
        vs = m_loc.voxel_size
        centers = (r_coords.astype(m_loc.points.dtype) + 0.5) * vs
        m2 = voxel_hash.insert(m_loc, centers, r_act,
                               max_probe=4 * max_probe, claim_only=True)
        slots = voxel_hash._lookup_slots(m2.key, r_coords, 4 * max_probe)
        okk = r_act & (slots >= 0)
        sdst = jnp.where(okk, slots, C)
        count = m2.count.at[sdst].set(r_count, mode="drop")
        points = m2.points.at[sdst].set(r_pts, mode="drop")
        mom = (m2.mom.at[sdst].set(r_mom, mode="drop") if has_mom
               else m2.mom)
        m2 = m2._replace(count=count, points=points, mom=mom)

        n_sent = jnp.sum(act.astype(jnp.int32))
        n_left = jax.lax.psum(
            jnp.sum((send.astype(jnp.int32))) - n_sent, axis)
        n_lost = jax.lax.psum(
            jnp.sum((r_act & (slots < 0)).astype(jnp.int32)), axis)
        # coords (3 int32) + count (1 int32) + bucket points + moments
        row_bytes = 12 + 4 + m_loc.bucket * 3 * 4 + (40 if has_mom else 0)
        bytes_moved = jax.lax.psum(n_sent * row_bytes, axis)
        return (jax.tree_util.tree_map(lambda a: a[None], m2), n_left,
                bytes_moved, n_lost)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()),
        out_specs=(P(axis), P(), P(), P()), check_vma=False,
    )


def comm_volume_per_scan(cfg, n_dev: int) -> dict:
    """Estimated per-device ICI bytes for one sharded scan tick
    (make_sharded_step_fn), by collective (SURVEY.md §7.3).  Ring
    accounting: all_gather of global size S receives S(D-1)/D bytes per
    device; psum (all-reduce) moves 2S(D-1)/D."""
    sh = cfg.shapes
    f = (n_dev - 1) / n_dev
    iters = cfg.ikdtree.max_iteration + 1  # worst-case ESIKF passes
    S_ds = sh.n_ds * 3 * 2  # int16 v2 wire quantization (POS_SCALE)
    S_mom = sh.n_ds * 10 * 4
    k = 5
    S_knn = sh.n_ds * k * (4 + 12)  # d2 + points partial top-k
    S_gram = 8 * 8 * 4
    vol = {
        "all_gather_downsample_bytes": S_ds * f,
        "psum_moment_partials_bytes": 2 * S_mom * f,
        "all_gather_knn_merge_bytes": S_knn * f * n_dev,  # (D,N,k) gather
        "psum_normal_eqs_bytes": 2 * S_gram * f * iters,
        "n_devices": n_dev,
    }
    vol["steady_total_bytes_per_scan"] = (
        vol["all_gather_downsample_bytes"]
        + vol["psum_moment_partials_bytes"]
        + vol["psum_normal_eqs_bytes"]
    )
    vol["warmup_total_bytes_per_scan"] = (
        vol["all_gather_downsample_bytes"]
        + vol["all_gather_knn_merge_bytes"]
        + vol["psum_normal_eqs_bytes"]
    )
    return vol


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
