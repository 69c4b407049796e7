"""LIO odometry pipeline — the TPU-native analog of the mapping main loop.

Orchestrates one scan tick (reference: src/laserMapping.cpp:2225-2460):

    IMU forward propagation + undistortion      (ImuProcess::Process)
    moving-FoV map crop                         (lasermap_fov_segment)
    scan voxel downsample                       (VoxelGrid, :2322)
    iterated ESIKF point-to-plane update        (update_iterated_dyn_share_modified)
    map incremental insert                      (map_incremental)

The entire tick is ONE jitted, static-shape device program; the host loop
only feeds padded scan/IMU buffers and reads back poses.  The sequential
scan-to-scan dependence is inherent to SLAM (SURVEY.md §7.3): per-chip
throughput comes from intra-scan batching, not scan parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LIOConfig
from ..core import esikf, imu, measurement
from ..core.state import State, identity_state, init_P
from ..map import voxel_hash
from ..ops.downsample import voxel_downsample
from ..utils import so3

__all__ = ["LIOState", "LIOPipeline", "make_step_fn", "make_window_step_fn"]

MOV_THRESHOLD = 1.5  # laserMapping.cpp MOV_THRESHOLD


class LIOState(NamedTuple):
    """Complete device-side filter state threaded through scan ticks."""

    x: State
    P: jax.Array
    map: voxel_hash.VoxelHashMap
    cube_lo: jax.Array  # (3,) local-map box
    cube_hi: jax.Array
    cube_init: jax.Array  # () bool
    last_acc_w: jax.Array  # (3,) terminal world acceleration of prev scan
    last_gyr_b: jax.Array  # (3,) terminal bias-corrected gyro of prev scan
    ekf_inited: jax.Array  # () bool — first scans only build the map


def _fov_segment(ls: LIOState, pos_lid: jax.Array, cube_len, det_range,
                 enabled: jax.Array | None = None,
                 skip_points: bool = False, no_crop: bool = False):
    """Moving-cube local map management (laserMapping.cpp:1136-1200).

    enabled=False (window padded-tail scans) suppresses the crop; the
    cube fields it returns are discarded by the caller's select.
    skip_points: see crop_outside_box (steady plane-cache program).
    no_crop=True (static) updates only the cube bookkeeping — the
    dense-moment steady program forgets by torus aliasing instead
    (IkdtreeConfig.mom_dense)."""
    half = cube_len / 2.0
    lo0 = pos_lid - half
    hi0 = pos_lid + half

    def init_case():
        return lo0, hi0, jnp.zeros(3, bool)

    def move_case():
        d_lo = jnp.abs(pos_lid - ls.cube_lo)
        d_hi = jnp.abs(ls.cube_hi - pos_lid)
        thr = MOV_THRESHOLD * det_range
        near_lo = d_lo <= thr
        near_hi = d_hi <= thr
        mov = jnp.maximum(
            (cube_len - 2.0 * MOV_THRESHOLD * det_range) * 0.45,
            det_range * (MOV_THRESHOLD - 1.0),
        )
        shift = jnp.where(near_lo, -mov, jnp.where(near_hi, mov, 0.0))
        return ls.cube_lo + shift, ls.cube_hi + shift, near_lo | near_hi

    lo, hi, moved = jax.lax.cond(ls.cube_init, move_case, init_case)
    if no_crop:
        return ls._replace(cube_lo=lo, cube_hi=hi,
                           cube_init=jnp.array(True))
    need_crop = ls.cube_init & jnp.any(moved)
    if enabled is not None:
        need_crop = need_crop & enabled
    # branch-free: the kill mask is gated on need_crop inside the crop (a
    # lax.cond identity branch carrying the map forces copy-on-write)
    m = voxel_hash.crop_outside_box(ls.map, lo, hi, enabled=need_crop,
                                    skip_points=skip_points)
    return ls._replace(map=m, cube_lo=lo, cube_hi=hi,
                       cube_init=jnp.array(True))


def _make_step_core(cfg: LIOConfig, plane_cache: bool | None = None,
                    spmd_axis: str | None = None, spmd_ndev: int = 1):
    """Build the (traceable, un-jitted) one-scan tick body.

    plane_cache overrides cfg.ikdtree.plane_cache when not None (the
    pipeline compiles a 5-NN warmup variant alongside the plane-cache
    step; see LIOPipeline).

    spmd_axis/spmd_ndev (multi-chip mode — parallel.sharded.
    make_spmd_window_step_fn): the body becomes the per-device program
    of a shard_map over a `spmd_ndev`-device mesh.  Layout: the MAP and
    filter state are REPLICATED (each chip holds the full voxel/moment
    tables — comm is provably not the limiter, the full-batch stages
    are; MULTICHIP.md), while the per-point work is sharded by QUERY
    rows: `pts`/`pt_t`/`pt_valid` arrive as this device's contiguous
    1/D shard of the raw scan, undistortion runs on the shard, one
    all_gather reassembles the batch (bit-exact — f32 rows), and the
    association + plane finalize + fused solve-row packing run on this
    device's 1/D slice of the downsampled batch with the 8x8 Gram
    psum'd per ESIKF iteration (156 floats).  The steady dense-moment
    insert shards its header-gather/delta arithmetic and all_gathers
    the budgeted delta rows so every replica applies one identical
    scatter (insert_dense_moments spmd mode).  Replicated (Amdahl
    serial) stages: IMU propagation (a strict per-scan recurrence),
    the voxel downsample (sort-based global dedupe), the scatter
    itself, and the tiny per-iteration gain algebra.  At spmd_ndev=1
    every collective is an identity and the program is the production
    single-chip step.

    core(ls, pts, pt_t, pt_valid, imu_batch, last_end_rel, scan_end_t,
         acc_norm) -> (ls', info_vec)

    pts: (n_raw, 3) lidar-frame points (already blind-culled/strided by
    the host preprocessor); pt_t: (n_raw,) per-point offsets (s) from scan
    begin; imu_batch times also relative to scan begin; scan_end_t: scan
    duration (s); last_end_rel: previous scan's end time relative to this
    scan's begin (host-computed in f64 — absolute epoch stamps never reach
    the device, where f32 would lose them).
    """
    sh = cfg.shapes
    mp = cfg.mapping
    dtype = jnp.dtype(cfg.dtype)
    if spmd_axis is not None:
        assert sh.n_raw % spmd_ndev == 0 and sh.n_ds % spmd_ndev == 0, (
            "spmd mode needs n_raw and n_ds divisible by the device "
            f"count (got {sh.n_raw}/{sh.n_ds} over {spmd_ndev})")
    Q = imu.build_Q(mp.gyr_cov, mp.acc_cov, mp.b_gyr_cov, mp.b_acc_cov, dtype)
    eff_pc = (getattr(cfg.ikdtree, "plane_cache", False)
              if plane_cache is None else plane_cache)
    steady = eff_pc and getattr(cfg.ikdtree, "plane_cache_warmup", 0) > 0
    # dense-moment steady program (IkdtreeConfig.mom_dense): association
    # reads the tag-validated torus moment table, the insert writes ONLY
    # that table, and the FoV crop is replaced by torus-wrap forgetting
    mom_dense = steady and getattr(cfg.ikdtree, "mom_dense", False)
    clip_hw = None  # per-axis insert window half-widths (mom_dense)
    if mom_dense:
        if sh.map_dense_log2 is None:
            # auto-size the torus from the detection geometry (see
            # derive_map_dense_log2) — the aliasing preconditions below
            # then hold by construction
            from ..config import derive_map_dense_log2

            sh.map_dense_log2 = derive_map_dense_log2(
                mp.det_range, cfg.ikdtree.filter_size_map_min)
        # insert_dense_moments assumes <= 1 point per voxel per batch
        # (its delta-scatter corrupts a cell written twice in one batch);
        # that contract holds exactly when the scan downsample leaf
        # equals the map voxel (the pre_grouped condition of the hash
        # insert)
        assert mp.surf_leaf_size == cfg.ikdtree.filter_size_map_min, (
            "mom_dense requires surf_leaf_size == filter_size_map_min "
            f"(got {mp.surf_leaf_size} vs "
            f"{cfg.ikdtree.filter_size_map_min})")
        # ... and the torus must span one scan's point extent per axis:
        # two distinct voxels of one insert batch must never alias to
        # the same torus cell, or insert_dense_moments' delta-scatter
        # (contrib - gathered old) silently corrupts dmom rows.  Points
        # reaching the map are within det_range of the sensor, so the
        # within-batch spread is <= 2*det_range horizontally — a hard
        # geometric bound for a 360-deg scanner, asserted.  Vertically
        # the spread is bounded by the lidar's vertical FoV, which the
        # config does not carry — a span below det_range (covers +-30
        # deg at full range) is a HARD ERROR unless the config opts into
        # map_dense_z_clip, which instead clips insert rows to a
        # sensor-centred z window of the span (alias-free by
        # construction; tall geometry beyond the window is simply not
        # mapped).  Cross-SCAN aliasing is handled by the cell tags +
        # torus-wrap forgetting, not here.
        for ax, lg in enumerate(sh.map_dense_log2):
            span = (1 << lg) * cfg.ikdtree.filter_size_map_min
            if ax < 2:
                assert 2.0 * mp.det_range <= span, (
                    f"mom_dense torus axis {ax} spans {span:.0f} m "
                    f"(2^{lg} cells x {cfg.ikdtree.filter_size_map_min} "
                    f"m) < 2*det_range = {2.0 * mp.det_range:.0f} m: "
                    "distinct voxels in one scan batch would alias; "
                    "raise shapes.map_dense_log2 or lower "
                    "mapping.det_range")
            elif span < mp.det_range:
                if not getattr(sh, "map_dense_z_clip", False):
                    raise ValueError(
                        f"mom_dense torus z axis spans {span:.0f} m < "
                        f"det_range = {mp.det_range:.0f} m: a scan whose "
                        "vertical spread exceeds the span would alias "
                        "distinct voxels within one insert batch and "
                        "corrupt the moment table.  Raise "
                        "shapes.map_dense_log2[2] (or leave "
                        "map_dense_log2=None to auto-size), or set "
                        "shapes.map_dense_z_clip=True to clip inserts "
                        "to a sensor-centred z window of the span "
                        "(narrow-vertical-FoV sensors)")
        # per-axis sensor-centred insert window, ALWAYS on for mom_dense
        # (one voxel of slack keeps the within-batch spread strictly
        # below the span): enforces the alias-freedom precondition even
        # for beyond-det_range returns — the det_range-based asserts
        # above bound the NORMAL scan extent, this window bounds every
        # scan.  The analog of the reference keeping its local map to
        # the FoV cube (laserMapping.cpp:1136-1200).
        clip_hw = tuple(
            0.5 * (1 << lg) * cfg.ikdtree.filter_size_map_min
            - cfg.ikdtree.filter_size_map_min
            for lg in sh.map_dense_log2)

    def step(
        ls: LIOState,
        pts: jax.Array,
        pt_t: jax.Array,
        pt_valid: jax.Array,
        imu_b: imu.ImuBatch,
        last_end_rel: jax.Array,
        scan_end_t: jax.Array,
        acc_norm: jax.Array,
        scan_valid: jax.Array | None = None,
    ):
        # scan_valid (window mode's padded-tail gate) is handled WITHOUT
        # a lax.cond around the body: a cond carrying the map through an
        # identity branch forces copy-on-write on every scatter inside
        # the window scan (~36 ms/window measured on v5e).  Instead the
        # inputs are sanitized — with every point/IMU row masked out the
        # map update is a bit-exact no-op — and the small state leaves
        # are select-ed at the end.
        ls_in = ls
        if scan_valid is not None:
            pt_valid = pt_valid & scan_valid
            imu_b = imu_b._replace(mask=imu_b.mask & scan_valid)

        # ---- IMU forward propagation + backward undistortion -------------
        x_prop, P_prop, poses = imu.propagate(
            ls.x, ls.P, imu_b, Q, acc_norm, last_end_rel, scan_end_t,
            ls.last_acc_w, ls.last_gyr_b,
        )
        pts_body = imu.undistort(x_prop, poses, pts, pt_t)
        # spmd_local_downsample (steady program only): each device
        # downsamples ITS raw shard to n_ds/D rows — the global sort
        # drops out of the serial fraction.  Deviation documented at
        # ShapesConfig.spmd_local_downsample; the insert de-duplicates
        # replace-rows (spmd_dedupe).
        local_ds = (spmd_axis is not None and mom_dense
                    and getattr(sh, "spmd_local_downsample", False))
        if spmd_axis is not None and not local_ds:
            # reassemble the full undistorted batch from the per-device
            # shards (device-order concat preserves row order; f32 rows
            # — bit-exact, ~n_raw*12*(D-1)/D bytes over ICI)
            pts_body = jax.lax.all_gather(
                pts_body, spmd_axis).reshape(-1, 3)
            pt_valid = jax.lax.all_gather(pt_valid, spmd_axis).reshape(-1)

        # ---- local map FoV crop around the lidar position -----------------
        pos_lid = x_prop.pos + so3.quat_rotate(x_prop.rot, x_prop.off_t)
        ls = _fov_segment(ls, pos_lid, mp.cube_len, mp.det_range,
                          enabled=scan_valid, skip_points=steady,
                          no_crop=mom_dense)

        # ---- scan downsample ---------------------------------------------
        # packed-key sort is valid when the sensor-frame extent fits the
        # 1024-cell wrap period (always at lidar ranges / usual leaves)
        pts_ds, ds_valid = voxel_downsample(
            pts_body, pt_valid, mp.surf_leaf_size,
            out_size=sh.n_ds // spmd_ndev if local_ds else sh.n_ds,
            packed_key=(2.2 * mp.det_range / mp.surf_leaf_size) < 1000.0,
            drop_high_z=getattr(sh, "ds_drop_high_z", False),
        )

        # ---- iterated ESIKF update ---------------------------------------
        if spmd_axis is not None and not local_ds:
            # query-sharded measurement: this device associates, plane-
            # fits and packs solve rows for ITS contiguous 1/D slice of
            # the downsampled batch; the Gram psum merges (P1)
            n_loc = sh.n_ds // spmd_ndev
            start = jax.lax.axis_index(spmd_axis) * n_loc
            pts_meas = jax.lax.dynamic_slice_in_dim(pts_ds, start, n_loc)
            val_meas = jax.lax.dynamic_slice_in_dim(ds_valid, start, n_loc)
        else:
            # single-chip, or local_ds (pts_ds is already this device's
            # n_ds/D-row share)
            pts_meas, val_meas = pts_ds, ds_valid
        measure, aux0 = measurement.make_measure_fn(
            ls.map,
            pts_meas,
            val_meas,
            extrinsic_est=mp.extrinsic_est_en,
            max_probe=sh.map_max_probe,
            n_neighbors=getattr(sh, "knn_neighbors", 27),
            single_association=getattr(cfg.ikdtree, "single_association",
                                       False),
            max_live=getattr(sh, "knn_max_live", 0),
            plane_cache=(
                getattr(cfg.ikdtree, "plane_cache", False)
                if plane_cache is None
                else plane_cache
            ),
            fused_solve=(eff_fused := (
                getattr(cfg.ikdtree, "fused_solve", True)
                and getattr(cfg.ikdtree, "single_association", False)
                and not mp.extrinsic_est_en
            )),
            early_converge=getattr(cfg.ikdtree, "early_converge", False),
            solve_compact=getattr(sh, "solve_compact", 0) // spmd_ndev,
            psum_axis=spmd_axis,
            assoc_cells=getattr(sh, "assoc_cells", "face7"),
        )

        def do_update(_):
            x_u, P_u, _, info_u = esikf.update_iterated(
                x_prop, P_prop, measure, aux0,
                max_iter=cfg.ikdtree.max_iteration,
                n_cols=12 if mp.extrinsic_est_en else 6,
                fused=eff_fused,
                psum_axis=spmd_axis,
            )
            return x_u, P_u, info_u["n_eff"].astype(dtype)

        def skip_update(_):
            return x_prop, P_prop, jnp.zeros((), dtype)

        n_valid = jnp.sum(ds_valid.astype(jnp.int32))
        if local_ds:  # global count (uniform gate across the mesh)
            n_valid = jax.lax.psum(n_valid, spmd_axis)
        can_update = ls.ekf_inited & (n_valid >= 5)  # laserMapping.cpp:2347
        x_post, P_post, n_eff = jax.lax.cond(can_update, do_update,
                                             skip_update, operand=None)

        # ---- map incremental insert --------------------------------------
        # when the scan leaf equals the map voxel, voxel_downsample's
        # centroids are one-per-map-voxel (each centroid stays inside its
        # own cell) — the insert can skip its group sort entirely.
        # Insert budgets apply only to the steady (post-warmup) program:
        # the warmup variant (plane_cache=False under a warmup split)
        # keeps the uncapped insert for the initial map-growth burst.
        pts_world = measurement.transform_to_world(x_post, pts_ds)
        if mom_dense:
            # steady dense-moment insert: ONE header gather + ONE
            # budgeted row scatter; hash keys / slot index / buckets are
            # left untouched (frozen at their warmup content, like
            # moments_only freezes the buckets)
            dshape = tuple(1 << b for b in sh.map_dense_log2) + (2,)
            budget = max(getattr(sh, "insert_mom_budget", 0), 1024)
            budget = -(-budget // spmd_ndev) * spmd_ndev  # divisible by D
            # per-axis sensor-centred insert window (see clip_hw above):
            # pos_lid is replicated arithmetic, so the gate is uniform
            # across an SPMD mesh.
            ins_valid = ds_valid
            for _ax in range(3):
                ins_valid = ins_valid & (
                    jnp.abs(pts_world[:, _ax] - pos_lid[_ax])
                    <= clip_hw[_ax])
            new_dmom, _ = voxel_hash.insert_dense_moments(
                ls.map.dmom, dshape, ls.map.voxel_size, pts_world,
                ins_valid,
                mom_cap=getattr(cfg.ikdtree, "mom_cap", 24),
                mom_budget=budget,
                spmd_axis=spmd_axis, spmd_ndev=spmd_ndev,
                spmd_pre_sliced=local_ds, spmd_dedupe=local_ds,
            )
            m = ls.map._replace(dmom=new_dmom)
        else:
            m = voxel_hash.insert(
                ls.map, pts_world, ds_valid, max_probe=sh.map_max_probe,
                pre_grouped=(
                    mp.surf_leaf_size == cfg.ikdtree.filter_size_map_min),
                claim_budget=(getattr(sh, "insert_claim_budget", 0)
                              if steady else 0),
                dense_budget=(getattr(sh, "insert_dense_budget", 0)
                              if steady else 0),
                # the steady plane-cache program's association reads only
                # mom/dense/key — skip the three bucket-append scatters
                # (the warmup program keeps appending so the 5-NN
                # fallback path has real points to search)
                moments_only=steady and ls.map.mom is not None,
                mom_cap=(getattr(cfg.ikdtree, "mom_cap", 0)
                         if ls.map.mom is not None else 0),
                mom_budget=(getattr(sh, "insert_mom_budget", 0)
                            if steady and ls.map.mom is not None else 0),
            )

        ls = LIOState(
            x=x_post,
            P=P_post,
            map=m,
            cube_lo=ls.cube_lo,
            cube_hi=ls.cube_hi,
            cube_init=ls.cube_init,
            last_acc_w=poses.acc_w[-1],  # frozen to last valid sample
            last_gyr_b=poses.gyr_b[-1],
            ekf_inited=jnp.array(True),
        )
        if scan_valid is not None:
            # restore the SMALL leaves for a padded scan (the map is
            # untouched by construction — every row was masked out)
            keep = lambda new, old: jnp.where(scan_valid, new, old)  # noqa: E731
            ls = ls._replace(
                x=jax.tree_util.tree_map(keep, ls.x, ls_in.x),
                P=keep(ls.P, ls_in.P),
                cube_lo=keep(ls.cube_lo, ls_in.cube_lo),
                cube_hi=keep(ls.cube_hi, ls_in.cube_hi),
                cube_init=keep(ls.cube_init, ls_in.cube_init),
                last_acc_w=keep(ls.last_acc_w, ls_in.last_acc_w),
                last_gyr_b=keep(ls.last_gyr_b, ls_in.last_gyr_b),
                ekf_inited=keep(ls.ekf_inited, ls_in.ekf_inited),
            )
        # Pack every per-scan output into ONE flat f32 vector: device->host
        # readback of small oddly-shaped arrays is pathologically slow on
        # the remote-TPU path (a (3,) readback can stall ~seconds), while a
        # single 1-D vector transfers in ~5 ms.  Layout (32 floats):
        #   [0:3]  post pos      [3:7]   post quat
        #   [7]    n_valid       [8]     map voxels
        #   [9:12] prop pos      [12:16] prop quat   (mat_pre analog,
        #          laserMapping.cpp:2358 — post-predict state)
        #   [16:19] vel  [19:22] bg  [22:25] ba  [25:28] grav
        #   [28:32] pad
        info_vec = jnp.concatenate(
            [
                x_post.pos.astype(jnp.float32),
                x_post.rot.astype(jnp.float32),
                jnp.stack(
                    [
                        n_valid.astype(jnp.float32),
                        voxel_hash.num_voxels(m).astype(jnp.float32),
                    ]
                ),
                x_prop.pos.astype(jnp.float32),
                x_prop.rot.astype(jnp.float32),
                x_post.vel.astype(jnp.float32),
                x_post.bg.astype(jnp.float32),
                x_post.ba.astype(jnp.float32),
                x_post.grav.astype(jnp.float32),
                # [28] valid measurement rows of the final ESIKF
                # iteration (association + robust-gate survivors) — the
                # hit-rate observable the hostile-workload report uses
                n_eff[None].astype(jnp.float32),
                jnp.zeros(3, jnp.float32),  # pad to 32
            ]
        )
        if scan_valid is not None:
            info_vec = jnp.where(scan_valid, info_vec, 0.0)
        return ls, info_vec

    return step


def make_step_fn(cfg: LIOConfig, plane_cache: bool | None = None):
    """Jitted single-scan tick (see _make_step_core for the signature)."""
    return jax.jit(_make_step_core(cfg, plane_cache), donate_argnums=(0,))


class WindowInputs(NamedTuple):
    """W scans' stacked tick inputs for the windowed step."""

    pts: jax.Array  # (W, n_raw, 3)
    pt_t: jax.Array  # (W, n_raw)
    pt_valid: jax.Array  # (W, n_raw)
    imu_acc: jax.Array  # (W, m_imu, 3)
    imu_gyr: jax.Array  # (W, m_imu, 3)
    imu_t: jax.Array  # (W, m_imu)
    imu_mask: jax.Array  # (W, m_imu)
    last_end_rel: jax.Array  # (W,)
    scan_end_t: jax.Array  # (W,)
    scan_valid: jax.Array  # (W,) bool


# Quantized wire format for the windowed step: the remote-TPU transport
# costs ~20-25 ms LATENCY per host->device transfer and ~35 MB/s, so the
# window's inputs ship as TWO buffers (tools/profile_micro3.py):
#   bulk (W, 3.5*n_raw) uint16 — cols [0,3n): point coords as int16
#        bits, quantized by POS_SCALE (lidar frame, |p| < ~120 m ->
#        3.7 mm steps, below lidar noise); cols [3n,3.5n): per-point
#        time as uint8 fractions of the scan duration, PACKED IN PAIRS
#        (lo|hi<<8).  0.39 ms time steps at 10 Hz: the undistortion pose
#        moves ~1 mm / ~0.01 deg per step at urban dynamics — below the
#        position quantization, for 12.5% fewer wire bytes (the tunnel's
#        ~35 MB/s is within ~20% of the steady compute rate, so wire
#        bytes bound the wall clock whenever the link dips).
#   meta (W, 8*m_imu + 4) f32 — imu acc|gyr|t|mask rows then
#        [n_points, last_end_rel, scan_end_t, scan_valid].
POS_SCALE = 120.0 / 32767.0  # ~3.66 mm/step, +-120 m range


class QuantWindowInputs(NamedTuple):
    bulk: jax.Array  # (W, 3.5*n_raw) uint16
    meta: jax.Array  # (W, 8*m_imu + 4) f32 — padded window tail entries skip


def make_window_step_fn(cfg: LIOConfig, window: int,
                        plane_cache: bool | None = None,
                        quantized: bool = False,
                        unroll: int = 1):
    """Jitted W-scan device loop: lax.scan of the tick inside ONE program.

    The remote-TPU transport costs ~1.4 ms per program launch and a
    ~30 ms round trip per host readback (tools/profile_micro3.py); at
    10 Hz scan rate that overhead alone caps per-scan dispatch at ~19
    scans/s.  Batching W sequential scans into one program amortises the
    launch, the host->device input transfer, and the info readback W-fold
    while keeping the scan-to-scan recurrence exact (the lax.scan carries
    the full filter state).  Latency grows by W scan periods — use
    window=1 for online/interactive runs, larger for offline throughput.
    """
    core = _make_step_core(cfg, plane_cache)
    n_raw = cfg.shapes.n_raw
    m_imu = cfg.shapes.n_imu
    dtype = jnp.dtype(cfg.dtype)

    def body_of(xs, ls, acc_norm):
        batch = imu.ImuBatch(acc=xs.imu_acc, gyr=xs.imu_gyr,
                             t=xs.imu_t, mask=xs.imu_mask)
        # NO lax.cond around the tick: an identity branch carrying the
        # map forces copy-on-write on every scatter in the scan body
        # (~36 ms/window on v5e); the core handles scan_valid by input
        # sanitization + small-leaf selects instead.
        return core(ls, xs.pts, xs.pt_t, xs.pt_valid, batch,
                    xs.last_end_rel, xs.scan_end_t, acc_norm,
                    scan_valid=xs.scan_valid)

    if not quantized:

        @partial(jax.jit, donate_argnums=(0,))
        def wstep(ls: LIOState, w: WindowInputs, acc_norm: jax.Array):
            def body(ls, xs):
                return body_of(xs, ls, acc_norm)

            ls, infos = jax.lax.scan(body, ls, w, unroll=unroll)
            return ls, infos  # infos: (W, 16)

        return wstep

    @partial(jax.jit, donate_argnums=(0,))
    def wstep_q(ls: LIOState, q: QuantWindowInputs, acc_norm: jax.Array):
        def body(ls, row):
            bulk, meta = row
            qp = jax.lax.bitcast_convert_type(
                bulk[: 3 * n_raw], jnp.int16
            ).astype(dtype).reshape(n_raw, 3)
            n = meta[8 * m_imu + 0].astype(jnp.int32)
            last_end_rel = meta[8 * m_imu + 1]
            scan_end_t = meta[8 * m_imu + 2]
            scan_valid = meta[8 * m_imu + 3] > 0.5
            pts = qp * jnp.asarray(POS_SCALE, dtype)
            tw = bulk[3 * n_raw: 3 * n_raw + n_raw // 2]
            t8 = jnp.stack(
                [tw & jnp.uint16(0xFF), tw >> 8], axis=1
            ).reshape(n_raw)
            pt_t = t8.astype(dtype) * (scan_end_t / 255.0)
            pt_valid = jnp.arange(n_raw) < n
            im = meta[: 8 * m_imu].reshape(m_imu, 8)
            imu_t = jnp.where(im[:, 7] > 0.5, im[:, 6], jnp.inf)
            xs = WindowInputs(
                pts=pts, pt_t=pt_t, pt_valid=pt_valid,
                imu_acc=im[:, 0:3], imu_gyr=im[:, 3:6],
                imu_t=imu_t, imu_mask=im[:, 7] > 0.5,
                last_end_rel=last_end_rel, scan_end_t=scan_end_t,
                scan_valid=scan_valid,
            )
            return body_of(xs, ls, acc_norm)

        ls, infos = jax.lax.scan(body, ls, (q.bulk, q.meta),
                                 unroll=unroll)
        return ls, infos

    return wstep_q


class LIOPipeline:
    """Host-side driver: IMU init bookkeeping + jitted scan ticks.

    The analog of the reference main() loop state machine: the first
    MAX_INI_COUNT IMU packets run static initialisation
    (IMU_Processing.hpp:393-433), after which every scan executes the
    jitted tick.
    """

    MAX_INI_COUNT = 10  # IMU_Processing.hpp:4

    def __init__(self, cfg: LIOConfig, pipelined: bool = False,
                 window: int = 1, quantized: bool = False,
                 readback_depth: int = 1, unroll: int = 1,
                 mesh=None):
        """pipelined=True overlaps the device->host pose readback with the
        next scan's compute: process_scan then returns the PREVIOUS scan's
        result (one-scan latency on the odometry stream, as a ROS
        subscriber would see anyway).  The readback round trip costs
        ~30 ms on the remote-TPU path, so hiding it matters.

        window=W > 1 batches W sequential scans into ONE device program
        (make_window_step_fn) — results come back W scans late, one
        readback per window.  This is the offline/throughput mode; the
        per-scan odometry stream (trajectory, returned dicts) is
        identical, just delayed.

        quantized=True (window mode only) ships window inputs as the
        compact uint16 wire format (QuantWindowInputs): ~2x fewer bytes
        and 2 transfers per window instead of ~10 — the remote-TPU
        transport pays ~20-25 ms latency PER transfer at ~35 MB/s, which
        otherwise rivals the compute itself.  Quantization steps are
        3.7 mm (points) / scan_duration/255 (times, uint8 pairs) — below sensor
        noise.

        readback_depth=D > 1 (pipelined window mode) keeps up to D
        windows' info vectors pending on device and fetches them with ONE
        device-side concatenation + ONE host readback: the remote
        transport's ~24 ms readback round trip is paid once per D windows
        instead of once per window.  Results lag by up to D*W scans.

        unroll > 1 unrolls the window's lax.scan body (jax scan unroll):
        ~0.5 ms/scan less loop overhead at unroll=window, at the price of
        a window-times-larger program to compile.

        mesh: a jax.sharding.Mesh — window mode only.  The window
        programs become the PRODUCTION-parity multi-chip SPMD step
        (parallel.sharded.make_spmd_window_step_fn: map replicated,
        per-point work query-sharded over the mesh, Gram psum'd) —
        measured at 0.993x the single-chip program on a 1-device mesh.
        Quantized wire mode is not combined with a mesh (host-side
        shard feeding owns the wire format on a real multi-host slice)."""
        self.cfg = cfg
        self.dtype = jnp.dtype(cfg.dtype)
        self.window = int(window)
        self.mesh = mesh
        if mesh is not None:
            assert self.window > 1 and not quantized, (
                "mesh mode: use window>1 and the unquantized wire")
        self.quantized = bool(quantized)
        if self.quantized:
            # the uint8 time-pair wire format packs times two-per-uint16:
            # fail loudly at construction, not at device-side unpack
            assert cfg.shapes.n_raw % 2 == 0, (
                "quantized window mode requires an even shapes.n_raw "
                f"(got {cfg.shapes.n_raw})")
        # quantized at window=1 runs the window machinery with W=1: the
        # compact 2-transfer wire + pipelined readback at per-scan
        # latency — the ONLINE operating point (tools/bench_latency.py)
        self._use_window = self.window > 1 or self.quantized
        self.unroll = max(1, int(unroll))
        self._step = make_step_fn(cfg) if not self._use_window else None
        if mesh is not None:
            self._wstep = self._make_spmd_wstep(None)
        else:
            self._wstep = (
                make_window_step_fn(cfg, self.window,
                                    quantized=self.quantized,
                                    unroll=self.unroll)
                if self._use_window else None
            )
        # plane-cache warmup: run the 5-NN association for the first
        # `plane_cache_warmup` scans while the moment cache densifies
        # (its n>=5 gate starves on a young map), then switch programs
        self._warmup_scans = (
            int(getattr(cfg.ikdtree, "plane_cache_warmup", 0))
            if getattr(cfg.ikdtree, "plane_cache", False)
            else 0
        )
        if self._warmup_scans > 0:
            if not self._use_window:
                self._step_warm = make_step_fn(cfg, plane_cache=False)
            elif mesh is not None:
                self._wstep_warm = self._make_spmd_wstep(False)
            else:
                self._wstep_warm = make_window_step_fn(
                    cfg, self.window, plane_cache=False,
                    quantized=self.quantized, unroll=self.unroll,
                )
        if getattr(cfg.ikdtree, "mom_dense", False):
            assert (getattr(cfg.ikdtree, "plane_cache", False)
                    and self._warmup_scans > 0
                    and cfg.shapes.map_dense_log2 is not None), (
                "mom_dense requires plane_cache, plane_cache_warmup > 0 "
                "and shapes.map_dense_log2")
        self._init_acc: list[np.ndarray] = []
        self._init_gyr: list[np.ndarray] = []
        self.inited = False
        self.acc_norm = 9.81
        self.ls: LIOState | None = None
        self.last_scan_end_abs: float | None = None  # f64 host-side clock
        self.trajectory: list[np.ndarray] = []
        self.pipelined = pipelined
        self.readback_depth = max(1, int(readback_depth))
        self._pending_info = None
        self._wbuf: list[tuple] = []  # buffered scans of the open window
        self._pending_ws: list[tuple] = []  # [(infos handle, n_valid)]
        self._results: list[dict] = []  # completed per-scan dicts (FIFO)

    def _make_spmd_wstep(self, plane_cache):
        """Lazy per-pytree-structure SPMD window program (the LIOState
        structure changes when the dense moment table attaches at the
        warmup->steady handoff)."""
        from ..parallel.sharded import make_spmd_window_step_fn

        cache = {}

        def wstep(ls, win, acc_norm):
            key = jax.tree_util.tree_structure(ls)
            if key not in cache:
                cache[key] = make_spmd_window_step_fn(
                    self.cfg, self.mesh, self.window, ls,
                    plane_cache=plane_cache, unroll=self.unroll)
            return cache[key](ls, win, acc_norm)

        return wstep

    # -- init ---------------------------------------------------------------
    def _make_ls(self, x: State, P) -> LIOState:
        sh = self.cfg.shapes
        m = voxel_hash.make_map(
            capacity_log2=sh.map_capacity_log2,
            bucket=sh.map_bucket,
            voxel_size=self.cfg.ikdtree.filter_size_map_min,
            dtype=self.dtype,
            dense_log2=getattr(sh, "map_dense_log2", None),
            moments=getattr(self.cfg.ikdtree, "plane_cache", False),
        )
        # NB: distinct arrays per field — the step donates its input state,
        # and XLA rejects donating one buffer under two aliases.
        def z3():
            return jnp.zeros(3, self.dtype)

        return LIOState(
            x=x,
            P=P,
            map=m,
            cube_lo=z3(),
            cube_hi=z3(),
            cube_init=jnp.array(False),
            last_acc_w=z3(),
            last_gyr_b=z3(),
            ekf_inited=jnp.array(False),
        )

    def reset_map_from_world_points(self, world_pts: np.ndarray) -> None:
        """Rebuild the local map from corrected world-frame points — the
        recontructIKdTree-after-correctPoses analog (laserMapping.cpp:
        797-800): after a loop-closure pose jump the old map is in the
        drifted odometry frame and matching against it would fight the
        correction.  Also re-centers the FoV cube on the corrected pose
        (a large jump could otherwise land outside the old cube and the
        next crop would kill the fresh map)."""
        sh = self.cfg.shapes
        m = voxel_hash.make_map(
            capacity_log2=sh.map_capacity_log2,
            bucket=sh.map_bucket,
            voxel_size=self.cfg.ikdtree.filter_size_map_min,
            dtype=self.dtype,
            dense_log2=getattr(sh, "map_dense_log2", None),
            moments=self.ls.map.mom is not None,
        )
        chunk = sh.n_ds
        world_pts = np.asarray(world_pts, np.float32)
        for i in range(0, len(world_pts), chunk):
            blk = world_pts[i:i + chunk]
            buf = np.zeros((chunk, 3), np.float32)
            buf[: len(blk)] = blk
            valid = np.zeros(chunk, bool)
            valid[: len(blk)] = True
            m = voxel_hash.insert(m, jnp.asarray(buf, self.dtype),
                                  jnp.asarray(valid),
                                  max_probe=sh.map_max_probe)
        ls = self.ls
        pos_lid = np.asarray(
            ls.x.pos + so3.quat_rotate(ls.x.rot, ls.x.off_t), np.float64)
        half = self.cfg.mapping.cube_len / 2.0
        if ls.map.dmom is not None:
            # the steady dense-moment program needs its table rebuilt
            # from the fresh map's slot moments (same handoff as
            # _ensure_dmom, re-centered on the corrected pose)
            m = m._replace(dmom=voxel_hash.build_dense_moments(m, pos_lid))
        self.ls = ls._replace(
            map=m,
            cube_lo=jnp.asarray(pos_lid - half, self.dtype),
            cube_hi=jnp.asarray(pos_lid + half, self.dtype),
            cube_init=jnp.array(True),
        )

    def _ensure_dmom(self):
        """Warmup→steady handoff for the dense-moment fast path: build
        the (G, DMOM_CH) torus moment table from the warmup map's slot
        moments, once, right before the first steady-program dispatch."""
        if not getattr(self.cfg.ikdtree, "mom_dense", False):
            return
        if self.ls.map.dmom is not None:
            return
        center = np.asarray((self.ls.cube_lo + self.ls.cube_hi) * 0.5)
        dmom = voxel_hash.build_dense_moments(self.ls.map, center)
        self.ls = self.ls._replace(map=self.ls.map._replace(dmom=dmom))

    def _try_init(self, imu_acc: np.ndarray, imu_gyr: np.ndarray) -> bool:
        self._init_acc.append(imu_acc)
        self._init_gyr.append(imu_gyr)
        n = sum(len(a) for a in self._init_acc)
        if n <= self.MAX_INI_COUNT:
            return False
        acc = np.concatenate(self._init_acc)
        gyr = np.concatenate(self._init_gyr)
        mpc = self.cfg.mapping
        off_r = so3.matrix_to_quat(
            jnp.asarray(np.array(mpc.extrinsic_R, float).reshape(3, 3),
                        self.dtype)
        )
        off_t = jnp.asarray(np.array(mpc.extrinsic_T, float), self.dtype)
        x0, P0, acc_norm = imu.imu_init(
            jnp.asarray(acc, self.dtype),
            jnp.asarray(gyr, self.dtype),
            jnp.ones(len(acc), bool),
            off_r,
            off_t,
            self.dtype,
        )
        self.acc_norm = float(acc_norm)
        self.ls = self._make_ls(x0, P0)
        self.inited = True
        return True

    # -- per scan -----------------------------------------------------------
    def process_scan(
        self,
        pts: np.ndarray,
        pt_t: np.ndarray,
        imu_acc: np.ndarray,
        imu_gyr: np.ndarray,
        imu_t: np.ndarray,
        scan_beg_abs: float,
        scan_end_t: float,
    ):
        """Feed one synchronized measurement group (sync_packages analog).

        pts (n,3) lidar frame; pt_t (n,) seconds from scan begin;
        imu_t seconds from scan begin (sample 0 should be the tail of the
        previous packet).  Returns an info dict or None while initialising.
        """
        # sensor-stream sanity (laserMapping.cpp:1209-1213, 1241-1244,
        # 1316-1320): a timestamp regression means the source looped back
        # (bag restart) — drop the group, like the reference clears its
        # buffers; gross lidar/IMU desync is warned once per occurrence.
        if (self.last_scan_end_abs is not None
                and scan_beg_abs + scan_end_t < self.last_scan_end_abs - 1e-6):
            import sys as _sys
            print("lidar loop back, skipping scan group", file=_sys.stderr)
            self.last_scan_end_abs = scan_beg_abs + scan_end_t
            return None
        imu_t = np.asarray(imu_t)
        if imu_t.size > 1 and np.any(np.diff(imu_t) < -1e-6):
            import sys as _sys
            print("imu loop back, skipping scan group", file=_sys.stderr)
            return None
        if imu_t.size and abs(float(imu_t[-1]) - scan_end_t) > 10.0:
            import sys as _sys
            print(
                f"IMU and LiDAR not synced ({float(imu_t[-1]):.1f}s vs "
                f"{scan_end_t:.1f}s scan end)", file=_sys.stderr)

        if not self.inited:
            init_done = self._try_init(imu_acc, imu_gyr)
            self.last_scan_end_abs = scan_beg_abs + scan_end_t
            del init_done
            return None

        if getattr(self.cfg.preprocess, "feature_extract_enable", False):
            from ..io.features import feature_filter

            pts, pt_t = feature_filter(
                np.asarray(pts, np.float32), np.asarray(pt_t),
                n_rings=self.cfg.preprocess.scan_line,
            )

        P, T, V = self._pad_points(pts, pt_t)
        A, G, Tt, Mk = self._pad_imu(imu_acc, imu_gyr, imu_t)

        # periodic map compaction (recontructIKdTree analog,
        # laserMapping.cpp:612-669): rebuild when the tombstone fraction
        # left by FoV crops grows, at kd_step cadence
        self._scan_count = getattr(self, "_scan_count", 0) + 1
        kd = self.cfg.ikdtree
        if kd.recontruct_kdtree and self._scan_count % max(kd.kd_step, 1) == 0:
            from ..map.voxel_hash import rebuild, tombstone_fraction

            if float(tombstone_fraction(self.ls.map)) > 0.1:
                # cube center keys the coord unwrap so point-less
                # (moments_only) voxels survive with their moments
                center = np.asarray(
                    (self.ls.cube_lo + self.ls.cube_hi) * 0.5)
                self.ls = self.ls._replace(
                    map=rebuild(self.ls.map, center=center))

        last_end_rel = (
            (self.last_scan_end_abs - scan_beg_abs)
            if self.last_scan_end_abs is not None
            else 0.0
        )
        self.last_scan_end_abs = scan_beg_abs + scan_end_t

        if self._use_window:
            if self.quantized:
                self._wbuf.append(self._pack_quant(
                    P, T, V, A, G, Tt, Mk, last_end_rel, scan_end_t))
            else:
                self._wbuf.append((P, T, V, A, G, Tt, Mk,
                                   last_end_rel, scan_end_t))
            if len(self._wbuf) == self.window:
                self._dispatch_window()
            return self._results.pop(0) if self._results else None

        batch = imu.ImuBatch(
            acc=jnp.asarray(A), gyr=jnp.asarray(G), t=jnp.asarray(Tt),
            mask=jnp.asarray(Mk),
        )
        if self._scan_count > self._warmup_scans:
            self._ensure_dmom()
        step = (
            self._step_warm
            if self._scan_count <= self._warmup_scans
            else self._step
        )
        self.ls, info_vec = step(
            self.ls,
            jnp.asarray(P),
            jnp.asarray(T),
            jnp.asarray(V),
            batch,
            jnp.asarray(last_end_rel, self.dtype),
            jnp.asarray(scan_end_t, self.dtype),
            jnp.asarray(self.acc_norm, self.dtype),
        )
        if self.pipelined:
            try:  # overlap the result's host copy with the next scan
                info_vec.copy_to_host_async()
            except AttributeError:
                pass
            prev, self._pending_info = self._pending_info, info_vec
            if prev is None:
                return None
            info_vec = prev
        return self._record(np.asarray(info_vec))  # single flat readback

    # -- padding helpers ------------------------------------------------------
    def _pad_points(self, pts, pt_t):
        sh = self.cfg.shapes
        n = len(pts)
        n_pad = sh.n_raw
        if n > n_pad:
            stride = -(-n // n_pad)
            pts, pt_t = pts[::stride][:n_pad], pt_t[::stride][:n_pad]
            n = len(pts)
        P = np.zeros((n_pad, 3), self.dtype)
        T = np.zeros(n_pad, self.dtype)
        V = np.zeros(n_pad, bool)
        P[:n], T[:n], V[:n] = pts, pt_t, True
        return P, T, V

    def _pad_imu(self, imu_acc, imu_gyr, imu_t):
        m_imu = self.cfg.shapes.n_imu
        k = min(len(imu_acc), m_imu)
        A = np.zeros((m_imu, 3), self.dtype)
        G = np.zeros((m_imu, 3), self.dtype)
        Tt = np.full(m_imu, np.inf, self.dtype)
        Mk = np.zeros(m_imu, bool)
        A[:k], G[:k], Tt[:k], Mk[:k] = (
            imu_acc[:k], imu_gyr[:k], imu_t[:k], True,
        )
        return A, G, Tt, Mk

    def _pack_quant(self, P, T, V, A, G, Tt, Mk, last_end_rel, scan_end_t):
        """One scan -> (bulk uint16 row, meta f32 row); see
        QuantWindowInputs for the layout."""
        sh = self.cfg.shapes
        n_raw, m_imu = sh.n_raw, sh.n_imu
        dur = max(float(scan_end_t), 1e-9)
        from ..io.native import pack_quant_bulk

        bulk = pack_quant_bulk(P, T, POS_SCALE, dur)  # C++ fast path
        if bulk is None:
            bulk = np.zeros(3 * n_raw + n_raw // 2, np.uint16)
            qp = np.clip(np.round(P / POS_SCALE), -32767,
                         32767).astype(np.int16)
            bulk[: 3 * n_raw] = qp.reshape(-1).view(np.uint16)
            t8 = np.clip(np.round(T / dur * 255.0), 0, 255).astype(np.uint16)
            bulk[3 * n_raw:] = t8[0::2] | (t8[1::2] << 8)
        meta = np.zeros(8 * m_imu + 4, np.float32)
        im = meta[: 8 * m_imu].reshape(m_imu, 8)
        im[:, 0:3] = A
        im[:, 3:6] = G
        im[:, 6] = np.where(Mk, Tt, 0.0)
        im[:, 7] = Mk
        meta[8 * m_imu:] = [float(V.sum()), last_end_rel, scan_end_t, 1.0]
        return bulk, meta

    def _record(self, v: np.ndarray) -> dict:
        out = {
            "pos": v[0:3],
            "quat": v[3:7],
            "n_ds": int(v[7]),
            "map_voxels": int(v[8]),
            "prop_pos": v[9:12],  # post-predict state (mat_pre analog)
            "prop_quat": v[12:16],
            "vel": v[16:19],
            "bg": v[19:22],
            "ba": v[22:25],
            "grav": v[25:28],
            "n_eff": int(v[28]),
        }
        self.trajectory.append(v[0:7].copy())
        return out

    # -- window mode ----------------------------------------------------------
    def _dispatch_window(self):
        """Launch the buffered scans as one W-scan device program."""
        W = self.window
        buf, self._wbuf = self._wbuf, []
        n_valid = len(buf)
        while len(buf) < W:  # pad the tail (flush of a partial window)
            z = buf[-1]
            buf.append(tuple(np.zeros_like(a) if isinstance(a, np.ndarray)
                             else 0.0 for a in z))
        cols = list(zip(*buf))
        if self.quantized:
            win = QuantWindowInputs(
                bulk=jnp.asarray(np.stack(cols[0])),
                meta=jnp.asarray(np.stack(cols[1])),
            )
        else:
            win = WindowInputs(
                pts=jnp.asarray(np.stack(cols[0])),
                pt_t=jnp.asarray(np.stack(cols[1])),
                pt_valid=jnp.asarray(np.stack(cols[2])),
                imu_acc=jnp.asarray(np.stack(cols[3])),
                imu_gyr=jnp.asarray(np.stack(cols[4])),
                imu_t=jnp.asarray(np.stack(cols[5])),
                imu_mask=jnp.asarray(np.stack(cols[6])),
                last_end_rel=jnp.asarray(np.array(cols[7], self.dtype)),
                scan_end_t=jnp.asarray(np.array(cols[8], self.dtype)),
                scan_valid=jnp.asarray(
                    np.arange(W) < n_valid
                ),
            )
        # warmup windows (rounded up to whole windows) use the 5-NN step
        done = getattr(self, "_scans_dispatched", 0)
        self._scans_dispatched = done + n_valid
        if done >= self._warmup_scans:
            self._ensure_dmom()
        wstep = (
            self._wstep_warm if done < self._warmup_scans else self._wstep
        )
        self.ls, infos = wstep(
            self.ls, win, jnp.asarray(self.acc_norm, self.dtype)
        )
        # start the (tiny, W x 29 f32) result's host copy NOW: the
        # remote transport's ~24 ms round trip then overlaps the next
        # scan's host-side packing + H2D instead of being paid
        # synchronously inside poll()/_consume_pending — the W=1 online
        # path otherwise serializes a full round trip per scan
        try:
            infos.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_ws.append((infos, n_valid))
        if not self.pipelined:
            self._consume_pending(self._pending_ws)
            self._pending_ws = []
        elif len(self._pending_ws) > self.readback_depth:
            # fetch every COMPLETED window (all but the one just
            # dispatched) in one batched readback; the just-dispatched
            # window stays pending so the fetch never waits on compute
            ready, self._pending_ws = (self._pending_ws[:-1],
                                       self._pending_ws[-1:])
            self._consume_pending(ready)

    def _consume_pending(self, pending: list[tuple]):
        if not pending:
            return
        if len(pending) == 1:
            vs = [np.asarray(pending[0][0])]  # ONE readback for the window
        else:
            # ONE device-side concat + ONE readback for ALL windows: the
            # remote transport pays its ~24 ms round trip once, not per
            # window
            stacked = np.asarray(
                jnp.concatenate([p[0] for p in pending], axis=0))
            vs, off = [], 0
            for infos, _ in pending:
                w = infos.shape[0]
                vs.append(stacked[off:off + w])
                off += w
        for v, (_, n_valid) in zip(vs, pending):
            for i in range(n_valid):
                self._results.append(self._record(v[i]))

    def poll(self) -> int:
        """Harvest every pending pipelined window readback NOW (blocks
        until the device finishes them) without feeding a scan — the
        online low-latency path: after dispatching scan k, call poll()
        during the idle gap before scan k+1 arrives and k's pose is out
        ~(device step + transport) after arrival instead of one full
        scan period later.  Window mode only; returns the number of
        results made available (popped via the next process_scan, or
        directly from `_results`/`trajectory`)."""
        if not self._use_window or not self._pending_ws:
            return 0
        p, self._pending_ws = self._pending_ws, []
        n0 = len(self._results)
        self._consume_pending(p)
        return len(self._results) - n0

    def flush(self):
        """Drain buffered scans and pipelined readbacks (call at end).

        Returns the final scan's result dict (or None if nothing pending);
        all drained results are appended to `trajectory` in order.
        """
        if self._use_window:
            if self._wbuf:
                self._dispatch_window()
            if self._pending_ws:
                p, self._pending_ws = self._pending_ws, []
                self._consume_pending(p)
            out = self._results[-1] if self._results else None
            self._results = []
            return out
        if self._pending_info is None:
            return None
        v = np.asarray(self._pending_info)
        self._pending_info = None
        return self._record(v)
