"""Full SLAM pipeline: LIO front end + keyframes + loops + pose graph.

The back-end orchestration of the reference's mapping node (reference:
src/laserMapping.cpp):

  saveFrame                 :525-547  keyframe gating (dist/angle)
  addOdomFactor             :550-582  odom between-factors
  performLoopClosure        :890-1018 radius+time candidate, submaps,
                                      Scan Context gate, yaw pre-align,
                                      ICP verify, loop factor
  saveKeyFramesAndFactor    :680-766  optimize, feed pose back to filter
  correctPoses              :769-805  rewrite keyframe poses after loop

The reference runs loop closure on a 1 Hz std::thread sharing state
under a mutex (P4 in SURVEY.md §2.6); here the sync mode runs it every
`loop_every` keyframes (same semantics, deterministic schedule), and
async_backend=True moves detection + SC gating + ICP verification onto
a worker thread (the loopClosureThread analog) with verified factors
applied by the feed thread on poll — the feed thread never blocks on a
loop attempt.  The device work (SC descriptors, ICP, pose-graph GN) is
jitted; bookkeeping (keyframe clouds, timestamps) lives on the host.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..backend import posegraph as pg
from ..config import LIOConfig
from ..ops import icp as icp_ops
from ..ops import scancontext as sc
from ..utils import se3, so3
from .lio import LIOPipeline

__all__ = ["SLAMPipeline"]


@dataclass
class Keyframe:
    idx: int
    t: float
    pose: np.ndarray  # (7,) current best estimate [wxyz|t]
    odom_pose: np.ndarray  # (7,) pose at creation (odometry frame)
    cloud: np.ndarray  # (n, 3) body-frame downsampled points
    desc: np.ndarray  # (20, 60) scan context


class SLAMPipeline:
    """LIOPipeline + pose-graph backend, mirroring the mapping node."""

    def __init__(self, cfg: LIOConfig, max_keyframes: int = 2048,
                 loop_every: int = 5, sc_params: sc.SCParams | None = None,
                 async_backend: bool = False,
                 lio_kwargs: dict | None = None,
                 backend_on_host: bool = False):
        """async_backend=True dispatches pose-graph optimization without
        blocking the front end (the reference's 1 Hz loop thread, P4);
        corrections are applied on a later scan when the result is ready.

        lio_kwargs forwards extra LIOPipeline options (window=W,
        quantized=True, unroll=W — the bench.py throughput
        configuration); outputs then lag by up to a window and the scan
        FIFO below keeps keyframing paired with the right raw points.

        backend_on_host=True pins the backend's device work (SC
        descriptors, loop ICP, pose-graph GN) to the host CPU backend —
        the reference's architecture exactly (its backend is a CPU
        thread, gtsam/PCL: laserMapping.cpp:1021-1038, 2216), keeping
        the accelerator queue free for the front-end stream.  Off =
        everything runs on the default (TPU) backend."""
        self.cfg = cfg
        # pipelined LIO hides the per-scan device->host readback behind the
        # next scan's compute; outputs then describe a PREVIOUS scan, so
        # keyframing pairs each result with its raw points via a FIFO
        # (depth 1 when pipelined, up to ~2 windows in window mode)
        self.lio = LIOPipeline(cfg, pipelined=True, **(lio_kwargs or {}))
        from collections import deque

        self._scan_fifo = deque()
        self._host_dev = None
        if backend_on_host:
            import jax

            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                # cpu backend not initialised (JAX_PLATFORMS pinned to a
                # single plugin) — fall back to the default device
                cpus = []
            self._host_dev = cpus[0] if cpus else None
        self.sc_params = sc_params or sc.SCParams()
        self.keyframes: list[Keyframe] = []
        self.loop_pairs: list[tuple[int, int, float]] = []  # (i, j, fitness)
        self.loop_every = loop_every
        self._kf_count_at_last_loop = 0
        self.graph = pg.make_graph(
            max_poses=max_keyframes,
            max_priors=8,
            max_between=4 * max_keyframes,
            max_gps=(max_keyframes if getattr(cfg, "gps", None)
                     and cfg.gps.enable else 0),
            dtype=jnp.dtype(cfg.dtype),
        )
        if self._host_dev is not None:
            # commit the graph arrays to the host device: every factor
            # add / pose writeback then runs CPU-side instead of queueing
            # tiny scatters on the (remote) accelerator stream the window
            # program is pipelining on
            import jax

            self.graph = jax.device_put(self.graph, self._host_dev)
        self._graph_dirty = False
        # GPS stream buffer + factor bookkeeping (addGPSFactor analog —
        # the stub the reference never finished, laserMapping.cpp:689)
        self._gps_buf: list[tuple[float, np.ndarray, float]] = []
        self._gps_added = 0
        self._last_gps_pos: np.ndarray | None = None
        self._async = None
        if async_backend:
            from ..parallel.distributed import AsyncBackend

            self._async = (AsyncBackend(device=self._host_dev)
                           if self._host_dev is not None else AsyncBackend())
        # loop-closure worker thread (the reference's loopClosureThread,
        # laserMapping.cpp:1021-1038): candidate detection, submap
        # assembly, Scan Context gating and ICP verification run OFF the
        # feed thread; verified factors are applied by the feed thread on
        # poll.  Reading the append-only keyframe list from the worker is
        # GIL-safe; pose refs swapped by _apply_correction may be one
        # correction stale, which only perturbs the detection gates — the
        # factor itself is the ICP result against the submap geometry.
        self._loop_async = bool(async_backend and cfg.loop.enable)
        self._loop_inflight = 0
        if self._loop_async:
            import queue as _queue
            import threading

            self._loop_req: "_queue.Queue" = _queue.Queue(maxsize=2)
            self._loop_res: "_queue.Queue" = _queue.Queue()
            self._loop_thread = threading.Thread(
                target=self._loop_thread_main, daemon=True)
            self._loop_thread.start()
        if backend_on_host and cfg.loop.enable:
            # prime the loop-verification compiles (fixed padded shapes)
            # at construction so the first in-run loop attempt costs its
            # steady time, not a multi-second jit (bench warmup covers
            # this window; the inputs are masked no-op rows)
            with self._backend_ctx():
                z1 = jnp.zeros((self._CUR_PAD, 3), jnp.dtype(cfg.dtype))
                z2 = jnp.zeros((self._OLD_PAD, 3), jnp.dtype(cfg.dtype))
                v1 = jnp.zeros(self._CUR_PAD, bool).at[:32].set(True)
                v2 = jnp.zeros(self._OLD_PAD, bool).at[:32].set(True)
                d1 = sc.make_descriptor(z1, v1, self.sc_params)
                d2 = sc.make_descriptor(z2, v2, self.sc_params)
                sc.sc_distance(d1, d2)
                icp_ops.icp_point2plane(
                    z1, v1, z2, v2, se3.identity(jnp.dtype(cfg.dtype)),
                    max_corr=10.0, iters=25, voxel=1.0)
            if self._async is not None:
                # the async optimizer's first jit otherwise lands on the
                # submitting (feed) thread mid-run
                import jax as _jax

                _jax.block_until_ready(self._async._opt(
                    _jax.device_put(self.graph, self._async.device)))

    def _backend_ctx(self):
        """Device scope for backend compute (see backend_on_host)."""
        import contextlib

        if self._host_dev is None:
            return contextlib.nullcontext()
        import jax

        return jax.default_device(self._host_dev)

    def flush(self):
        """Drain the front end's buffered window/readbacks (end of
        stream).  Keyframing of the trailing partial window is skipped —
        the drained results land in lio.trajectory; loop/backend state
        is already final.  Returns the last drained LIO result or None."""
        out = self.lio.flush()
        self._scan_fifo.clear()
        if self._loop_async and self._loop_inflight > 0:
            # drain in-flight loop verifications (blocking): verified
            # factors must reach the graph before the final optimization
            applied = False
            while self._loop_inflight > 0:
                res = self._loop_res.get()
                self._loop_inflight -= 1
                if res is not None:
                    self._apply_loop_factor(*res)
                    applied = True
            if applied:
                self._graph_dirty = True
        if self._async is not None and self._async.busy:
            res = self._async.wait()
            if res is not None:
                poses, n_snap = res
                self._apply_correction(np.asarray(poses, np.float64),
                                       n=n_snap)
        if self._graph_dirty:
            # factors that landed after the last optimization (or while
            # the backend was busy) get their final GN pass here
            self._optimize_and_correct()
            self._graph_dirty = False
        return out

    # -- keyframe gating (saveFrame, laserMapping.cpp:525-547) -------------
    def _is_keyframe(self, pose7: np.ndarray) -> bool:
        # pure numpy: a device round trip costs ~30 ms on the remote-TPU
        # path and this gate runs every scan.  The reference gates
        # PER-AXIS roll/pitch/yaw of the between transform (:537-543),
        # not the total rotation angle — on rolling platforms this
        # changes keyframe density, so mirror it exactly.
        if not self.keyframes:
            return True
        prev = self.keyframes[-1].pose
        d = float(np.linalg.norm(pose7[4:7] - prev[4:7]))
        # relative quaternion prev^-1 * cur -> rpy (ZYX convention)
        pw, px, py, pz = prev[0:4]
        cw, cx, cy, cz = pose7[0:4]
        rw = pw * cw + px * cx + py * cy + pz * cz
        rx = pw * cx - px * cw - py * cz + pz * cy
        ry = pw * cy + px * cz - py * cw - pz * cx
        rz = pw * cz - px * cy + py * cx - pz * cw
        roll = np.arctan2(2 * (rw * rx + ry * rz),
                          1 - 2 * (rx * rx + ry * ry))
        pitch = np.arcsin(np.clip(2 * (rw * ry - rz * rx), -1.0, 1.0))
        yaw = np.arctan2(2 * (rw * rz + rx * ry),
                         1 - 2 * (ry * ry + rz * rz))
        mp = self.cfg.mapping
        thr = mp.keyframe_adding_angle_threshold
        return (
            d > mp.keyframe_adding_dist_threshold
            or abs(float(roll)) > thr
            or abs(float(pitch)) > thr
            or abs(float(yaw)) > thr
        )

    # -- GPS stream (addGPSFactor analog; reference stub :689) -------------
    def feed_gps(self, t_abs: float, pos, cov: float | None = None):
        """Buffer one GPS fix (world position, optional position cov in
        m^2).  Keyframes created near `t_abs` (within gps.max_age) pick
        it up as a unary factor, spaced >= gps.min_dist apart."""
        self._gps_buf.append((float(t_abs), np.asarray(pos, np.float64),
                              float(cov) if cov is not None else -1.0))
        if len(self._gps_buf) > 1024:
            self._gps_buf = self._gps_buf[-512:]

    def _maybe_add_gps(self, kf: Keyframe):
        g = getattr(self.cfg, "gps", None)
        if g is None or not g.enable or not self._gps_buf:
            return
        ts = np.array([b[0] for b in self._gps_buf])
        covs = np.array([b[2] for b in self._gps_buf])
        # candidates within the pairing window that pass the
        # gpsCovThreshold gate; among them prefer lowest covariance,
        # then closest in time
        ok = (np.abs(ts - kf.t) <= g.max_age) & ~(
            (covs >= 0.0) & (covs > g.cov_threshold))
        if not ok.any():
            return
        cand = np.nonzero(ok)[0]
        j = int(cand[np.lexsort((np.abs(ts[cand] - kf.t), covs[cand]))[0]])
        t_g, pos_g, cov = self._gps_buf[j]
        if (self._last_gps_pos is not None
                and np.linalg.norm(pos_g - self._last_gps_pos) < g.min_dist):
            return
        pos = pos_g.copy()
        if not g.use_elevation:
            pos[2] = kf.pose[6]  # keep the odometry height (LIO-SAM)
        sigma = float(np.sqrt(cov)) if cov > 0 else g.sigma
        with self._backend_ctx():
            self.graph = pg.add_gps(
                self.graph, kf.idx,
                jnp.asarray(pos, jnp.dtype(self.cfg.dtype)), sigma,
            )
        self._gps_added += 1
        self._last_gps_pos = pos_g

    def process_scan(self, pts, pt_t, imu_acc, imu_gyr, imu_t,
                     scan_beg_abs, scan_end_t):
        # optional live dynamic-object removal (the reference shipped this
        # integration commented out, laserMapping.cpp:2271-2307; here it is
        # the config flag SURVEY §7.2/M5 asks for: segment ground, cluster
        # the rest, drop clusters tracked as moving vs the previous scan)
        if getattr(self.cfg, "dynamic_removal", False):
            pts, pt_t = self._remove_dynamic(pts, pt_t)

        tracked = self.lio.inited  # this scan will yield a result later
        out = self.lio.process_scan(
            pts, pt_t, imu_acc, imu_gyr, imu_t, scan_beg_abs, scan_end_t
        )
        if tracked:
            self._scan_fifo.append((pts, scan_beg_abs, scan_end_t))
        if out is None or not self._scan_fifo:
            return None
        # `out` corresponds to the OLDEST unconsumed scan (lag 1 when
        # pipelined, up to ~2 windows in window mode) — pair it with that
        # scan's points for keyframing
        pts, scan_beg_abs, scan_end_t = self._scan_fifo.popleft()
        if np.any(~np.isfinite(out["pos"])) or np.any(
            ~np.isfinite(out["quat"])
        ):
            # check_safe_update analog (esekfom.hpp:1991-2008 — defined but
            # never wired in the reference): refuse a non-finite estimate,
            # roll the filter back to the last keyframe pose
            if self.keyframes:
                last = self.keyframes[-1].pose
                ls = self.lio.ls
                self.lio.ls = ls._replace(
                    x=ls.x._replace(
                        pos=jnp.asarray(last[4:7], jnp.dtype(self.cfg.dtype)),
                        rot=jnp.asarray(last[0:4], jnp.dtype(self.cfg.dtype)),
                    )
                )
            return None
        pose7 = np.concatenate([out["quat"], out["pos"]]).astype(np.float64)

        # harvest a finished async optimization (loop-thread handoff
        # analog).  The result is applied with n = the keyframe count AT
        # SNAPSHOT time: keyframes created while the optimization was in
        # flight are not in the optimized array (their graph rows were
        # still identity-initialized) and must be shifted by the last
        # optimized keyframe's correction instead.
        if self._async is not None:
            res = self._async.poll()
            if res is not None:
                poses, n_snap = res
                self._apply_correction(np.asarray(poses, np.float64),
                                       n=n_snap)

        # harvest loop-worker verifications (feed thread applies the
        # factor; loopClosureThread -> main handoff analog)
        closed = self._loop_async and self._poll_loop_results()
        if self._is_keyframe(pose7):
            self._add_keyframe(pose7, pts, scan_beg_abs + scan_end_t)
            self._maybe_add_gps(self.keyframes[-1])
            if (
                self.cfg.loop.enable
                and len(self.keyframes) - self._kf_count_at_last_loop
                >= self.loop_every
            ):
                self._kf_count_at_last_loop = len(self.keyframes)
                if self._loop_async:
                    # hand detection + verification to the worker; the
                    # factor lands via _poll_loop_results on a later scan
                    import queue as _queue

                    try:
                        self._loop_req.put_nowait(len(self.keyframes) - 1)
                        self._loop_inflight += 1
                    except _queue.Full:
                        pass  # worker saturated: skip, like the 1 Hz thread
                else:
                    closed = self._try_loop_closure() or closed
            # optimize on a closed loop, or periodically once GPS factors
            # accumulate (the reference's intended addGPSFactor flow runs
            # isam.update every keyframe; GPS corrections need no loop)
            gps_due = (self._gps_added > 0
                       and len(self.keyframes) % self.loop_every == 0)
            closed = closed or gps_due
        if closed or self._graph_dirty:
            if self._async is not None:
                # submit returns False while an optimization is in
                # flight; remember and retry so a factor that lands
                # mid-optimization still gets its GN pass
                ok = self._async.submit(self.graph,
                                        tag=len(self.keyframes))
                self._graph_dirty = not ok
            else:
                self._optimize_and_correct()
                self._graph_dirty = False
        out["n_keyframes"] = len(self.keyframes)
        out["n_loops"] = len(self.loop_pairs)
        return out

    # -- live dynamic removal (config-gated) --------------------------------
    def _remove_dynamic(self, pts, pt_t):
        from ..perception import dynamic as dyn
        from ..perception.patchwork import PatchworkParams, estimate_ground

        prm = getattr(self, "_ssc_params", None)
        if prm is None:
            h = getattr(self.cfg, "sensor_height", 0.4)
            hs = getattr(self.cfg, "ssc_sensor_height", None) or h
            self._ssc_params = dyn.SSCParams(sensor_height=hs)
            self._pw_params = PatchworkParams(sensor_height=h)
            self._prev_grid = None
            prm = self._ssc_params
        p = jnp.asarray(pts, jnp.float32)
        valid = jnp.ones(len(pts), bool)
        gm = estimate_ground(p, valid, self._pw_params)
        # relative pose prev<-cur approximated by the last inter-scan
        # motion (constant velocity); the 27-neighbourhood overlap test
        # absorbs the residual error at scan rate.
        # dyn_track_gap > 1 tracks against the grid `gap` scans back
        # instead of the immediately preceding one: at 10 Hz a 1-2 m/s
        # mover displaces only 0.1-0.2 m between consecutive frames —
        # inside the 27-neighbourhood overlap slack — while `gap` frames
        # buy gap-times the displacement signal at the cost of gap-times
        # the odometry-relative-pose extrapolation error.  gap=1 is the
        # reference's consecutive-frame semantics (tgrs.cpp trackPD).
        gap = max(1, int(getattr(self.cfg, "dyn_track_gap", 1)))
        traj = self.lio.trajectory
        rel = se3.identity(jnp.float32)
        cur_est = None

        def _t2pose(row):
            # LIOPipeline.trajectory rows are [pos(3) | quat(4)]
            # (lio._record); se3 poses are [quat(4) | pos(3)] — mixing
            # them up rotates the world by a garbage quaternion (it cost
            # the r4 overlap tracker most of its signal)
            r = np.asarray(row, np.float32)
            return jnp.asarray(np.concatenate([r[3:7], r[0:3]]))

        if len(traj) >= 1:
            # The current scan's pose is not in `trajectory` yet — and
            # with a pipelined/windowed front end the newest entry is
            # `lag` MORE scans stale (results surface up to a window
            # late).  Extrapolate constant-velocity over the true lag:
            # a single-step extrapolation under-rotates by lag*yaw_rate
            # and misplaces far points by meters, which destroys the
            # appearance test's world-frame alignment.
            if getattr(self.lio, "_use_window", False):
                pend = (sum(nv for _, nv in self.lio._pending_ws)
                        + len(self.lio._wbuf))
            else:
                pend = 1 if self.lio._pending_info is not None else 0
            p_last = _t2pose(traj[-1])
            step = (se3.between(_t2pose(traj[-2]), p_last)
                    if len(traj) >= 2 else se3.identity(jnp.float32))
            cur_est = p_last
            for _ in range(pend + 1):
                cur_est = se3.compose(cur_est, step)
        if len(traj) >= gap + 1:
            # track_pd wants T_prev<-next = prev^-1 * next (its centers
            # are in the CURRENT scan frame and get projected into the
            # tracked grid's frame); the tracked grid's scan (`gap`
            # scans before current) has pose trajectory[-gap].
            p_prev = _t2pose(traj[-gap])
            rel = se3.between(p_prev, cur_est).astype(jnp.float32)
        mode = getattr(self.cfg, "dyn_track_mode", "overlap")
        if mode == "appearance":
            # K-frame world-occupancy appearance test (see
            # LIOConfig.dyn_track_mode and perception.dynamic): a
            # mover's current world voxels were free space ~2 s ago
            K = max(4, int(getattr(self.cfg, "dyn_track_k", 24)))
            old_lo = max(2, int(round(K * 5 / 6)))  # frames 20..24 of 24
            vs = float(getattr(self.cfg, "dyn_appear_voxel", 0.45))
            r_max = float(getattr(self.cfg, "dyn_appear_range", 28.0))
            z_band = float(getattr(self.cfg, "dyn_appear_z_band", 1.0))
            band = np.asarray(valid & ~gm) & (
                np.asarray(p[:, 2]) <= z_band)
            grid = dyn.encode_scan(p, jnp.asarray(band), prm)
            grid = dyn.cluster_grid(grid, prm)
            lab_pt = dyn.point_labels(grid)
            cur_np = (np.asarray(cur_est, np.float64) if cur_est is not None
                      else np.array([1.0, 0, 0, 0, 0, 0, 0]))
            R = np.asarray(so3.quat_to_matrix(jnp.asarray(cur_np[0:4])))
            pts_w = (np.asarray(pts, np.float64) @ R.T
                     + cur_np[4:7]).astype(np.float64)
            keys = dyn.world_voxel_keys(pts_w, vs)
            hist = getattr(self, "_app_hist", None)
            if hist is None:
                from collections import deque

                self._app_hist = hist = deque(maxlen=K)
                self._app_sens = deque(maxlen=K + 1)
                self._app_n = 0  # branch-call counter (= scan index)
            self._app_sens.append(cur_np[4:7].copy())
            dynmask = np.zeros(len(pts), bool)
            if len(hist) >= K:
                old_sorted = np.unique(np.concatenate(
                    [hist[-k] for k in range(old_lo, K + 1)]))
                sens_now = cur_np[4:7]
                sens_old = self._app_sens[0]
                d_now = np.linalg.norm(pts_w - sens_now, axis=1)
                d_old = np.linalg.norm(pts_w - sens_old, axis=1)
                rng_ok = (d_now <= r_max) & (d_old <= r_max)
                scored = band & (lab_pt >= 0) & rng_ok
                dynmask = dyn.appearance_dynamic_mask(
                    keys, scored, band, lab_pt, old_sorted,
                    thr_strong=float(getattr(
                        self.cfg, "dyn_appear_thr_strong", 0.55)),
                    thr_weak=float(getattr(
                        self.cfg, "dyn_appear_thr_weak", 0.9)),
                    min_cnt=int(getattr(
                        self.cfg, "dyn_appear_min_cnt", 4)),
                    min_scored_frac=float(getattr(
                        self.cfg, "dyn_appear_min_scored_frac", 0.6)))
                # threshold-tuning dump: per-scan decision inputs, so a
                # sweep over (thr_strong, thr_weak, ...) replays offline
                # without re-running the pipeline (tools/tune_dynamic.py)
                dump_dir = os.environ.get("LIO_DYN_TUNE_DUMP")
                if dump_dir:
                    os.makedirs(dump_dir, exist_ok=True)
                    np.savez_compressed(
                        os.path.join(
                            dump_dir,
                            f"scan_{self._app_n:05d}.npz"),
                        keys=keys, scored=scored, band=band,
                        lab_pt=lab_pt, old_sorted=old_sorted,
                        d_now=d_now.astype(np.float32),
                        d_old=d_old.astype(np.float32))
            hist.append(np.unique(keys[band & (lab_pt >= 0)]))
            self._app_n += 1
            keep = np.asarray(valid) & ~dynmask
        else:
            hist = getattr(self, "_grid_hist", None)
            if hist is None:
                from collections import deque

                self._grid_hist = hist = deque(maxlen=gap)
            prev_grid = hist[0] if len(hist) == gap else None
            static, grid = dyn.dynamic_removal_masks(
                p, valid, gm, prev_grid, rel, prm
            )
            hist.append(grid)
            self._prev_grid = grid
            keep = np.asarray(static)
        # per-scan removal decision, exposed for the PR/RR/F1 evaluation
        # loop (run.py dynamic_report.json; consumed-and-cleared per scan)
        self.last_dynamic_mask = ~keep
        # inspection dumps (saveColorCloud analog, tgrs.cpp:214-243):
        # per-scan cluster-colored cloud + the removed (dynamic) points
        dump = getattr(self, "dynamic_dump_dir", None)
        if dump:
            from ..io.pcd import write_pcd

            os.makedirs(dump, exist_ok=True)
            k = getattr(self, "_dyn_dump_idx", 0)
            self._dyn_dump_idx = k + 1
            dyn.save_cluster_cloud(
                os.path.join(dump, f"{k:06d}_color.pcd"), pts, grid)
            removed = pts[~keep]
            if len(removed):
                write_pcd(os.path.join(dump, f"{k:06d}_removed.pcd"),
                          removed.astype(np.float32))
        return pts[keep], pt_t[keep]

    # -- keyframe + odom factor (addOdomFactor, :550-582) ------------------
    def _add_keyframe(self, pose7, pts, t_abs):
        k = len(self.keyframes)
        sub = pts[:: max(1, len(pts) // 4096)]
        # fixed-size padded descriptor call: a variable-length input jit
        # -compiles per distinct length (~0.15 s each), which stacks up
        # at one keyframe every few scans
        buf, vmask = self._pad_fix(np.asarray(sub, np.float32),
                                   self._CUR_PAD)
        with self._backend_ctx():
            desc = np.asarray(
                sc.make_descriptor(
                    jnp.asarray(buf, jnp.dtype(self.cfg.dtype)),
                    jnp.asarray(vmask),
                    self.sc_params,
                )
            )
        kf = Keyframe(idx=k, t=t_abs, pose=pose7.copy(),
                      odom_pose=pose7.copy(), cloud=sub.astype(np.float32),
                      desc=desc)
        self.keyframes.append(kf)
        dtype = jnp.dtype(self.cfg.dtype)
        # graph mutations under the backend device scope: the graph is
        # committed to the host device, so operands created here must be
        # host-resident too — a default-device jnp.asarray would place
        # them on the (remote) accelerator and every factor add would
        # pay a synchronous cross-device transfer
        with self._backend_ctx():
            pose_j = jnp.asarray(pose7, dtype)
            self.graph = pg.set_pose(self.graph, k, pose_j)
            if k == 0:
                # prior noise 1e-12 (laserMapping.cpp:556)
                self.graph = pg.add_prior(self.graph, 0, pose_j, 1e-6, 1e-6)
            else:
                prev = jnp.asarray(self.keyframes[-2].odom_pose, dtype)
                cur = jnp.asarray(self.keyframes[-1].odom_pose, dtype)
                rel = se3.between(prev, cur)
                # between noise: rot 1e-6 var, trans 1e-4 var (:569)
                self.graph = pg.add_between(
                    self.graph, k - 1, k, rel, 1e-2, 1e-3
                )

    # -- loop detection (detectLoopClosureDistance, :815-850) --------------
    def _detect_candidate(self, cur_idx: int | None = None) -> int | None:
        if cur_idx is None:
            cur_idx = len(self.keyframes) - 1
        if cur_idx < 1:
            return None
        cur = self.keyframes[cur_idx]
        prev = self.keyframes[:cur_idx]
        ps = np.stack([k.pose[4:7] for k in prev])
        d = np.linalg.norm(ps - cur.pose[4:7], axis=1)
        ok = (d < self.cfg.loop.search_radius) & (
            np.array([abs(k.t - cur.t) for k in prev])
            > self.cfg.loop.search_time_diff
        )
        if not ok.any():
            return None
        return int(np.argmin(np.where(ok, d, np.inf)))

    # -- submap assembly (loopFindNearKeyframes, :856-883) -----------------
    def _submap(self, center_idx: int, half: int, frame_pose: np.ndarray,
                max_pts: int = 20000) -> np.ndarray:
        lo = max(0, center_idx - half)
        hi = min(len(self.keyframes), center_idx + half + 1)
        inv = se3.inverse(jnp.asarray(frame_pose, np.float32))
        parts = []
        for k in range(lo, hi):
            kf = self.keyframes[k]
            w = se3.apply(jnp.asarray(kf.pose, kf.cloud.dtype),
                          jnp.asarray(kf.cloud))
            parts.append(np.asarray(se3.apply(inv, w)))
        cat = np.concatenate(parts)
        if len(cat) > max_pts:
            cat = cat[:: len(cat) // max_pts + 1]
        return cat

    # -- loop closure (performLoopClosure, :890-1018) ----------------------
    def _try_loop_closure(self) -> bool:
        with self._backend_ctx():
            res = self._loop_detect_verify(len(self.keyframes) - 1)
        if res is None:
            return False
        self._apply_loop_factor(*res)
        return True

    def _loop_thread_main(self):
        """Worker loop (loopClosureThread analog): one detection +
        verification per queued request; None request = shutdown."""
        while True:
            cur_idx = self._loop_req.get()
            if cur_idx is None:
                return
            try:
                with self._backend_ctx():
                    res = self._loop_detect_verify(cur_idx)
            except Exception:  # a failed attempt must not kill the thread
                res = None
            self._loop_res.put(res)

    def _apply_loop_factor(self, cand, cur_idx, rel_pose, sigma, fitness):
        """Feed-thread-only graph mutation for a verified loop."""
        with self._backend_ctx():
            self.graph = pg.add_between(
                self.graph, cand, cur_idx,
                jnp.asarray(rel_pose, jnp.dtype(self.cfg.dtype)),
                sigma, sigma,
            )
        self.loop_pairs.append((cand, cur_idx, fitness))

    def _poll_loop_results(self) -> bool:
        """Drain finished worker verifications; apply verified factors.
        Returns True if any factor was added (optimization due)."""
        import queue as _queue

        applied = False
        while self._loop_inflight > 0:
            try:
                res = self._loop_res.get_nowait()
            except _queue.Empty:
                break
            self._loop_inflight -= 1
            if res is not None:
                self._apply_loop_factor(*res)
                applied = True
        return applied

    # static padding sizes for the loop-verification device calls: a
    # VARIABLE-length submap means a fresh jit compile per attempt
    # (measured: ~3.4 s compile + 0.9 s steady for the 20k-point ICP on
    # the host backend — it was the slam-bench wall killer); padding to
    # fixed buckets compiles once, and the valid masks make padded rows
    # exact no-ops
    _CUR_PAD = 8192
    _OLD_PAD = 20480

    @staticmethod
    def _pad_fix(pts: np.ndarray, size: int):
        n = min(len(pts), size)
        if len(pts) > size:
            pts = pts[:: len(pts) // size + 1][:size]
            n = len(pts)
        buf = np.zeros((size, 3), np.float32)
        buf[:n] = pts[:n]
        valid = np.zeros(size, bool)
        valid[:n] = True
        return buf, valid

    def _loop_detect_verify(self, cur_idx: int):
        """Detection + SC gate + ICP verification (NO graph mutation —
        runs on the loop worker thread in async mode).  Returns
        (cand, cur_idx, rel_pose (np, 7), sigma, fitness) or None."""
        cand = self._detect_candidate(cur_idx)
        if cand is None:
            return None
        cur = self.keyframes[cur_idx]
        # pose SNAPSHOTS: a concurrent _apply_correction (feed thread)
        # may swap kf.pose refs mid-verification; the submaps, rel_est
        # and the returned factor must use one consistent pair
        cur_pose = cur.pose.copy()
        cand_pose = self.keyframes[cand].pose.copy()
        half = self.cfg.loop.search_num
        cur_local, cur_valid = self._pad_fix(
            self._submap(cur.idx, 0, cur_pose), self._CUR_PAD)
        old_local, old_valid = self._pad_fix(
            self._submap(cand, half, cand_pose),
            self._OLD_PAD)

        # Scan Context gate on the two submaps (:932-943)
        d1 = sc.make_descriptor(
            jnp.asarray(cur_local, jnp.float32),
            jnp.asarray(cur_valid), self.sc_params,
        )
        d2 = sc.make_descriptor(
            jnp.asarray(old_local, jnp.float32),
            jnp.asarray(old_valid), self.sc_params,
        )
        dist, shift = sc.sc_distance(d1, d2)
        if float(dist) > self.sc_params.dist_thresh:
            return None

        # yaw pre-alignment from the SC shift (:954-962)
        yaw0 = -float(shift) * 2.0 * np.pi / self.sc_params.num_sector
        init = se3.make(
            so3.quat_exp(jnp.asarray([0.0, 0.0, yaw0],
                                     jnp.dtype(self.cfg.dtype))),
            jnp.zeros(3, jnp.dtype(self.cfg.dtype)),
        )
        # ICP verify: cur keyframe cloud vs old submap, in old-kf frame
        # via current relative estimate (:946-974)
        rel_est = se3.between(
            jnp.asarray(cand_pose, jnp.dtype(self.cfg.dtype)),
            jnp.asarray(cur_pose, jnp.dtype(self.cfg.dtype)),
        )
        icp_dtype = jnp.dtype(self.cfg.dtype)
        res = icp_ops.icp_point2plane(
            jnp.asarray(cur_local, icp_dtype),
            jnp.asarray(cur_valid),
            jnp.asarray(old_local, icp_dtype),
            jnp.asarray(old_valid),
            se3.compose(init, rel_est) if abs(yaw0) > 0.3 else rel_est,
            max_corr=10.0,
            iters=25,
            voxel=1.0,
        )
        if float(res.fitness) > self.cfg.loop.fitness_score:
            return None

        # loop factor: T_cand->cur from ICP (noise = fitness, :1010-1017)
        sigma = max(float(res.fitness), 1e-3)
        return (cand, cur.idx, np.asarray(res.pose, np.float64), sigma,
                float(res.fitness))

    # -- optimize + correct (saveKeyFramesAndFactor/correctPoses) ----------
    def _optimize_and_correct(self):
        with self._backend_ctx():
            self.graph = pg.optimize(self.graph, iters=6, cg_iters=50)
        self._apply_correction(
            np.asarray(self.graph.poses, np.float64),
            n=len(self.keyframes),
        )

    def _apply_correction(self, poses: np.ndarray, n: int | None = None):
        """correctPoses (laserMapping.cpp:769-805) + filter feedback
        (kf.change_x, :744-754).  With the async backend the result may be
        stale — keyframes created after the snapshot (and the live filter
        pose) are shifted by the last optimized keyframe's correction."""
        n = min(n if n is not None else len(self.keyframes),
                len(self.keyframes))
        if n == 0:
            return
        with self._backend_ctx():  # host-resident small-op math
            old_last = jnp.asarray(self.keyframes[n - 1].pose)
            new_last = jnp.asarray(poses[n - 1])
            delta = se3.compose(new_last, se3.inverse(old_last))
            for k in range(n):
                self.keyframes[k].pose = poses[k]
            if len(self.keyframes) > n:
                # batched shift of the post-snapshot keyframes (se3 ops
                # broadcast over leading dims)
                tail = np.stack([kf.pose for kf in self.keyframes[n:]])
                shifted = np.asarray(
                    se3.compose(delta, jnp.asarray(tail)), np.float64)
                for i, kf in enumerate(self.keyframes[n:]):
                    kf.pose = shifted[i]
        # write ALL current poses back into the graph in ONE masked
        # update (was one set_pose dispatch per keyframe — O(n) tiny
        # device calls on every async harvest)
        allp = np.stack([kf.pose for kf in self.keyframes])
        with self._backend_ctx():
            self.graph = pg.set_poses(
                self.graph, jnp.asarray(allp, jnp.dtype(self.cfg.dtype)),
                len(self.keyframes))
        # live filter pose: apply the same drift correction
        ls = self.lio.ls
        if ls is None:  # front end not initialised (offline correction)
            return
        cur = jnp.concatenate(
            [ls.x.rot.astype(jnp.float64), ls.x.pos.astype(jnp.float64)]
        )
        corrected = np.asarray(se3.compose(delta, cur))
        x = ls.x._replace(
            pos=jnp.asarray(corrected[4:7], jnp.dtype(self.cfg.dtype)),
            rot=jnp.asarray(corrected[0:4], jnp.dtype(self.cfg.dtype)),
        )
        self.lio.ls = ls._replace(x=x)

        # recontructIKdTree after correctPoses (laserMapping.cpp:797-800):
        # a material pose jump leaves the voxel map in the drifted frame —
        # rebuild it from the corrected keyframe submap around the new
        # pose.  Small corrections skip the rebuild (the map error is
        # below the association's voxel tolerance).
        d_np = np.asarray(delta)
        jump = float(np.linalg.norm(d_np[4:7]))
        ang = 2.0 * float(np.arccos(np.clip(abs(d_np[0]), -1.0, 1.0)))
        leaf = self.cfg.ikdtree.filter_size_map_min
        if jump > 0.5 * leaf or ang > 0.02:
            pos = corrected[4:7]
            radius = 2.0 * self.cfg.mapping.det_range
            clouds = []
            for kf in self.keyframes:
                if np.linalg.norm(kf.pose[4:7] - pos) > radius:
                    continue
                R = np.asarray(so3.quat_to_matrix(
                    jnp.asarray(kf.pose[0:4])), np.float64)
                clouds.append(kf.cloud @ R.T + kf.pose[4:7])
            if clouds:
                self.lio.reset_map_from_world_points(
                    np.concatenate(clouds).astype(np.float32))

    # -- persistence --------------------------------------------------------
    def save_session(self, root: str):
        from ..io.session import SessionWriter

        # drain an in-flight async optimization so the saved poses carry
        # the last correction (reference: the save service runs after the
        # loop thread's final isam.update)
        if self._async is not None and self._async.busy:
            res = self._async.wait()
            if res is not None:
                poses, n_snap = res
                self._apply_correction(np.asarray(poses, np.float64),
                                       n=n_snap)

        w = SessionWriter(root=root)
        for kf in self.keyframes:
            w.add_keyframe(kf.cloud, np.zeros(len(kf.cloud)), kf.desc,
                           kf.pose, t=kf.t)
        for k in range(1, len(self.keyframes)):
            rel = se3.between(
                jnp.asarray(self.keyframes[k - 1].pose),
                jnp.asarray(self.keyframes[k].pose),
            )
            w.add_edge(k - 1, k, np.asarray(rel))
        for (i, j, _fit) in self.loop_pairs:
            rel = se3.between(
                jnp.asarray(self.keyframes[i].pose),
                jnp.asarray(self.keyframes[j].pose),
            )
            w.add_edge(i, j, np.asarray(rel))
        w.save()
        # loop markers for inspection — the file analog of the reference's
        # RViz loop-constraint marker array (laserMapping.cpp:456-522):
        # one row per accepted loop with both endpoint positions, so any
        # plotting tool can draw the node pair + connecting line
        import os as _os

        with open(_os.path.join(root, "loop_markers.txt"), "w") as f:
            f.write("# i j fitness xi yi zi xj yj zj\n")
            for (i, j, fit) in self.loop_pairs:
                pi = np.asarray(self.keyframes[i].pose)[4:7]
                pj = np.asarray(self.keyframes[j].pose)[4:7]
                f.write(
                    f"{i} {j} {fit:.6f} "
                    + " ".join(f"{v:.6f}" for v in pi) + " "
                    + " ".join(f"{v:.6f}" for v in pj) + "\n")
