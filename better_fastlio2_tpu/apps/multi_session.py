"""Multi-session map merging: anchor-based joint pose-graph optimization.

TPU-native re-design of the reference's offline two-session merge
(reference: include/multi-session/Incremental_mapping.{hpp,cpp},
src/multi_session.cpp).  Pipeline parity (run(), :349-380):

  1. load central + query sessions from session dirs  (Session ctor :20-34)
  2. optimize                                          (:435)
  3. inter-session Scan Context loops                  (:586-616)
     -> ICP verify in local coords -> robust loop factors (:651-696)
  4. optimize; SC-missed nodes become RS candidates: nearest central node
     within 10 m + information-gain target selection   (:699-784)
     -> ICP verify -> factors                          (:787-837)
  5. optimize; write aft trajectories + merged map     (:293-347,:372-377)

Parametrization note: the reference optimizes session-local poses plus
per-session anchor nodes, tied by the 4-key BetweenFactorWithAnchoring
(BetweenFactorWithAnchoring.h:19-164).  Because session-internal between
factors are invariant to the common anchor ((A x_i)^-1 (A x_j) =
x_i^-1 x_j) the same optimum is reached by optimizing WORLD poses
W = A ∘ X directly with plain between factors — which is what we do;
the query anchor is recovered afterwards as A_q = W_q0 ∘ X_q0^-1.  The
anchored form only re-parametrizes the gauge.

Information gain (calcInformationGainBtnTwoNodes, :699-727):
0.5 log det(S)/det(Sy), S = Sy + H1 Σ1 H1^T + H2 Σ2 H2^T.  The
reference reads exact iSAM2 marginals; we approximate Σ with the
inverse block-diagonal of the Gauss-Newton Hessian (Jacobi marginals) —
the relative ranking across candidate nodes, which is all the argmax
uses, is preserved.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..backend import posegraph as pg
from ..io.session import SessionReader, SessionWriter, kitti_pose_line
from ..ops import icp as icp_ops
from ..ops import scancontext as sc
from ..utils import se3, so3

__all__ = ["MultiSessionConfig", "MultiSessionMerger"]


@dataclass
class MultiSessionConfig:
    sc_dist_thresh: float = 0.3
    loop_fitness_thresh: float = 0.3  # loopFitnessScoreThreshold
    rs_search_radius: float = 10.0  # :749 hard-coded 10.0
    submap_half: int = 2  # historyKeyframeSearchNum=2 (:478)
    odom_sigma_t: float = 1e-2
    odom_sigma_r: float = 1e-3
    loop_sigma_t: float = 0.1
    loop_sigma_r: float = 0.1
    cauchy: bool = True  # robustNoiseModel (:416-433)
    # loop-verification registration algorithm: None keeps the default
    # multiscale FRICP cascade; an int 0-8 or REG_MODES name selects a
    # single regMode algorithm (registeration.h:20-27) via
    # ops.icp.register_run
    reg_mode: int | str | None = None
    dtype: str = "float64"


class MultiSessionMerger:
    def __init__(self, central_dir: str, query_dir: str,
                 cfg: MultiSessionConfig | None = None):
        self.cfg = cfg or MultiSessionConfig()
        self.central = SessionReader(central_dir)
        self.query = SessionReader(query_dir)
        self.dtype = jnp.dtype(self.cfg.dtype)
        nc, nq = self.central.num_keyframes, self.query.num_keyframes
        self.nc, self.nq = nc, nq
        self.sc_pairs: list[tuple[int, int]] = []  # (central, query)
        self.rs_pairs: list[tuple[int, int]] = []
        self._poses_bfr: np.ndarray | None = None  # run() snapshots
        self._clouds_c = [None] * nc
        self._clouds_q = [None] * nq

        K = nc + nq
        self.graph = pg.make_graph(max_poses=K, max_priors=4,
                                   max_between=4 * K, dtype=self.dtype)
        # central poses enter in central/world coords; query poses in their
        # local coords (anchor = I initially, :840-850 loose anchor prior)
        for k in range(nc):
            self.graph = pg.set_pose(
                self.graph, k, jnp.asarray(self.central.poses[k], self.dtype)
            )
        for k in range(nq):
            self.graph = pg.set_pose(
                self.graph, nc + k,
                jnp.asarray(self.query.poses[k], self.dtype),
            )
        self.graph = pg.add_prior(
            self.graph, 0, jnp.asarray(self.central.poses[0], self.dtype),
            1e-4, 1e-4,
        )
        for (sess, base, edges) in [
            (self.central, 0, self.central.edges),
            (self.query, nc, self.query.edges),
        ]:
            for (i, j, rel) in edges:
                self.graph = pg.add_between(
                    self.graph, base + i, base + j,
                    jnp.asarray(rel, self.dtype),
                    self.cfg.odom_sigma_t, self.cfg.odom_sigma_r,
                )

    # -- cloud access -------------------------------------------------------
    def _cloud(self, sess, cache, k):
        if cache[k] is None:
            xyz, _ = sess.cloud(k)
            cache[k] = xyz.astype(np.float64)
        return cache[k]

    def _submap_local(self, sess, cache, base, center, half):
        """loopFindNearKeyframesLocalCoord (Incremental_mapping.cpp): merge
        +-half keyframe clouds into `center`'s local frame using current
        graph poses."""
        poses = np.asarray(self.graph.poses, np.float64)
        inv_c = se3.inverse(jnp.asarray(poses[base + center]))
        parts = []
        for k in range(max(0, center - half),
                       min(sess.num_keyframes, center + half + 1)):
            cl = self._cloud(sess, cache, k)
            w = se3.apply(jnp.asarray(poses[base + k]), jnp.asarray(cl))
            parts.append(np.asarray(se3.apply(inv_c, w)))
        cat = np.concatenate(parts)
        if len(cat) > 20000:
            cat = cat[:: len(cat) // 20000 + 1]
        return cat

    # -- step 3: SC loops ---------------------------------------------------
    def detect_sc_loops(self):
        """detectInterSessionSCloops (:586-616): every query keyframe
        queries the central SCD database; misses become RS candidates."""
        params = sc.SCParams(num_exclude_recent=0,
                             dist_thresh=self.cfg.sc_dist_thresh)
        db = sc.make_database(self.nc, params, jnp.float32)
        for k in range(self.nc):
            db = sc.add_descriptor(db, jnp.asarray(self.central.scd(k),
                                                   jnp.float32))
        sc_hits, rs_cands = [], []
        for q in range(self.nq):
            desc = jnp.asarray(self.query.scd(q), jnp.float32)
            idx, dist, shift = sc.detect_loop(db, desc, params)
            if int(idx) >= 0 and float(dist) < params.dist_thresh:
                sc_hits.append((int(idx), q))
            else:
                rs_cands.append(q)
        return sc_hits, rs_cands

    def _verify_icp(self, c_idx, q_idx):
        """doICPVirtualRelative (:462-522): query keyframe cloud vs central
        submap, both in local coords; returns T (query-kf frame ->
        central-kf frame) or None."""
        src = self._submap_local(self.query, self._clouds_q, self.nc, q_idx,
                                 0)
        tgt = self._submap_local(self.central, self._clouds_c, 0, c_idx,
                                 self.cfg.submap_half)
        # initial guess: current estimated relative pose between the nodes
        poses = np.asarray(self.graph.poses, np.float64)
        rel0 = se3.between(
            jnp.asarray(poses[c_idx]), jnp.asarray(poses[self.nc + q_idx])
        )
        if self.cfg.reg_mode is None:
            res = icp_ops.icp_multiscale(
                jnp.asarray(src), jnp.ones(len(src), bool),
                jnp.asarray(tgt), jnp.ones(len(tgt), bool),
                rel0.astype(self.dtype),
                max_corr=30.0,
            )
        else:
            res = icp_ops.register_run(
                self.cfg.reg_mode,
                jnp.asarray(src), jnp.ones(len(src), bool),
                jnp.asarray(tgt), jnp.ones(len(tgt), bool),
                rel0.astype(self.dtype), max_corr=30.0,
            )
        if float(res.fitness) > self.cfg.loop_fitness_thresh:
            return None
        return res.pose

    def add_sc_loops(self, sc_hits):
        """addSCloops (:651-696)."""
        added = 0
        for (c_idx, q_idx) in sc_hits:
            rel = self._verify_icp(c_idx, q_idx)
            if rel is None:
                continue
            self.graph = pg.add_between(
                self.graph, c_idx, self.nc + q_idx, rel.astype(self.dtype),
                self.cfg.loop_sigma_t, self.cfg.loop_sigma_r,
                robust=self.cfg.cauchy,
            )
            self.sc_pairs.append((c_idx, q_idx))
            added += 1
        return added

    # -- step 4: RS loops with information gain -----------------------------
    def _jacobi_marginals(self):
        """Approximate 6x6 marginal covariances: inverse block-diagonal of
        the GN Hessian (see module docstring)."""
        g = self.graph
        poses = g.poses
        e, Ji, Jj = pg._between_residual_jac(poses, g.bw_i, g.bw_j, g.bw_meas)
        w = (g.bw_sqw**2) * g.bw_mask[:, None]
        K = poses.shape[0]
        diag = jnp.zeros((K, 6, 6), self.dtype)
        Hi = jnp.einsum("fai,fa,faj->fij", Ji, w, Ji)
        Hj = jnp.einsum("fai,fa,faj->fij", Jj, w, Jj)
        diag = diag.at[g.bw_i].add(Hi)
        diag = diag.at[g.bw_j].add(Hj)
        diag = diag + jnp.eye(6, dtype=self.dtype) * 1e-3
        return np.asarray(jnp.linalg.inv(diag))

    def _pair_info_gain(self, Sig, c_idx: int, q_node: int) -> float:
        """calcInformationGainBtnTwoNodes (:699-727), EXACT form: the
        hypothetical loop factor's Jacobians H1, H2 (evaluated at the
        current estimated relative pose, where the residual is zero)
        compose with the 6x6 marginals:

            S = Sy + H1 Sigma_c H1^T + H2 Sigma_q H2^T
            gain = 0.5 log det(S) / det(Sy)

        In this repo's world-pose gauge the anchored 4-key factor's pose
        Jacobians reduce to the plain between-factor blocks
        (pg._between_residual_jac), matching the reference's evaluateError
        H_s1/H_s2."""
        g = self.graph
        meas = se3.between(
            jnp.asarray(g.poses[c_idx]), jnp.asarray(g.poses[q_node])
        )
        _, Ji, Jj = pg._between_residual_jac(
            g.poses,
            jnp.asarray([c_idx], jnp.int32),
            jnp.asarray([q_node], jnp.int32),
            meas[None],
        )
        H1 = np.asarray(Ji[0], np.float64)
        H2 = np.asarray(Jj[0], np.float64)
        Sy = np.eye(6)
        S = Sy + H1 @ Sig[c_idx] @ H1.T + H2 @ Sig[q_node] @ H2.T
        det = np.linalg.det(S)
        return 0.5 * np.log(max(det, 1e-300))

    def select_rs_targets(self, rs_cands, exact: bool = True):
        """findNearestRSLoopsTargetNodeIdx (:729-784): nearest central
        nodes within 10 m, pick the one with max information gain.

        exact=True composes the loop factor's Jacobians with the full-GN
        marginal covariances like the reference — computed by the
        chain+loops selected-inverse (pg.selected_marginals, O(K L²))
        so info-gain selection stays seconds-fast at thousands of
        keyframes where the dense (6K)² inverse is intractable;
        exact=False keeps the round-1 Jacobi/H~I approximation."""
        poses = np.asarray(self.graph.poses, np.float64)
        n_act = self.nc + self.nq
        if exact:
            Sig = np.asarray(
                pg.selected_marginals(self.graph, n_act), np.float64)
        else:
            Sig = self._jacobi_marginals()
        Sy = np.eye(6)
        out = []
        for q in rs_cands:
            pq = poses[self.nc + q, 4:7]
            d = np.linalg.norm(poses[: self.nc, 4:7] - pq, axis=1)
            near = np.nonzero(d < self.cfg.rs_search_radius)[0]
            if len(near) == 0:
                continue
            best, best_gain = None, 0.0
            for c in near:
                if exact:
                    gain = self._pair_info_gain(Sig, int(c), self.nc + q)
                else:
                    S = Sy + Sig[c] + Sig[self.nc + q]
                    gain = 0.5 * np.log(
                        max(np.linalg.det(S), 1e-300) / np.linalg.det(Sy)
                    )
                if gain > best_gain:
                    best, best_gain = int(c), gain
            if best is not None:
                out.append((best, q))
        return out

    def add_rs_loops(self, rs_pairs):
        """addRSloops (:787-837) — doICPGlobalRelative uses the current
        global estimates as the ICP initial guess, which _verify_icp
        already does."""
        added = 0
        for (c_idx, q_idx) in rs_pairs:
            rel = self._verify_icp(c_idx, q_idx)
            if rel is None:
                continue
            self.graph = pg.add_between(
                self.graph, c_idx, self.nc + q_idx, rel.astype(self.dtype),
                self.cfg.loop_sigma_t, self.cfg.loop_sigma_r,
                robust=self.cfg.cauchy,
            )
            self.rs_pairs.append((c_idx, q_idx))
            added += 1
        return added

    def optimize(self, iters=6):
        self.graph = pg.optimize(self.graph, iters=iters, cg_iters=60)

    # -- the full run (run(), :349-380) -------------------------------------
    def run(self):
        self.optimize()
        # before-loop snapshot: the reference writes *_bfr trajectories
        # from exactly this state (run() :349-380 calls
        # writeAllSessionsTrajectories("bfr") after the initial optimize,
        # before any inter-session factor exists)
        self._poses_bfr = np.array(self.graph.poses, np.float64)
        sc_hits, rs_cands = self.detect_sc_loops()
        n_sc = self.add_sc_loops(sc_hits)
        self.optimize()
        rs_pairs = self.select_rs_targets(rs_cands)
        n_rs = self.add_rs_loops(rs_pairs)
        self.optimize()
        return {"sc_loops": n_sc, "rs_loops": n_rs}

    # -- outputs ------------------------------------------------------------
    def query_anchor(self) -> np.ndarray:
        """A_q = W_q0 ∘ X_q0^-1."""
        poses = np.asarray(self.graph.poses, np.float64)
        return np.asarray(
            se3.compose(
                jnp.asarray(poses[self.nc]),
                se3.inverse(jnp.asarray(self.query.poses[0])),
            )
        )

    def _write_trajectories(self, out_dir: str, poses: np.ndarray,
                            postfix: str):
        """writeAllSessionsTrajectories (:293-347) for one stage: per
        session both the LOCAL (anchor-removed) and the CENTRAL
        (anchor-composed) trajectory.  In this repo's world-pose gauge
        the graph poses ARE the central-frame poses; the local ones are
        A_s^-1 ∘ W with A recovered per stage as A = W_s0 ∘ X_s0^-1."""
        for (name, sess, base, n) in [("central", self.central, 0, self.nc),
                                      ("query", self.query, self.nc,
                                       self.nq)]:
            anchor = se3.compose(
                jnp.asarray(poses[base]),
                se3.inverse(jnp.asarray(sess.poses[0])))
            a_inv = se3.inverse(anchor)
            fl = open(os.path.join(out_dir,
                                   f"{name}_local_{postfix}.txt"), "w")
            fc = open(os.path.join(out_dir,
                                   f"{name}_central_{postfix}.txt"), "w")
            for k in range(n):
                w = poses[base + k]
                Rc = np.asarray(so3.quat_to_matrix(jnp.asarray(w[:4])))
                fc.write(kitti_pose_line(Rc, w[4:7]) + "\n")
                loc = np.asarray(se3.compose(a_inv, jnp.asarray(w)))
                Rl = np.asarray(so3.quat_to_matrix(jnp.asarray(loc[:4])))
                fl.write(kitti_pose_line(Rl, loc[4:7]) + "\n")
            fl.close()
            fc.close()

    def write_outputs(self, out_dir: str):
        """writeAllSessionsTrajectories (:293-347) for both stages (bfr =
        after the initial optimize, aft = after SC+RS loops) + merged map
        (aft_map2.pcd, :372-377)."""
        os.makedirs(out_dir, exist_ok=True)
        poses = np.asarray(self.graph.poses, np.float64)
        if getattr(self, "_poses_bfr", None) is not None:
            self._write_trajectories(out_dir, self._poses_bfr, "bfr")
        self._write_trajectories(out_dir, poses, "aft")
        for (name, base, n) in [("central", 0, self.nc),
                                ("query", self.nc, self.nq)]:
            with open(os.path.join(out_dir,
                                   f"{name}_aft_intersession_loops.txt"),
                      "w") as f:
                for k in range(n):
                    p = poses[base + k]
                    R = np.asarray(so3.quat_to_matrix(jnp.asarray(p[:4])))
                    f.write(kitti_pose_line(R, p[4:7]) + "\n")
        # merged map
        from ..io.pcd import write_pcd

        parts = []
        for (sess, cache, base, n) in [
            (self.central, self._clouds_c, 0, self.nc),
            (self.query, self._clouds_q, self.nc, self.nq),
        ]:
            for k in range(0, n, max(1, n // 200)):
                cl = self._cloud(sess, cache, k)
                w = np.asarray(
                    se3.apply(jnp.asarray(poses[base + k]), jnp.asarray(cl))
                )
                parts.append(w[:: max(1, len(w) // 4000)])
        merged = np.concatenate(parts) if parts else np.zeros((0, 3))
        write_pcd(os.path.join(out_dir, "aft_map2.pcd"), merged)

    def export_merged_session(self, out_dir: str):
        """getReloKeyFrames analog (:1080-1102): persist the merged
        central+query keyframe set — body-frame clouds, SCDs and the
        loop-corrected central-frame poses — as a STANDARD session dir,
        so the online-relo app (which consumes a prior session via
        SessionReader, pose_estimator.cpp:57-75) can relocalize against
        the union of both sessions.  Edges = both sessions' odometry
        chains plus the accepted inter-session loops, with relative
        poses re-derived from the optimized estimate."""
        poses = np.asarray(self.graph.poses, np.float64)
        w = SessionWriter(out_dir)
        for (sess, cache, base, n) in [
            (self.central, self._clouds_c, 0, self.nc),
            (self.query, self._clouds_q, self.nc, self.nq),
        ]:
            for k in range(n):
                xyz, inten = sess.cloud(k)
                w.add_keyframe(xyz, inten, sess.scd(k), poses[base + k],
                               t=float(base + k))
        def rel(i, j):
            return np.asarray(se3.compose(
                se3.inverse(jnp.asarray(poses[i])), jnp.asarray(poses[j])))

        for (i, j, _) in self.central.edges:
            w.add_edge(i, j, rel(i, j))
        for (i, j, _) in self.query.edges:
            w.add_edge(self.nc + i, self.nc + j,
                       rel(self.nc + i, self.nc + j))
        for (c, q) in self.sc_pairs + self.rs_pairs:
            w.add_edge(c, self.nc + q, rel(c, self.nc + q))
        w.save()
