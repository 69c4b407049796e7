"""Multi-session merge test: two synthetic sessions of one world, the
query session expressed in a drifted/offset local frame; the merger must
recover the offset and align the query trajectory into the central frame
(Incremental_mapping behavior at the trajectory level)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.apps.multi_session import (
    MultiSessionConfig,
    MultiSessionMerger,
)
from better_fastlio2_tpu.io.session import SessionWriter
from better_fastlio2_tpu.ops import scancontext as sc
from better_fastlio2_tpu.utils import se3, so3


def room_world(rng, n=12000):
    k = n // 4
    return np.concatenate(
        [
            np.stack([rng.uniform(-25, 25, k), rng.uniform(-25, 25, k),
                      np.full(k, -1.5)], 1),
            np.stack([rng.uniform(-25, 25, k), np.full(k, 25.0),
                      rng.uniform(-1.5, 4, k)], 1),
            np.stack([np.full(k, -25.0), rng.uniform(-25, 25, k),
                      rng.uniform(-1.5, 4, k)], 1),
            np.stack([rng.uniform(-25, 25, k), np.full(k, -25.0),
                      rng.uniform(-1.5, 4, k)], 1),
        ]
    )


def make_session(root, rng, world, true_poses, local_frame=None):
    """Write a session dir whose clouds see `world` from true_poses but
    whose stored poses are in `local_frame` coords (None = world)."""
    w = SessionWriter(root=root)
    local = []
    for k, tp in enumerate(true_poses):
        inv = se3.inverse(jnp.asarray(tp))
        body = np.asarray(se3.apply(inv, jnp.asarray(world)))
        keepers = np.nonzero(np.linalg.norm(body, axis=1) < 40)[0]
        sel = rng.choice(keepers, size=min(len(keepers), 6000), replace=False)
        body = body[sel] + rng.normal(scale=0.01, size=(len(sel), 3))
        desc = np.asarray(
            sc.make_descriptor(jnp.asarray(body, jnp.float32),
                               jnp.ones(len(body), bool))
        )
        stored = (
            tp
            if local_frame is None
            else np.asarray(se3.compose(se3.inverse(jnp.asarray(local_frame)),
                                        jnp.asarray(tp)))
        )
        local.append(stored)
        w.add_keyframe(body, np.zeros(len(body)), desc, stored)
    for k in range(1, len(local)):
        rel = se3.between(jnp.asarray(local[k - 1]), jnp.asarray(local[k]))
        w.add_edge(k - 1, k, np.asarray(rel))
    w.save()


def yaw_pose(yaw, t):
    return np.concatenate(
        [np.asarray(so3.quat_exp(jnp.asarray([0.0, 0.0, yaw]))),
         np.asarray(t, float)]
    )


def test_two_session_merge_aligns_query(rng):
    world = room_world(rng)
    central_poses = [yaw_pose(0.0, [x, 0, 0]) for x in np.linspace(-8, 8, 9)]
    query_true = [yaw_pose(0.1, [x, 3, 0]) for x in np.linspace(-6, 6, 7)]
    offset = yaw_pose(0.3, [4.0, -2.0, 0.0])  # unknown anchor

    with tempfile.TemporaryDirectory() as td:
        cdir, qdir = os.path.join(td, "central"), os.path.join(td, "query")
        make_session(cdir, rng, world, central_poses)
        make_session(qdir, rng, world, query_true, local_frame=offset)

        # synthetic speckle worlds give weaker SC contrast than real scans;
        # the dist gate is a config param (reference default 0.3)
        m = MultiSessionMerger(cdir, qdir,
                               MultiSessionConfig(sc_dist_thresh=0.5))
        stats = m.run()
        assert stats["sc_loops"] + stats["rs_loops"] >= 3, stats

        poses = np.asarray(m.graph.poses, np.float64)
        errs = [
            np.linalg.norm(poses[m.nc + k, 4:7] - query_true[k][4:7])
            for k in range(m.nq)
        ]
        assert np.mean(errs) < 0.3, f"query not aligned: {errs}"

        anchor = m.query_anchor()
        aerr = np.linalg.norm(anchor[4:7] - offset[4:7])
        assert aerr < 0.3, f"anchor error {aerr}"

        out = os.path.join(td, "out")
        m.write_outputs(out)
        assert os.path.exists(os.path.join(out, "aft_map2.pcd"))
        assert os.path.exists(
            os.path.join(out, "query_aft_intersession_loops.txt")
        )

        # bfr/aft trajectory parity (writeAllSessionsTrajectories with
        # both postfixes, Incremental_mapping.cpp:293-347 / run :349-380)
        for name in ("central", "query"):
            for frame in ("local", "central"):
                for stage in ("bfr", "aft"):
                    p = os.path.join(out, f"{name}_{frame}_{stage}.txt")
                    assert os.path.exists(p), p
        # aft central-frame query trajectory = the aligned (true) poses;
        # aft local-frame = the stored anchor-relative poses
        qc = np.loadtxt(os.path.join(out, "query_central_aft.txt"))
        ql = np.loadtxt(os.path.join(out, "query_local_aft.txt"))
        t_c = qc.reshape(-1, 3, 4)[:, :, 3]
        t_l = ql.reshape(-1, 3, 4)[:, :, 3]
        true_t = np.stack([p[4:7] for p in query_true])
        stored_t = np.stack([
            np.asarray(se3.compose(se3.inverse(jnp.asarray(offset)),
                                   jnp.asarray(p)))[4:7]
            for p in query_true])
        assert np.mean(np.linalg.norm(t_c - true_t, axis=1)) < 0.4
        assert np.mean(np.linalg.norm(t_l - stored_t, axis=1)) < 0.4

        # merged-session export (getReloKeyFrames analog,
        # Incremental_mapping.cpp:1080-1102) chains into online relo
        merged = os.path.join(td, "merged")
        m.export_merged_session(merged)
        from better_fastlio2_tpu.apps.online_relo import (OnlineRelocalizer,
                                                          ReloConfig)
        from better_fastlio2_tpu.io.session import SessionReader

        r = SessionReader(merged)
        assert r.num_keyframes == m.nc + m.nq
        relo = OnlineRelocalizer(
            merged, ReloConfig(sc_dist_thresh=0.6, search_dis=12.0))
        # a fresh scan from a pose on the central trajectory must
        # relocalize against the merged prior
        tp = yaw_pose(0.0, [2.0, 0.5, 0.0])
        inv = se3.inverse(jnp.asarray(tp))
        body = np.asarray(se3.apply(inv, jnp.asarray(world)))
        body = body[np.linalg.norm(body, axis=1) < 40]
        body = body[rng.choice(len(body), 6000, replace=False)]
        res = relo.process(body, tp.copy())
        assert relo.initialized
        assert res is not None and res["mode"] == "relo"
        assert np.linalg.norm(res["pose"][4:7] - tp[4:7]) < 0.5
