"""Online relocalization test: prior session + drifting odometry; the
relocalizer must globally initialise via Scan Context, keep the corrected
pose near truth in relo mode, and extend the prior session in lio mode
(pose_estimator behavior, include/online-relo/pose_estimator.cpp)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.apps.online_relo import OnlineRelocalizer, ReloConfig
from better_fastlio2_tpu.io.session import SessionWriter
from better_fastlio2_tpu.ops import scancontext as sc
from better_fastlio2_tpu.utils import se3, so3
from test_multisession import room_world, yaw_pose


def scan_from(world, pose, rng, n=6000):
    inv = se3.inverse(jnp.asarray(pose))
    body = np.asarray(se3.apply(inv, jnp.asarray(world)))
    keep = np.nonzero(np.linalg.norm(body, axis=1) < 40)[0]
    sel = rng.choice(keep, size=min(len(keep), n), replace=False)
    return body[sel] + rng.normal(scale=0.01, size=(len(sel), 3))


def write_prior(root, rng, world, poses):
    w = SessionWriter(root=root)
    for k, p in enumerate(poses):
        body = scan_from(world, p, rng)
        desc = np.asarray(
            sc.make_descriptor(jnp.asarray(body, jnp.float32),
                               jnp.ones(len(body), bool))
        )
        w.add_keyframe(body, np.zeros(len(body)), desc, p)
        if k:
            w.add_edge(
                k - 1, k,
                np.asarray(se3.between(jnp.asarray(poses[k - 1]),
                                       jnp.asarray(p))),
            )
    w.save()


def test_online_relocalization(rng):
    world = room_world(rng)
    prior_poses = [yaw_pose(0.0, [x, 0, 0]) for x in np.linspace(-8, 8, 9)]

    with tempfile.TemporaryDirectory() as td:
        pdir = os.path.join(td, "prior")
        write_prior(pdir, rng, world, prior_poses)

        relo = OnlineRelocalizer(
            pdir, ReloConfig(sc_dist_thresh=0.6, search_dis=12.0)
        )

        # live run: true poses along y=1, odometry drifts linearly;
        # odometry frame == true frame at t0 (drift accumulates)
        true_path = [yaw_pose(0.0, [x, 1.0, 0]) for x in
                     np.linspace(-6, 6, 7)]
        drift = np.array([0.05, 0.08, 0.0])
        outs = []
        for k, tp in enumerate(true_path):
            cloud = scan_from(world, tp, rng)
            odom = tp.copy()
            odom[4:7] += drift * k
            out = relo.process(cloud, odom)
            assert out is not None, f"relocalization lost at frame {k}"
            outs.append(out)

        assert relo.initialized
        assert all(o["mode"] == "relo" for o in outs[1:]), [o["mode"] for o in outs]
        errs = [
            np.linalg.norm(o["pose"][4:7] - tp[4:7])
            for o, tp in zip(outs, true_path)
        ]
        # corrected poses track truth despite odometry drift up to 0.56 m
        assert max(errs) < 0.25, f"relo errors {errs}"

        # lio mode: a pose far outside the prior map extends the session
        far_pose = yaw_pose(0.0, [0.0, 18.0, 0.0])
        cloud = scan_from(world, far_pose, rng)
        odom = far_pose.copy()
        n_kf_before = len(relo.kf_poses)
        out = relo.process(cloud, odom)
        assert out["mode"] == "lio"
        assert len(relo.kf_poses) == n_kf_before + 1


def test_reg_mode_selectable(rng, tmp_path):
    """cfg.reg_mode routes registration through any REG_MODES entry
    (registeration.h:20-27 regMode), and ReloConfig.from_yaml reads the
    reference's online_relo.yaml keys."""
    import yaml

    from better_fastlio2_tpu.ops import icp as icp_ops

    # from_yaml parses the reference-style relo: block
    cfgf = tmp_path / "relo.yaml"
    cfgf.write_text(yaml.safe_dump(
        {"relo": {"searchDis": 7.5, "searchNum": 2, "trustDis": 3.0,
                  "regMode": 4}}))
    rc = ReloConfig.from_yaml(str(cfgf))
    assert (rc.search_dis, rc.search_num, rc.trust_dis, rc.reg_mode) == \
        (7.5, 2, 3.0, 4)

    world = room_world(rng)
    prior_poses = [yaw_pose(0.0, [x, 0, 0]) for x in np.linspace(-6, 6, 7)]
    pdir = str(tmp_path / "prior")
    write_prior(pdir, rng, world, prior_poses)

    calls = []
    orig = icp_ops.register_run

    def spy(mode, *a, **k):
        calls.append(mode)
        return orig(mode, *a, **k)

    icp_ops.register_run = spy
    try:
        relo = OnlineRelocalizer(
            pdir, ReloConfig(sc_dist_thresh=0.6, search_dis=12.0,
                             reg_mode="fr_icp"))
        tp = yaw_pose(0.0, [0.0, 0.5, 0.0])
        out = relo.process(scan_from(world, tp, rng), tp.copy())
    finally:
        icp_ops.register_run = orig
    assert out is not None and relo.initialized
    assert calls and all(c == "fr_icp" for c in calls)
    assert np.linalg.norm(out["pose"][4:7] - tp[4:7]) < 0.3
