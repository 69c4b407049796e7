"""SLAM backend wiring tests: keyframe gating, loop detection + ICP
verification + graph correction, on fabricated keyframes (fast, no full
sequence replay)."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.config import (
    IkdtreeConfig,
    LIOConfig,
    LoopConfig,
    MappingConfig,
    ShapesConfig,
)
from better_fastlio2_tpu.pipeline.slam import Keyframe, SLAMPipeline
from better_fastlio2_tpu.utils import se3, so3


def cfg_small():
    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(n_raw=4096, n_ds=2048, n_imu=32,
                              map_capacity_log2=14, map_bucket=4,
                              map_max_probe=8, knn_chunk=2048)
    cfg.mapping = MappingConfig(keyframe_adding_dist_threshold=1.0,
                                keyframe_adding_angle_threshold=0.2)
    cfg.loop = LoopConfig(enable=True, search_radius=5.0,
                          search_time_diff=10.0, search_num=3,
                          fitness_score=0.3)
    cfg.ikdtree = IkdtreeConfig(max_iteration=3)
    return cfg


def room_cloud(rng, n=3000):
    k = n // 3
    floor = np.stack([rng.uniform(-10, 10, k), rng.uniform(-10, 10, k),
                      np.full(k, -1.5)], 1)
    w1 = np.stack([rng.uniform(-10, 10, k), np.full(k, 10.0),
                   rng.uniform(-1.5, 3, k)], 1)
    w2 = np.stack([np.full(k, -10.0), rng.uniform(-10, 10, k),
                   rng.uniform(-1.5, 3, k)], 1)
    return np.concatenate([floor, w1, w2]).astype(np.float32)


def make_kf(idx, t, pose7, world, rng):
    """Keyframe whose body cloud = world seen from pose (consistent)."""
    inv = se3.inverse(jnp.asarray(pose7))
    body = np.asarray(se3.apply(inv, jnp.asarray(world, jnp.float64)))
    body = body + rng.normal(scale=0.004, size=body.shape)
    from better_fastlio2_tpu.ops import scancontext as sc

    desc = np.asarray(
        sc.make_descriptor(jnp.asarray(body, jnp.float32),
                           jnp.ones(len(body), bool))
    )
    return Keyframe(idx=idx, t=t, pose=pose7.copy(), odom_pose=pose7.copy(),
                    cloud=body.astype(np.float32), desc=desc)


def yaw_pose(yaw, t):
    return np.concatenate(
        [np.asarray(so3.quat_exp(jnp.asarray([0.0, 0.0, yaw]))),
         np.asarray(t, float)]
    )


def test_loop_closure_on_fabricated_revisit(rng):
    """Drifted revisit: last keyframe is physically at the start but its
    estimated pose carries drift; the loop pipeline must detect, verify
    with ICP, and pull the estimate back."""
    world = room_cloud(rng)
    pipe = SLAMPipeline(cfg_small(), max_keyframes=64, loop_every=1)
    import better_fastlio2_tpu.backend.posegraph as pg

    # trajectory: out and back along x, 12 keyframes, 1.1 m apart
    true_xs = list(np.linspace(0, 6, 7)) + list(np.linspace(5, 1, 5))
    drift = np.array([0.04, 0.03, 0.0])
    for k, x in enumerate(true_xs):
        true_pose = yaw_pose(0.0, [x, 0, 0])
        est_pose = true_pose.copy()
        est_pose[4:7] += drift * k  # accumulated drift in estimate
        kf = make_kf(k, t=float(k * 2.0), pose7=est_pose, world=world,
                     rng=rng)
        # cloud must reflect TRUE pose (sensor saw the real world)
        kf_true = make_kf(k, t=float(k * 2.0), pose7=true_pose, world=world,
                          rng=rng)
        kf.cloud = kf_true.cloud
        kf.desc = kf_true.desc
        pipe.keyframes.append(kf)
        dtype = jnp.float32
        pipe.graph = pg.set_pose(pipe.graph, k, jnp.asarray(est_pose, dtype))
        if k == 0:
            pipe.graph = pg.add_prior(pipe.graph, 0,
                                      jnp.asarray(est_pose, dtype), 1e-6,
                                      1e-6)
        else:
            prev = jnp.asarray(pipe.keyframes[k - 1].odom_pose)
            cur = jnp.asarray(pipe.keyframes[k].odom_pose)
            rel = se3.between(prev, cur).astype(dtype)
            pipe.graph = pg.add_between(pipe.graph, k - 1, k, rel, 1e-2,
                                        1e-3)

    closed = pipe._try_loop_closure()
    assert closed, "loop closure not detected/verified"
    assert pipe.loop_pairs, "no loop factor recorded"
    i0, j0, fit0 = pipe.loop_pairs[0]
    assert 0 <= fit0 < 1.0  # ICP fitness recorded with the pair

    # loop-marker export (reference marker array analog,
    # laserMapping.cpp:456-522)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pipe.save_session(td)
        import os

        lines = open(os.path.join(td, "loop_markers.txt")).readlines()
        assert len(lines) == 1 + len(pipe.loop_pairs)
        row = lines[1].split()
        assert int(row[0]) == i0 and int(row[1]) == j0
        assert len(row) == 9

    pipe.lio.ls = None  # not running the front end here
    pipe._optimize_and_correct_graph_only = True
    # run optimization without filter feedback
    pipe.graph = pg.optimize(pipe.graph, iters=6, cg_iters=50)
    poses = np.asarray(pipe.graph.poses[: len(pipe.keyframes)])
    # last keyframe should be pulled toward its true x=1 position
    err_before = np.linalg.norm(
        pipe.keyframes[-1].pose[4:7] - np.array([1.0, 0, 0])
    )
    err_after = np.linalg.norm(poses[-1, 4:7] - np.array([1.0, 0, 0]))
    assert err_after < err_before * 0.5, (err_before, err_after)


def test_keyframe_gating():
    pipe = SLAMPipeline(cfg_small(), max_keyframes=16)
    p0 = yaw_pose(0.0, [0, 0, 0])
    assert pipe._is_keyframe(p0)  # first is always a keyframe
    pipe.keyframes.append(
        Keyframe(0, 0.0, p0, p0, np.zeros((1, 3), np.float32),
                 np.zeros((20, 60)))
    )
    assert not pipe._is_keyframe(yaw_pose(0.05, [0.5, 0, 0]))
    assert pipe._is_keyframe(yaw_pose(0.0, [1.5, 0, 0]))  # dist gate
    assert pipe._is_keyframe(yaw_pose(0.3, [0.1, 0, 0]))  # angle gate


def test_dynamic_removal_flag_runs(rng):
    """SLAM pipeline with dynamic_removal enabled processes scans and
    still tracks (smoke-level: the flag path executes end to end)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence

    cfg = cfg_small()
    cfg.dynamic_removal = True
    cfg.sensor_height = 1.5
    cfg.loop.enable = False
    pipe = SLAMPipeline(cfg, max_keyframes=32)
    groups = make_lio_sequence(duration=1.6, n_points=3000, seed=9,
                               traj=Trajectory(t_still=1e9))
    last = None
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is not None:
            last = out
    assert last is not None
    drift = np.linalg.norm(last["pos"] - (g["gt_pos"] - [0, 0, 1.5]))
    assert drift < 0.2, drift


def test_map_rebuild_on_loop_correction():
    """After a pose-graph correction with a material jump, the LIO map is
    rebuilt from corrected keyframe clouds (recontructIKdTree-after-
    correctPoses analog, slam._apply_correction) and the filter keeps
    tracking in the corrected frame."""
    import jax.numpy as jnp

    from better_fastlio2_tpu.config import (
        IkdtreeConfig, LIOConfig, MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.map import voxel_hash
    from better_fastlio2_tpu.pipeline.slam import SLAMPipeline

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(n_raw=4096, n_ds=2048, n_imu=32,
                              map_capacity_log2=15, map_bucket=4,
                              map_max_probe=8, knn_chunk=2048)
    cfg.mapping = MappingConfig(det_range=60., cube_len=400.,
                                surf_leaf_size=0.4, extrinsic_est_en=False,
                                keyframe_adding_dist_threshold=0.5)
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4)
    cfg.loop.enable = False
    pipe = SLAMPipeline(cfg)
    groups = make_lio_sequence(duration=3.0, n_points=2500, seed=4,
                               traj=Trajectory(t_still=1.0, speed=2.0))
    for g in groups:
        out = pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                                g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                                g["scan_end_t"])
    assert len(pipe.keyframes) >= 2
    vox_before = int(voxel_hash.num_voxels(pipe.lio.ls.map))

    # force a correction: shift every optimized pose by +1 m in x
    poses = np.stack([kf.pose for kf in pipe.keyframes]).astype(np.float64)
    poses[:, 4] += 1.0
    pipe._apply_correction(poses, n=len(pipe.keyframes))

    # keyframes and the live filter moved by the delta
    assert abs(pipe.keyframes[0].pose[4] - poses[0, 4]) < 1e-9
    # the map was rebuilt: shifted keyframe clouds must be found at ~0
    m = pipe.lio.ls.map
    assert int(voxel_hash.num_voxels(m)) > 0.3 * vox_before
    kf = pipe.keyframes[-1]
    from better_fastlio2_tpu.utils import so3 as so3m
    R = np.asarray(so3m.quat_to_matrix(jnp.asarray(kf.pose[0:4])))
    world = (kf.cloud[:64] @ R.T + kf.pose[4:7]).astype(np.float32)
    _, d2, ok = voxel_hash.knn(m, jnp.asarray(world), k=1, max_probe=8)
    hit = np.asarray(ok)[:, 0] & (np.asarray(d2)[:, 0] < 1e-6)
    assert hit.mean() > 0.9, hit.mean()

    # filter keeps tracking after the jump (continues on shifted gt)
    errs = []
    more = make_lio_sequence(duration=4.0, n_points=2500, seed=4,
                             traj=Trajectory(t_still=1.0, speed=2.0))
    for g in more[30:]:
        out = pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                                g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                                g["scan_end_t"])
        if out is not None:
            errs.append(out["pos"])
    assert np.all(np.isfinite(np.asarray(errs)))


def test_async_correction_applies_at_snapshot_count(rng):
    """A keyframe created while an async optimization is in flight must
    NOT be overwritten by its identity-initialized graph row — the
    correction applies with n = the keyframe count at snapshot time and
    later keyframes are shifted by the last optimized correction."""
    import better_fastlio2_tpu.backend.posegraph as pg
    from better_fastlio2_tpu.parallel.distributed import AsyncBackend

    world = room_cloud(rng)
    pipe = SLAMPipeline(cfg_small(), max_keyframes=32, loop_every=1)
    pipe._async = AsyncBackend()
    dtype = jnp.float32
    for k in range(4):
        pose = yaw_pose(0.0, [float(k), 0, 0])
        pipe.keyframes.append(make_kf(k, float(k), pose, world, rng))
        pipe.graph = pg.set_pose(pipe.graph, k, jnp.asarray(pose, dtype))
        if k == 0:
            pipe.graph = pg.add_prior(pipe.graph, 0,
                                      jnp.asarray(pose, dtype), 1e-6, 1e-6)
        else:
            rel = se3.between(
                jnp.asarray(pipe.keyframes[k - 1].pose),
                jnp.asarray(pipe.keyframes[k].pose)).astype(dtype)
            pipe.graph = pg.add_between(pipe.graph, k - 1, k, rel,
                                        1e-2, 1e-3)

    n_snap = len(pipe.keyframes)
    assert pipe._async.submit(pipe.graph, tag=n_snap)

    # a keyframe arrives while the optimization is in flight — its graph
    # row is still make_graph's identity init
    late_pose = yaw_pose(0.0, [4.0, 0, 0])
    pipe.keyframes.append(make_kf(4, 4.0, late_pose, world, rng))

    import time as _time
    res = None
    for _ in range(200):
        res = pipe._async.poll()
        if res is not None:
            break
        _time.sleep(0.05)
    assert res is not None
    poses, tag = res
    assert tag == n_snap
    pipe._apply_correction(np.asarray(poses, np.float64), n=tag)

    # the late keyframe keeps (a shifted version of) its real pose —
    # never the identity row of the unoptimized graph slot
    assert np.linalg.norm(pipe.keyframes[4].pose[4:7] - late_pose[4:7]) < 0.5
    assert abs(pipe.keyframes[4].pose[4] - 4.0) < 0.5


def test_windowed_slam_pipeline_tracks_and_loops():
    """The bench.py --slam configuration on CPU-small shapes: windowed
    quantized LIO front end under SLAMPipeline (scan-FIFO pairing),
    async backend on the host device, loop closure on a circular
    trajectory.  Validates: FIFO keyframe pairing survives the window
    lag, flush() drains cleanly, and the loop-corrected keyframe poses
    beat the raw odometry poses vs ground truth."""
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence

    cfg = cfg_small()
    cfg.loop = LoopConfig(enable=True, search_radius=8.0,
                          search_time_diff=6.0, search_num=3,
                          fitness_score=0.3)
    cfg.mapping.keyframe_adding_dist_threshold = 0.8
    # circle radius speed/yaw_rate = 1.6/0.7 ~ 2.3 m, period ~9 s:
    # 14 s = ~1.5 laps, second lap revisits 6+ s-old keyframes
    groups = list(make_lio_sequence(
        duration=14.0, scan_rate=10.0, imu_rate=100.0, n_points=3000,
        seed=5, noise=0.004,
        traj=Trajectory(t_still=0.8, speed=1.6, yaw_rate=0.7)))
    pipe = SLAMPipeline(
        cfg, max_keyframes=128, loop_every=2, async_backend=True,
        backend_on_host=True,
        lio_kwargs=dict(window=2, quantized=True))
    outs = []
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"])
        if out is not None:
            outs.append(out)
    pipe.flush()
    assert len(pipe.keyframes) >= 8
    assert len(outs) > 50
    # keyframe poses must be finite and near ground truth; if a loop
    # fired, corrected keyframes must not be worse than odometry ones
    t2gt = {round(g["scan_beg_abs"] + g["scan_end_t"], 6): g["gt_pos"]
            for g in groups}
    gt, odo, corr = [], [], []
    for kf in pipe.keyframes:
        g = t2gt.get(round(kf.t, 6))
        if g is None:
            continue
        gt.append(g)
        odo.append(kf.odom_pose[4:7])
        corr.append(kf.pose[4:7])
    gt = np.asarray(gt) - gt[0]
    odo = np.asarray(odo) - odo[0]
    corr = np.asarray(corr) - corr[0]
    ate_odo = float(np.sqrt(np.mean(np.sum((odo - gt) ** 2, 1))))
    ate_corr = float(np.sqrt(np.mean(np.sum((corr - gt) ** 2, 1))))
    assert np.isfinite(ate_corr)
    assert ate_corr < max(0.3, ate_odo * 1.05), (ate_corr, ate_odo)
    if pipe.loop_pairs:
        assert ate_corr <= ate_odo * 1.01
