"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the device-sharded voxel map (SURVEY.md P3: voxel blocks
distributed across chips) against the single-chip map: identical 5-NN
results, aggregate capacity split by ownership hash.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded.make_mesh(jax.devices()[:8])


def _cloud(rng, n):
    return np.stack(
        [rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
         rng.uniform(-2, 2, n)], 1
    ).astype(np.float32)


def test_sharded_map_knn_matches_single_chip(mesh, rng):
    pts = _cloud(rng, 4096)
    valid = np.ones(len(pts), bool)
    q = _cloud(rng, 512)

    # single-chip reference
    m1 = voxel_hash.make_map(capacity_log2=14, bucket=4, voxel_size=0.5,
                             dtype=jnp.float32)
    m1 = voxel_hash.insert(m1, jnp.asarray(pts), jnp.asarray(valid))
    nb1, d21, ok1 = voxel_hash.knn(m1, jnp.asarray(q), k=5)

    # sharded: one table per device, same points
    ms = sharded.make_sharded_map(mesh, capacity_log2_per_dev=12, bucket=4,
                                  voxel_size=0.5)
    ins = sharded.sharded_map_insert(mesh)
    ms = ins(ms, jnp.asarray(pts), jnp.asarray(valid))
    knn = sharded.sharded_map_knn(mesh, k=5)
    nbs, d2s, oks = knn(ms, jnp.asarray(q))

    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(oks))
    np.testing.assert_allclose(np.asarray(d21), np.asarray(d2s),
                               rtol=0, atol=1e-5)
    # same neighbor SETS (ties may order differently): compare sorted d2
    np.testing.assert_allclose(
        np.sort(np.asarray(d21), axis=1), np.sort(np.asarray(d2s), axis=1),
        rtol=0, atol=1e-5,
    )


def test_sharded_map_ownership_partitions(mesh, rng):
    """Every voxel lives on exactly one device: total live voxels across
    shards equals the single-chip voxel count."""
    pts = _cloud(rng, 2048)
    valid = np.ones(len(pts), bool)

    m1 = voxel_hash.make_map(capacity_log2=13, bucket=4, voxel_size=0.5,
                             dtype=jnp.float32)
    m1 = voxel_hash.insert(m1, jnp.asarray(pts), jnp.asarray(valid))
    n_single = int(voxel_hash.num_voxels(m1))

    ms = sharded.make_sharded_map(mesh, capacity_log2_per_dev=11, bucket=4,
                                  voxel_size=0.5)
    ins = sharded.sharded_map_insert(mesh)
    ms = ins(ms, jnp.asarray(pts), jnp.asarray(valid))
    live = (np.asarray(ms.key) & (1 << 30)) != 0  # (D, C_local)
    per_dev = live.sum(axis=1)
    assert per_dev.sum() == n_single
    # the ownership hash should spread voxels across all devices
    assert (per_dev > 0).all()


def test_sharded_map_insert_is_incremental(mesh, rng):
    """Second insert into the sharded map adds only new voxels (bucket
    append semantics preserved through the ownership mask)."""
    pts_a = _cloud(rng, 1024)
    pts_b = _cloud(rng, 1024)
    ms = sharded.make_sharded_map(mesh, capacity_log2_per_dev=11, bucket=4,
                                  voxel_size=0.5)
    ins = sharded.sharded_map_insert(mesh)
    ms = ins(ms, jnp.asarray(pts_a), jnp.ones(len(pts_a), bool))
    n1 = int(((np.asarray(ms.key) & (1 << 30)) != 0).sum())
    ms = ins(ms, jnp.asarray(pts_b), jnp.ones(len(pts_b), bool))
    n2 = int(((np.asarray(ms.key) & (1 << 30)) != 0).sum())

    both = np.concatenate([pts_a, pts_b])
    m1 = voxel_hash.make_map(capacity_log2=14, bucket=4, voxel_size=0.5,
                             dtype=jnp.float32)
    m1 = voxel_hash.insert(m1, jnp.asarray(both), jnp.ones(len(both), bool))
    assert n2 == int(voxel_hash.num_voxels(m1))
    assert n2 >= n1


def test_sharded_step_tracks_trajectory(mesh):
    """Full multi-chip scan tick (points dp-sharded, map ownership-
    sharded, psum'd moment association + normal equations) tracks the
    synthetic trajectory end to end on the 8-device mesh."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from better_fastlio2_tpu.config import (IkdtreeConfig, LIOConfig,
                                            MappingConfig, ShapesConfig)
    from better_fastlio2_tpu.core import imu as imu_mod
    from better_fastlio2_tpu.core.state import identity_state, init_P
    from better_fastlio2_tpu.io.synthetic import (Trajectory,
                                                  make_lio_sequence)
    from better_fastlio2_tpu.utils import so3

    D = 8
    cfg = LIOConfig()
    cfg.dtype = "float32"
    cfg.shapes = ShapesConfig(n_raw=4096, n_ds=4096, n_imu=32,
                              map_capacity_log2=12, map_bucket=4,
                              map_max_probe=8, knn_chunk=2048)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0,
                                surf_leaf_size=0.4, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4,
                                plane_cache=True)

    groups = list(make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=3500,
        seed=3, noise=0.004,
        traj=Trajectory(t_still=1.2, speed=1.5)))

    step = sharded.make_sharded_step_fn(cfg, mesh)
    ms = sharded.make_sharded_map(
        mesh, capacity_log2_per_dev=12, bucket=4, voxel_size=0.4,
        moments=True)

    # IMU static init from the first group (LIOPipeline._try_init analog)
    g0 = groups[0]
    x0, P0, acc_norm = imu_mod.imu_init(
        jnp.asarray(g0["imu_acc"], jnp.float32),
        jnp.asarray(g0["imu_gyr"], jnp.float32),
        jnp.ones(len(g0["imu_acc"]), bool),
        so3.quat_identity(jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.float32,
    )
    x, Pm = x0, P0
    shard_pts = NamedSharding(mesh, P("dp"))

    origin = np.array([0.0, 0.0, 1.5])
    errs = []
    last_end_abs = g0["scan_beg_abs"] + g0["scan_end_t"]
    cube_lo = jnp.asarray([-200.0, -200.0, -200.0])
    cube_hi = jnp.asarray([200.0, 200.0, 200.0])
    tail = jnp.zeros((2, 3), jnp.float32)
    for gi, g in enumerate(groups[1:]):
        n_raw = cfg.shapes.n_raw
        Pp = np.zeros((n_raw, 3), np.float32)
        Tt = np.zeros(n_raw, np.float32)
        Vv = np.zeros(n_raw, bool)
        n = min(len(g["pts"]), n_raw)
        Pp[:n], Tt[:n], Vv[:n] = g["pts"][:n], g["pt_t"][:n], True
        m_imu = cfg.shapes.n_imu
        A = np.zeros((m_imu, 3), np.float32)
        G = np.zeros((m_imu, 3), np.float32)
        Ti = np.full(m_imu, np.inf, np.float32)
        Mk = np.zeros(m_imu, bool)
        k = min(len(g["imu_acc"]), m_imu)
        A[:k], G[:k], Ti[:k], Mk[:k] = (g["imu_acc"][:k], g["imu_gyr"][:k],
                                        g["imu_t"][:k], True)
        batch = imu_mod.ImuBatch(acc=jnp.asarray(A), gyr=jnp.asarray(G),
                                 t=jnp.asarray(Ti), mask=jnp.asarray(Mk))
        ler = np.float32(last_end_abs - g["scan_beg_abs"])
        last_end_abs = g["scan_beg_abs"] + g["scan_end_t"]
        # 5-NN merge path for the first dozen scans, then the psum'd
        # moment-cache path (the LIOPipeline warmup switch, as a runtime
        # flag inside one program)
        use_knn = jnp.asarray(gi < 12)
        x, Pm, ms, tail = step(
            x, Pm, ms,
            jax.device_put(jnp.asarray(Pp), shard_pts),
            jax.device_put(jnp.asarray(Tt), shard_pts),
            jax.device_put(jnp.asarray(Vv), shard_pts),
            batch, jnp.asarray(ler), jnp.asarray(g["scan_end_t"],
                                                 jnp.float32),
            jnp.asarray(acc_norm, jnp.float32), cube_lo, cube_hi,
            tail[0], tail[1], use_knn,
        )
        errs.append(np.linalg.norm(
            np.asarray(x.pos) - (g["gt_pos"] - origin)))

    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert np.isfinite(ate) and ate < 0.15, f"sharded-step ATE {ate:.3f} m"
    assert errs[-1] < 0.2, f"final error {errs[-1]:.3f} m"
