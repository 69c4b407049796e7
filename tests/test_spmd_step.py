"""Production-parity SPMD window step (parallel.sharded.
make_spmd_window_step_fn) on the virtual 8-device CPU mesh.

The multi-chip scaling path of MULTICHIP.md: map + filter state
replicated, per-point work query-sharded, Gram psum'd.  These tests pin
its defining property — the sharded program computes the SAME answer as
the production single-chip window step (same dense-moment association,
fused solve, insert budgets), differing only by f32 reduction order in
the psum'd Gram.

Reference analog: the OpenMP fork-join over scan points
(laserMapping.cpp:1883-1886) — here as SPMD over a jax mesh (SURVEY §2.6
P1) with the map replicated per chip (P3 deviation documented in
lio._make_step_core).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.map import voxel_hash as vh
from better_fastlio2_tpu.parallel import sharded
from better_fastlio2_tpu.pipeline.lio import LIOPipeline
from tests.test_lio_pipeline import small_cfg


def _spmd_cfg():
    cfg = small_cfg()
    cfg.shapes.n_raw = 4096
    cfg.shapes.n_ds = 2048
    cfg.shapes.knn_chunk = 2048
    cfg.shapes.map_capacity_log2 = 14
    # (8,8,5): the x/y torus span (102.4 m) must cover the ROOM's scan
    # extent (the +-30 m world, returns to 50 m) — the per-axis insert
    # window otherwise rightly refuses to map the far walls and ATE
    # degrades.  12.8 m z-span < det_range: explicit opt-in (room ~3 m
    # tall, the z window never actually clips).
    cfg.shapes.map_dense_log2 = (8, 8, 5)
    cfg.shapes.map_dense_z_clip = True
    # non-binding budget (= n_ds): when the budget binds, the spmd
    # insert's per-slice ascending caps select a DIFFERENT (equally
    # valid, self-healing) row subset than the global ascending cap —
    # the equality test isolates reduction-order noise instead
    cfg.shapes.insert_mom_budget = 2048
    cfg.mapping.det_range = 20.0  # 2*det_range fits the (7,7) torus span
    cfg.ikdtree.plane_cache = True
    cfg.ikdtree.plane_cache_warmup = 12
    cfg.ikdtree.mom_dense = True
    cfg.ikdtree.single_association = True
    cfg.ikdtree.early_converge = True
    return cfg


def _run(pipe, groups, origin):
    for g in groups:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    pipe.flush()
    traj = np.asarray(pipe.trajectory)
    gts = np.stack([g["gt_pos"] for g in groups[-len(traj):]]) - origin
    errs = np.linalg.norm(traj[:, :3] - gts, axis=1)
    return traj, float(np.sqrt(np.mean(errs ** 2)))


@pytest.mark.slow
def test_spmd_window_matches_production_8dev():
    """Full warmup + steady sequence through the production window step
    and the 8-device SPMD window step: trajectories agree to f32
    reduction-order noise, and both track ground truth."""
    W = 4
    groups = make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=3000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    origin = np.array([0.0, 0.0, 1.5])

    prod = LIOPipeline(_spmd_cfg(), window=W)
    traj_p, ate_p = _run(prod, groups, origin)

    mesh = sharded.make_mesh(jax.devices("cpu")[:8])
    spmd = LIOPipeline(_spmd_cfg(), window=W, mesh=mesh)
    traj_s, ate_s = _run(spmd, groups, origin)

    assert ate_p < 0.12 and ate_s < 0.12, (ate_p, ate_s)
    n = min(len(traj_p), len(traj_s))
    dpos = np.abs(traj_p[:n, :3] - traj_s[:n, :3]).max()
    # identical math modulo the psum'd-Gram f32 reduction order
    assert dpos < 2e-3, f"max |pos diff| {dpos:.2e}"
    # the steady program actually ran on both paths
    assert prod.ls.map.dmom is not None and spmd.ls.map.dmom is not None
    # the replicated dense moment tables stay essentially in lockstep
    a = np.asarray(prod.ls.map.dmom)
    b = np.asarray(spmd.ls.map.dmom)
    frac_diff = np.mean(np.any(np.abs(a - b) > 1e-3, axis=1))
    assert frac_diff < 0.01, f"dmom rows differing: {frac_diff:.4f}"


def test_spmd_window_single_device_mesh():
    """A 1-device mesh runs the production program plus identity
    collectives — the structural-overhead measurement configuration
    (tools/bench_sharded_overhead.py)."""
    W = 2
    groups = make_lio_sequence(
        duration=1.6, scan_rate=10.0, imu_rate=100.0, n_points=2000, seed=5,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=1.0),
    )
    origin = np.array([0.0, 0.0, 1.5])
    mesh = sharded.make_mesh(jax.devices("cpu")[:1])
    pipe = LIOPipeline(_spmd_cfg(), window=W, mesh=mesh)
    traj, _ = _run(pipe, groups, origin)
    assert len(traj) > 4 and np.all(np.isfinite(traj))


def test_insert_dense_moments_spmd_bit_exact(rng):
    """The sharded-arithmetic insert (slice + all_gather of delta rows)
    is BIT-identical to the single-device call when the budget doesn't
    bind: same selected set, one add per cell."""
    from tests.test_mom_dense import _mk, _unique_voxel_batch

    voxel = 1.0
    m = _mk(voxel=voxel, dense=(6, 6, 5))
    dshape = m.dense.shape
    warm = _unique_voxel_batch(rng, 256, voxel, lo=-25.0, hi=25.0)
    m = vh.insert(m, jnp.asarray(warm), jnp.ones(len(warm), bool),
                  pre_grouped=True)
    dmom0 = vh.build_dense_moments(m, center=np.zeros(3))

    batch = _unique_voxel_batch(rng, 256, voxel, lo=-25.0, hi=25.0)
    valid = rng.random(256) > 0.15
    # + 0: fresh buffer (insert_dense_moments donates its dmom arg)
    ref, n_ref = vh.insert_dense_moments(
        dmom0 + 0, dshape, m.voxel_size, jnp.asarray(batch),
        jnp.asarray(valid), mom_cap=3, mom_budget=256)

    mesh = sharded.make_mesh(jax.devices("cpu")[:8])
    vs = m.voxel_size

    def local(d, p, v):
        return vh.insert_dense_moments(
            d, dshape, vs, p, v, mom_cap=3, mom_budget=256,
            spmd_axis="dp", spmd_ndev=8)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P()),
        check_vma=False))
    got, n_got = f(dmom0, jnp.asarray(batch), jnp.asarray(valid))
    assert int(n_got) == int(n_ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_insert_dense_moments_spmd_binding_budget(rng):
    """BINDING budget with front-compacted valid rows (the
    voxel_downsample layout): the strided per-device row subset must
    spread the need-rows evenly, so the aggregate selection matches the
    single-chip global ascending cap exactly — a contiguous-slice
    partition would saturate the first device(s) at budget/D and
    collapse the effective insert budget ~D-fold (ADVICE r4, medium)."""
    from tests.test_mom_dense import _mk, _unique_voxel_batch

    voxel = 1.0
    m = _mk(voxel=voxel)
    dshape = m.dense.shape
    seed = _unique_voxel_batch(rng, 64, voxel)
    m = vh.insert(m, jnp.asarray(seed), jnp.ones(64, bool),
                  pre_grouped=True)
    dmom0 = vh.build_dense_moments(m, center=np.zeros(3))

    batch = _unique_voxel_batch(rng, 256, voxel, lo=-25.0, hi=25.0)
    valid = np.zeros(256, bool)
    valid[:64] = True  # front-compacted, like voxel_downsample output
    budget = 32  # binds: 64 need-rows > 32

    ref, n_ref = vh.insert_dense_moments(
        dmom0 + 0, dshape, m.voxel_size, jnp.asarray(batch),
        jnp.asarray(valid), mom_cap=3, mom_budget=budget)

    mesh = sharded.make_mesh(jax.devices("cpu")[:8])
    vs = m.voxel_size

    def local(d, p, v):
        return vh.insert_dense_moments(
            d, dshape, vs, p, v, mom_cap=3, mom_budget=budget,
            spmd_axis="dp", spmd_ndev=8)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P()),
        check_vma=False))
    got, n_got = f(dmom0, jnp.asarray(batch), jnp.asarray(valid))
    assert int(n_got) == int(n_ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # full budget applied (32 touched cells), not budget/D-collapsed (<=8)
    touched = int(np.sum(np.any(np.asarray(got) != np.asarray(dmom0),
                                axis=1)))
    assert touched == budget, touched


@pytest.mark.slow
def test_spmd_local_downsample_tracks_8dev():
    """spmd_local_downsample (per-device downsample of the raw shard,
    dedupe'd insert): a documented deviation from the global-sort
    program — must still track ground truth on the 8-device mesh."""
    W = 4
    groups = make_lio_sequence(
        duration=3.0, scan_rate=10.0, imu_rate=100.0, n_points=3000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    origin = np.array([0.0, 0.0, 1.5])
    cfg = _spmd_cfg()
    cfg.shapes.spmd_local_downsample = True
    mesh = sharded.make_mesh(jax.devices("cpu")[:8])
    pipe = LIOPipeline(cfg, window=W, mesh=mesh)
    traj, ate = _run(pipe, groups, origin)
    # bound looser than the exact-path tests: per-shard downsample
    # re-weights straddling voxels (up to D rows/voxel), and since the
    # r5 alias-free insert window the map carries the full far-wall
    # geometry (previously partially aliased away), shifting this tiny
    # 3-s run's ATE from ~0.12 to ~0.14 — tracking, not corruption
    # (the production-parity equality test pins the exact path)
    assert ate < 0.17, f"local-downsample spmd ATE {ate:.3f}"
    assert pipe.ls.map.dmom is not None


def test_insert_dense_moments_spmd_dedupe(rng):
    """Cross-shard duplicate voxels (per-shard downsample): the FIRST
    replace-row wins, a second one must not double-subtract the old
    cell row."""
    from tests.test_mom_dense import _mk

    voxel = 1.0
    m = _mk(voxel=voxel, dense=(5, 5, 5))
    dshape = m.dense.shape
    G = 32 * 32 * 32
    dmom0 = jnp.zeros((G, vh.DMOM_CH), jnp.float32)

    # 8 local batches of 4 rows each (pre-sliced inputs); shards 0 and 1
    # both insert a point into the SAME voxel x=35 (nonzero alias tag ->
    # replace path on the empty cell)
    n_dev, n_loc = 8, 4
    pts = np.zeros((n_dev * n_loc, 3), np.float32)
    valid = np.zeros(n_dev * n_loc, bool)
    pts[0] = [35.25, 4.5, 2.5]
    pts[n_loc] = [35.75, 4.5, 2.5]  # same voxel, different point
    valid[0] = valid[n_loc] = True

    mesh = sharded.make_mesh(jax.devices("cpu")[:8])
    vs = m.voxel_size

    def local(d, p, v):
        return vh.insert_dense_moments(
            d, dshape, vs, p, v, mom_cap=24, mom_budget=32,
            spmd_axis="dp", spmd_ndev=8, spmd_pre_sliced=True,
            spmd_dedupe=True)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()), check_vma=False))
    dmom, _ = f(dmom0, jnp.asarray(pts), jnp.asarray(valid))
    lin = vh._dense_linear(dshape, jnp.asarray([[35, 4, 2]]))
    row = np.asarray(dmom[lin])[0]
    # exactly ONE replace-row applied: count 1, moments = first point's
    assert row[1] == 1.0, f"cell count {row[1]} (dup replace applied?)"
    q0 = pts[0] - np.array([35, 4, 2]) * voxel
    np.testing.assert_allclose(row[2:5], q0, rtol=1e-6)

    # same-cell ACCUMULATE rows must both land: insert the same two
    # points again (cell now owned, tag matches -> accumulate path)
    dmom, _ = f(dmom, jnp.asarray(pts), jnp.asarray(valid))
    row = np.asarray(dmom[lin])[0]
    assert row[1] == 3.0, f"accumulates dropped (count {row[1]})"
