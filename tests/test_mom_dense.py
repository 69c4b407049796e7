"""Dense-moment fast path (VoxelHashMap.dmom, IkdtreeConfig.mom_dense).

Covers: the warmup handoff (build_dense_moments) producing association
sums bit-identical to the slot-moment path, the steady insert
(insert_dense_moments) matching the slot path's freeze-at-cap +
budget-compaction semantics exactly, torus-alias overwrite, and the
end-to-end pipeline tracking with mom_dense on.

Reference semantics being replaced: ikd-Tree Add_Points accumulation +
the FoV box-delete (ikd_Tree.cpp:414, laserMapping.cpp:1136-1200); the
deviation (torus-wrap forgetting instead of box deletion) is documented
in IkdtreeConfig.mom_dense.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.core import measurement
from better_fastlio2_tpu.map import voxel_hash as vh


def _mk(voxel=1.0, cap_log2=14, dense=(7, 7, 5)):
    return vh.make_map(capacity_log2=cap_log2, bucket=4, voxel_size=voxel,
                       dtype=jnp.float32, dense_log2=dense, moments=True)


def _unique_voxel_batch(rng, n, voxel, lo=-40.0, hi=40.0):
    """n points in n distinct voxels (the pre_grouped contract)."""
    span = int((hi - lo) / voxel)
    cells = rng.choice(span * span * 8, size=n, replace=False)
    i = cells % span
    j = (cells // span) % span
    k = cells // (span * span)
    ijk = np.stack([i, j, k], -1).astype(np.float64)
    ijk[:, 0] += lo / voxel
    ijk[:, 1] += lo / voxel
    pts = (ijk + rng.uniform(0.05, 0.95, size=(n, 3))) * voxel
    return pts.astype(np.float32)


def test_build_dense_moments_association_parity(rng):
    m = _mk()
    # extent per axis must fit the torus span ((7,7,5) @ 1 m = 128/128/32)
    pts = rng.uniform(-30, 30, size=(4000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-12, 12, size=4000).astype(np.float32)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    dmom = vh.build_dense_moments(m, center=np.zeros(3))
    md = m._replace(dmom=dmom)

    q = pts[::7]
    s_slot, ijk_s = measurement.neighborhood_moment_sums(m, jnp.asarray(q))
    s_dense, ijk_d = measurement.neighborhood_moment_sums(md, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(ijk_s), np.asarray(ijk_d))
    np.testing.assert_array_equal(np.asarray(s_slot), np.asarray(s_dense))

    # full plane outputs identical too
    n1, d1, ok1 = measurement.plane_from_moments(
        m, jnp.asarray(q), jnp.ones(len(q), bool))
    n2, d2, ok2 = measurement.plane_from_moments(
        md, jnp.asarray(q), jnp.ones(len(q), bool))
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_insert_dense_moments_matches_slot_path(rng):
    """Steady-state inserts through both paths accumulate identical
    moments, including freeze-at-cap and budget-overflow behavior."""
    voxel = 1.0
    mom_cap, mom_budget = 3, 192
    m = _mk(voxel=voxel)
    dshape = m.dense.shape

    # warmup batch through the full insert, then hand off
    warm = _unique_voxel_batch(rng, 256, voxel)
    m = vh.insert(m, jnp.asarray(warm), jnp.ones(len(warm), bool),
                  pre_grouped=True)
    dmom = vh.build_dense_moments(m, center=np.zeros(3))

    for it in range(5):
        batch = _unique_voxel_batch(rng, 256, voxel)
        valid = rng.random(256) > 0.1
        # slot path: moments_only steady insert with the same budgets
        m = vh.insert(m, jnp.asarray(batch), jnp.asarray(valid),
                      pre_grouped=True, moments_only=True,
                      mom_cap=mom_cap, mom_budget=mom_budget)
        dmom, _ = vh.insert_dense_moments(
            dmom, dshape, m.voxel_size, jnp.asarray(batch),
            jnp.asarray(valid), mom_cap=mom_cap, mom_budget=mom_budget)

    md = m._replace(dmom=dmom)
    q = np.concatenate([warm, _unique_voxel_batch(rng, 128, voxel)])
    s_slot, _ = measurement.neighborhood_moment_sums(m, jnp.asarray(q))
    s_dense, _ = measurement.neighborhood_moment_sums(md, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(s_slot), np.asarray(s_dense))


def test_torus_alias_overwrite():
    """A voxel one torus period away atomically replaces the stale row —
    the torus-wrap forgetting that substitutes for the FoV box crop."""
    voxel = 1.0
    m = _mk(voxel=voxel, dense=(5, 5, 5))  # 32-cell period per axis
    dshape = m.dense.shape
    G = 32 * 32 * 32
    dmom = jnp.zeros((G, vh.DMOM_CH), jnp.float32)

    # voxel x=35 -> nonzero alias tag (a tag-0 voxel in an empty cell is
    # indistinguishable from "own" — correct but not what this test probes)
    p0 = np.array([[35.25, 4.5, 2.5]], np.float32)
    p1 = p0 + np.array([[32.0, 0.0, 0.0]], np.float32)  # same torus cell
    v = jnp.ones(1, bool)
    dmom, n0 = vh.insert_dense_moments(dmom, dshape, m.voxel_size,
                                       jnp.asarray(p0), v, 24, 8)
    assert int(n0) == 1
    row0 = np.asarray(
        dmom[vh._dense_linear(dshape, jnp.asarray([[35, 4, 2]]))])
    assert row0[0, 1] == 1.0

    dmom, n1 = vh.insert_dense_moments(dmom, dshape, m.voxel_size,
                                       jnp.asarray(p1), v, 24, 8)
    assert int(n1) == 1  # counted as a NEW cell (stale row replaced)
    lin = vh._dense_linear(dshape, jnp.asarray([[67, 4, 2]]))
    row1 = np.asarray(dmom[lin])[0]
    # count reset to 1, tag now the far voxel's, moments are p1's alone
    assert row1[1] == 1.0
    q1 = p1[0] - np.array([67, 4, 2]) * voxel
    np.testing.assert_allclose(row1[2:5], q1, rtol=1e-6)
    # association from the OLD position now sees nothing (tag mismatch)
    md = m._replace(dmom=dmom)
    sums, _ = measurement.neighborhood_moment_sums(md, jnp.asarray(p0))
    assert float(np.asarray(sums)[0, 0]) == 0.0
    # ... and from the new position sees exactly one point
    sums1, _ = measurement.neighborhood_moment_sums(md, jnp.asarray(p1))
    assert float(np.asarray(sums1)[0, 0]) == 1.0


def test_freeze_at_cap_stops_accumulating():
    voxel = 1.0
    m = _mk(voxel=voxel, dense=(5, 5, 5))
    dshape = m.dense.shape
    dmom = jnp.zeros((32 * 32 * 32, vh.DMOM_CH), jnp.float32)
    p = jnp.asarray([[2.5, 2.5, 2.5]], jnp.float32)
    v = jnp.ones(1, bool)
    for _ in range(6):
        dmom, _ = vh.insert_dense_moments(dmom, dshape, m.voxel_size,
                                          p, v, mom_cap=3, mom_budget=4)
    lin = vh._dense_linear(dshape, jnp.asarray([[2, 2, 2]]))
    assert float(np.asarray(dmom[lin])[0, 1]) == 3.0  # frozen at cap


@pytest.mark.slow
def test_lio_mom_dense_tracks_trajectory():
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline
    from tests.test_lio_pipeline import small_cfg

    cfg = small_cfg()
    cfg.ikdtree.plane_cache = True
    cfg.ikdtree.plane_cache_warmup = 12
    cfg.ikdtree.mom_dense = True
    cfg.ikdtree.single_association = True
    cfg.mapping.det_range = 20.0  # tiny room world; 2*det_range must fit the torus x/y span
    cfg.shapes.map_dense_log2 = (8, 8, 5)
    cfg.shapes.map_dense_z_clip = True  # 12.8 m z-span < det_range: opt in (room ~3 m tall; clip never fires)
    cfg.shapes.insert_mom_budget = 1024
    groups = make_lio_sequence(
        duration=4.0, scan_rate=10.0, imu_rate=100.0, n_points=4000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    pipe = LIOPipeline(cfg)
    errs = []
    origin = np.array([0.0, 0.0, 1.5])
    for g in groups:
        out = pipe.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is not None:
            errs.append(np.linalg.norm(out["pos"] - (g["gt_pos"] - origin)))
    assert pipe.ls.map.dmom is not None  # the steady program actually ran
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.10, f"mom_dense ATE RMSE {ate:.3f} m"
    assert errs[-1] < 0.15


def _z_cfg(dense=(8, 8, 4), z_clip=False):
    from tests.test_lio_pipeline import small_cfg

    cfg = small_cfg()
    cfg.ikdtree.plane_cache = True
    cfg.ikdtree.plane_cache_warmup = 12
    cfg.ikdtree.mom_dense = True
    cfg.ikdtree.single_association = True
    cfg.mapping.det_range = 20.0
    cfg.shapes.map_dense_log2 = dense
    cfg.shapes.map_dense_z_clip = z_clip
    return cfg


def test_short_z_span_is_hard_error():
    """A mom_dense torus whose z span is below det_range would silently
    alias distinct voxels of a tall scene within one insert batch — the
    step factory must refuse it unless map_dense_z_clip opts in."""
    from better_fastlio2_tpu.pipeline.lio import _make_step_core

    with pytest.raises(ValueError, match="z axis"):
        _make_step_core(_z_cfg(dense=(8, 8, 4), z_clip=False))
    # the opt-in builds fine
    _make_step_core(_z_cfg(dense=(8, 8, 4), z_clip=True))


def test_map_dense_log2_autoderive():
    """map_dense_log2=None auto-sizes the torus from det_range/voxel so
    the aliasing preconditions hold by construction."""
    from better_fastlio2_tpu.config import derive_map_dense_log2
    from better_fastlio2_tpu.pipeline.lio import _make_step_core

    cfg = _z_cfg(dense=None)
    _make_step_core(cfg)
    # det_range 20, voxel 0.4: xy >= 100 cells -> 2^7, z >= 50 -> 2^6
    assert cfg.shapes.map_dense_log2 == (7, 7, 6)
    assert derive_map_dense_log2(20.0, 0.4) == (7, 7, 6)


@pytest.mark.slow
def test_z_clip_tall_geometry_stays_consistent():
    """Geometry taller than the torus z span, with the explicit
    map_dense_z_clip override: the sensor-centred insert window keeps
    the moment table consistent (no within-batch alias corruption: all
    counts finite and non-negative) and tracking holds.  Without the
    override this exact config is the hard error proven above."""
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline

    cfg = _z_cfg(dense=(8, 8, 4), z_clip=True)  # z span 6.4 m
    cfg.shapes.insert_mom_budget = 1024
    groups = make_lio_sequence(
        duration=4.0, scan_rate=10.0, imu_rate=100.0, n_points=4000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    rng = np.random.default_rng(7)
    pipe = LIOPipeline(cfg)
    errs = []
    origin = np.array([0.0, 0.0, 1.5])
    for g in groups:
        # a tall column (0..30 m, far beyond the 6.4 m span) riding in
        # every scan — without the clip its voxels alias within a batch
        k = 160
        col = np.stack([
            np.full(k, 3.0) + 0.02 * rng.standard_normal(k),
            0.02 * rng.standard_normal(k),
            np.linspace(-1.0, 30.0, k),
        ], axis=1).astype(np.float32)
        pts = np.concatenate([g["pts"], col])
        pt_t = np.concatenate([g["pt_t"], np.zeros(k, np.float32)])
        out = pipe.process_scan(
            pts, pt_t, g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is not None:
            errs.append(np.linalg.norm(out["pos"] - (g["gt_pos"] - origin)))
    assert pipe.ls.map.dmom is not None
    dm = np.asarray(pipe.ls.map.dmom)
    counts = dm[:, 1]
    assert np.all(np.isfinite(dm)), "corrupted moment rows"
    assert counts.min() >= 0.0, "negative voxel count = alias corruption"
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.15, f"tall-geometry z-clip ATE {ate:.3f} m"


@pytest.mark.slow
def test_window_quantized_mom_dense_matches_single_scan():
    """The bench-path combination (W>1 window + quantized wire +
    mom_dense + early_converge) must track like the single-scan path —
    this is the exact program bench.py times, exercised here on CPU."""
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline
    from tests.test_lio_pipeline import small_cfg

    def cfg():
        c = small_cfg()
        c.ikdtree.plane_cache = True
        c.ikdtree.plane_cache_warmup = 12
        c.ikdtree.mom_dense = True
        c.ikdtree.single_association = True
        c.ikdtree.early_converge = True
        c.mapping.det_range = 20.0
        c.shapes.map_dense_log2 = (8, 8, 5)
        c.shapes.map_dense_z_clip = True
        c.shapes.insert_mom_budget = 1024
        return c

    groups = make_lio_sequence(
        duration=4.0, scan_rate=10.0, imu_rate=100.0, n_points=4000, seed=3,
        noise=0.004, traj=Trajectory(t_still=1.0, speed=2.0),
    )
    origin = np.array([0.0, 0.0, 1.5])

    def run(**kw):
        pipe = LIOPipeline(cfg(), **kw)
        for g in groups:
            pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"],
                              g["imu_gyr"], g["imu_t"], g["scan_beg_abs"],
                              g["scan_end_t"])
        pipe.flush()
        traj = np.asarray(pipe.trajectory)
        gts = np.stack([g["gt_pos"] for g in groups[-len(traj):]]) - origin
        errs = np.linalg.norm(traj[:, :3] - gts, axis=1)
        return float(np.sqrt(np.mean(errs ** 2)))

    ate_single = run()
    ate_win = run(pipelined=True, window=4, quantized=True, unroll=4)
    assert ate_win < 0.12, f"windowed mom_dense ATE {ate_win:.3f}"
    # quantization steps are mm-scale: the two paths agree closely
    assert abs(ate_win - ate_single) < 0.05, (ate_win, ate_single)


def test_mom_cap_zero_means_unbounded():
    """mom_cap <= 0 is 'uncapped' (insert()'s contract) — a literal
    n_seen < 0 gate would freeze the dense table forever."""
    voxel = 1.0
    m = _mk(voxel=voxel, dense=(5, 5, 5))
    dshape = m.dense.shape
    dmom = jnp.zeros((32 * 32 * 32, vh.DMOM_CH), jnp.float32)
    p = jnp.asarray([[2.5, 2.5, 2.5]], jnp.float32)
    v = jnp.ones(1, bool)
    for _ in range(5):
        dmom, _ = vh.insert_dense_moments(dmom, dshape, m.voxel_size,
                                          p, v, mom_cap=0, mom_budget=4)
    lin = vh._dense_linear(dshape, jnp.asarray([[2, 2, 2]]))
    assert float(np.asarray(dmom[lin])[0, 1]) == 5.0  # kept accumulating


def test_rebuild_carries_dense_moment_table(rng):
    """rebuild() must carry dmom through — it is keyed by torus address
    + alias tag, not slots, so hash-table compaction cannot invalidate
    it (dropping it would revert a mom_dense run to warmup content)."""
    m = _mk()
    pts = rng.uniform(-20, 20, size=(800, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-10, 10, size=800).astype(np.float32)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    dmom = vh.build_dense_moments(m, center=np.zeros(3))
    m = m._replace(dmom=dmom)
    mr = vh.rebuild(m, center=np.zeros(3))
    assert mr.dmom is not None
    np.testing.assert_array_equal(np.asarray(mr.dmom), np.asarray(dmom))
