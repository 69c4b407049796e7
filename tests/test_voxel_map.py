"""Voxel-hash map tests: insert/query parity with brute-force kNN,
box-crop semantics, rebuild compaction, and determinism."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.map import voxel_hash as vh


def brute_knn(db, q, k):
    d2 = ((db[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1)


def test_insert_and_exact_knn_within_neighborhood(rng):
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float64)
    m = vh.make_map(capacity_log2=14, bucket=8, voxel_size=1.0, dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = rng.uniform(-8, 8, size=(64, 3))
    nb, d2, ok = vh.knn(m, jnp.asarray(q), k=5)
    d2 = np.asarray(d2)
    ok = np.asarray(ok)

    want = brute_knn(pts, q, 5)
    for i in range(len(q)):
        # all returned neighbors must be true db points
        got = np.asarray(nb)[i][ok[i]]
        for g in got:
            assert np.min(((pts - g) ** 2).sum(-1)) < 1e-12
        # where brute-force 5-NN are all within the 1-voxel shell, results
        # must agree exactly (guaranteed coverage radius = voxel_size)
        if want[i, 4] < 1.0**2:
            assert ok[i].all()
            np.testing.assert_allclose(np.sort(d2[i]), want[i], atol=1e-9)


def test_bucket_capacity_drops_excess(rng):
    # 100 points in one voxel, bucket=8: only 8 stored
    pts = rng.uniform(0, 0.4, size=(100, 3))
    m = vh.make_map(capacity_log2=8, bucket=8, voxel_size=0.5, dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(100, bool))
    assert int(vh.num_voxels(m)) == 1
    assert int(m.count.max()) == 8


def test_incremental_insert_accumulates(rng):
    m = vh.make_map(capacity_log2=12, bucket=4, voxel_size=0.5, dtype=jnp.float64)
    a = rng.uniform(-5, 5, size=(300, 3))
    b = rng.uniform(-5, 5, size=(300, 3))
    m = vh.insert(m, jnp.asarray(a), jnp.ones(300, bool))
    n1 = int(vh.num_voxels(m))
    m = vh.insert(m, jnp.asarray(b), jnp.ones(300, bool))
    n2 = int(vh.num_voxels(m))
    assert n2 >= n1
    # a point from batch one is still queryable
    nb, d2, ok = vh.knn(m, jnp.asarray(a[:8]), k=1)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-12)


def test_crop_and_rebuild(rng):
    pts = rng.uniform(-10, 10, size=(1000, 3))
    m = vh.make_map(capacity_log2=13, bucket=4, voxel_size=1.0, dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(1000, bool))
    lo = jnp.asarray([-5.0, -5.0, -5.0])
    hi = jnp.asarray([5.0, 5.0, 5.0])
    m2 = vh.crop_outside_box(m, lo, hi)

    inside = pts[np.all((pts >= -5) & (pts < 5), axis=1)]
    outside = pts[~np.all((pts >= -4) & (pts < 4), axis=1)]
    # inside points (away from voxel-center edge effects) still found
    probe = inside[np.all((inside >= -4) & (inside < 4), axis=1)][:32]
    _, d2, ok = vh.knn(m2, jnp.asarray(probe), k=1)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-12)
    # outside points (away from boundary) gone
    probe_out = outside[np.any((outside < -6) | (outside >= 6), axis=1)][:32]
    _, _, ok_out = vh.knn(m2, jnp.asarray(probe_out), k=1)
    d2o = np.asarray(vh.knn(m2, jnp.asarray(probe_out), k=1)[1])[:, 0]
    assert not np.any(d2o < 1e-9)

    # rebuild compacts tombstones but preserves the live set
    m3 = vh.rebuild(m2)
    assert int(np.asarray(vh.tombstone_fraction(m3)) == 0)
    _, d2r, okr = vh.knn(m3, jnp.asarray(probe), k=1)
    assert np.asarray(okr).all()
    np.testing.assert_allclose(np.asarray(d2r)[:, 0], 0.0, atol=1e-12)


def test_insert_deterministic(rng):
    pts = rng.uniform(-10, 10, size=(500, 3))
    ms = []
    for _ in range(2):
        m = vh.make_map(capacity_log2=12, bucket=4, voxel_size=0.7,
                        dtype=jnp.float64)
        m = vh.insert(m, jnp.asarray(pts), jnp.ones(500, bool))
        ms.append(m)
    np.testing.assert_array_equal(np.asarray(ms[0].coords), np.asarray(ms[1].coords))
    np.testing.assert_array_equal(np.asarray(ms[0].state), np.asarray(ms[1].state))
    np.testing.assert_array_equal(np.asarray(ms[0].points), np.asarray(ms[1].points))


def test_masked_rows_ignored(rng):
    pts = rng.uniform(-3, 3, size=(64, 3))
    valid = np.zeros(64, bool)
    valid[:10] = True
    m = vh.make_map(capacity_log2=10, bucket=4, voxel_size=0.5, dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.asarray(valid))
    _, d2, ok = vh.knn(m, jnp.asarray(pts[10:20]), k=1)
    d2 = np.asarray(d2)[:, 0]
    # invalid points must not be present exactly (unless coincidentally near)
    for i, p in enumerate(pts[10:20]):
        dmin = ((pts[:10] - p) ** 2).sum(-1).min()
        if np.asarray(ok)[i, 0]:
            assert d2[i] >= dmin - 1e-9


def test_knn_sortjoin_matches_probe_knn(rng):
    """The sort-merge-join kNN must return identical results to the
    probing kNN (both search the same voxel neighborhood)."""
    pts = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float64)
    m = vh.make_map(capacity_log2=14, bucket=8, voxel_size=1.0,
                    dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    q = jnp.asarray(rng.uniform(-8, 8, size=(500, 3)))
    nb1, d1, ok1 = vh.knn(m, q, k=5)
    nb2, d2, ok2 = vh.knn_sortjoin(m, q, k=5)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_allclose(np.sort(np.asarray(d1), axis=1),
                               np.sort(np.asarray(d2), axis=1), atol=1e-12)


def test_knn_sortjoin_respects_crop(rng):
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float64)
    m = vh.make_map(capacity_log2=13, bucket=4, voxel_size=1.0,
                    dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    m = vh.crop_outside_box(m, jnp.asarray([-5.0, -5, -5]),
                            jnp.asarray([5.0, 5, 5]))
    outside = pts[np.any((pts < -7) | (pts > 7), axis=1)][:64]
    _, d2, ok = vh.knn_sortjoin(m, jnp.asarray(outside), k=1)
    assert not np.any(np.asarray(d2)[:, 0] < 1e-9)


def test_dense_index_matches_probe_lookup(rng):
    """kNN through the dense torus index must equal the probe path,
    including after crops (stale-row invalidation) and re-inserts."""
    pts = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float64)
    kw = dict(capacity_log2=13, bucket=4, voxel_size=1.0, dtype=jnp.float64)
    # torus dims must cover the live span (32 > 20 cells per axis) or
    # wrap-aliasing turns dense hits into (legal but inexact) misses
    md = vh.make_map(dense_log2=(5, 5, 5), **kw)
    mp = vh.make_map(**kw)
    md = vh.insert(md, jnp.asarray(pts), jnp.ones(len(pts), bool))
    mp = vh.insert(mp, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = jnp.asarray(rng.uniform(-8, 8, size=(300, 3)))
    for m2, m1 in [(md, mp)]:
        nb1, d1, ok1 = vh.knn(m1, q, k=5)
        nb2, d2, ok2 = vh.knn(m2, q, k=5)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        np.testing.assert_allclose(np.sort(np.asarray(d1), 1),
                                   np.sort(np.asarray(d2), 1), atol=1e-12)

    # crop then re-insert a second batch; parity must hold throughout
    lo = jnp.asarray([-5.0, -5.0, -5.0]); hi = jnp.asarray([5.0, 5.0, 5.0])
    md = vh.crop_outside_box(md, lo, hi)
    mp = vh.crop_outside_box(mp, lo, hi)
    pts2 = rng.uniform(-9, 9, size=(1500, 3)).astype(np.float64)
    md = vh.insert(md, jnp.asarray(pts2), jnp.ones(len(pts2), bool))
    mp = vh.insert(mp, jnp.asarray(pts2), jnp.ones(len(pts2), bool))
    nb1, d1, ok1 = vh.knn(mp, q, k=5)
    nb2, d2, ok2 = vh.knn(md, q, k=5)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_allclose(np.sort(np.asarray(d1), 1),
                               np.sort(np.asarray(d2), 1), atol=1e-12)

    # rebuild keeps the dense config and stays consistent
    md = vh.rebuild(md)
    assert md.dense is not None
    _, d3, ok3 = vh.knn(md, q, k=5)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok3))
    np.testing.assert_allclose(np.sort(np.asarray(d1), 1),
                               np.sort(np.asarray(d3), 1), atol=1e-12)


def test_knn_max_live_prunes_exactly_when_few_live(rng):
    """With max_live >= live neighborhood cells the pruned kNN is exact."""
    pts = rng.uniform(-10, 10, size=(1000, 3)).astype(np.float64)
    m = vh.make_map(capacity_log2=13, bucket=4, voxel_size=1.0,
                    dtype=jnp.float64)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    q = jnp.asarray(rng.uniform(-8, 8, size=(200, 3)))
    nb1, d1, ok1 = vh.knn(m, q, k=5)
    nb2, d2, ok2 = vh.knn(m, q, k=5, max_live=27)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_allclose(np.sort(np.asarray(d1), 1),
                               np.sort(np.asarray(d2), 1), atol=1e-12)


def test_insert_pre_grouped_matches_sorted(rng):
    """pre_grouped=True (distinct-voxel batches, e.g. downsampler output
    with leaf == map voxel) must produce the same map as the sorting
    path, including with a dense index present."""
    import numpy as np

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    pts = rng.uniform(-10, 10, size=(4000, 3)).astype(np.float32)
    ds, dv = voxel_downsample(jnp.asarray(pts), jnp.ones(4000, bool), 0.5,
                              out_size=4096)

    for dense in (None, (6, 6, 5)):
        m_a = vh.make_map(capacity_log2=13, bucket=4, voxel_size=0.5,
                          dtype=jnp.float32, dense_log2=dense, moments=True)
        m_b = vh.make_map(capacity_log2=13, bucket=4, voxel_size=0.5,
                          dtype=jnp.float32, dense_log2=dense, moments=True)
        # two rounds: the second exercises the dense-index fast find
        for _ in range(2):
            m_a = vh.insert(m_a, ds, dv)
            m_b = vh.insert(m_b, ds, dv, pre_grouped=True)
        assert int(vh.num_voxels(m_a)) == int(vh.num_voxels(m_b))
        # same stored point SETS per voxel
        def content(m):
            live = (np.asarray(m.key) & (1 << 30)) != 0
            out = {}
            cnt = np.asarray(m.count)
            P = np.asarray(m.points)
            co = np.asarray(m.coords)
            for s in np.where(live)[0]:
                out[tuple(co[s])] = (cnt[s],
                                     tuple(sorted(map(tuple, np.round(P[s, :cnt[s]], 4)))))
            return out
        assert content(m_a) == content(m_b)
        np.testing.assert_allclose(
            np.asarray(m_a.mom).sum(0), np.asarray(m_b.mom).sum(0),
            rtol=1e-5, atol=1e-4)


def test_insert_budgets_parity_and_self_heal(rng):
    """claim_budget/dense_budget: under-budget batches must be IDENTICAL
    to the uncapped insert; over-budget batches drop overflow rows but
    self-heal when the same points are re-inserted (voxel_hash.insert)."""
    import jax

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    pts = rng.uniform(-10, 10, size=(4000, 3)).astype(np.float32)
    ds, dv = voxel_downsample(jnp.asarray(pts), jnp.ones(4000, bool), 0.5,
                              out_size=4096)
    n_vox_true = len({tuple(v) for v in
                      np.floor(np.asarray(ds)[np.asarray(dv)] / 0.5)
                      .astype(int).tolist()})

    # NB the dense torus must span the batch extent per axis (20 m here)
    # or in-batch aliased voxel pairs contend forever (insert docstring):
    # (7,7,6) cells at 0.5 m = 64x64x32 m; capacity 2^14 keeps the load
    # factor ~24% so no probe chain exceeds max_probe
    kw = dict(capacity_log2=14, bucket=4, voxel_size=0.5,
              dtype=jnp.float32, dense_log2=(7, 7, 6), moments=True)

    # 1) budgets >= misses: bit-identical to uncapped
    m_a = vh.insert(vh.make_map(**kw), ds, dv, pre_grouped=True)
    m_b = vh.insert(vh.make_map(**kw), ds, dv, pre_grouped=True,
                    claim_budget=4096, dense_budget=4096)
    for a, b in zip(jax.tree_util.tree_leaves(m_a),
                    jax.tree_util.tree_leaves(m_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2) budget < new voxels: first insert claims only `budget`, repeated
    # inserts converge to the full set, and the dense index serves knn
    m = vh.make_map(**kw)
    for _ in range(80):
        m = vh.insert(m, ds, dv, pre_grouped=True,
                      claim_budget=64, dense_budget=64)
        if int(vh.num_voxels(m)) == n_vox_true:
            break
    assert int(vh.num_voxels(m)) == n_vox_true
    q = np.asarray(ds)[np.asarray(dv)][:64]
    _, d2, ok = vh.knn(m, jnp.asarray(q), k=1)
    assert bool(np.all(np.asarray(ok)[:, 0]))
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-9)


def test_insert_moments_only_matches_full_except_buckets(rng):
    """moments_only insert: key/mom/dense identical to the full insert,
    points/count untouched (voxel_hash.insert moments_only docstring)."""
    import jax

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    pts = rng.uniform(-10, 10, size=(4000, 3)).astype(np.float32)
    ds, dv = voxel_downsample(jnp.asarray(pts), jnp.ones(4000, bool), 0.5,
                              out_size=4096)
    kw = dict(capacity_log2=14, bucket=4, voxel_size=0.5,
              dtype=jnp.float32, dense_log2=(7, 7, 6), moments=True)

    # seed both maps with a first (full) insert = the warmup program
    seed = rng.uniform(-10, 10, size=(1000, 3)).astype(np.float32)
    sv = jnp.ones(1000, bool)
    sd, sdv = voxel_downsample(jnp.asarray(seed), sv, 0.5, out_size=1024)
    m0 = vh.insert(vh.make_map(**kw), sd, sdv, pre_grouped=True)

    copy = lambda m: jax.tree_util.tree_map(jnp.copy, m)  # noqa: E731
    m_full = vh.insert(copy(m0), ds, dv, pre_grouped=True)
    m_mo = vh.insert(copy(m0), ds, dv, pre_grouped=True, moments_only=True)

    np.testing.assert_array_equal(np.asarray(m_full.key), np.asarray(m_mo.key))
    np.testing.assert_array_equal(np.asarray(m_full.mom), np.asarray(m_mo.mom))
    np.testing.assert_array_equal(np.asarray(m_full.dense),
                                  np.asarray(m_mo.dense))
    # buckets frozen at the seed state
    np.testing.assert_array_equal(np.asarray(m_mo.points),
                                  np.asarray(m0.points))
    np.testing.assert_array_equal(np.asarray(m_mo.count), np.asarray(m0.count))
    # and the full insert did change them (the test is not vacuous)
    assert not np.array_equal(np.asarray(m_full.count), np.asarray(m0.count))


def test_crop_and_rebuild_preserve_moments_only_voxels(rng):
    """Voxels created by moments_only inserts hold no bucket points; the
    box crop and the rebuild must still see their true coordinates (from
    the packed key, unwrapped around the box/cube center) instead of
    killing or dropping them (crop_outside_box / rebuild docstrings)."""
    import jax

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    kw = dict(capacity_log2=14, bucket=4, voxel_size=0.5,
              dtype=jnp.float32, dense_log2=(7, 7, 6), moments=True)
    # warmup points near origin (full insert), then a moments-only batch
    # offset to +x so crop can discriminate
    seed = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    sd, sdv = voxel_downsample(jnp.asarray(seed), jnp.ones(800, bool), 0.5,
                               out_size=1024)
    m = vh.insert(vh.make_map(**kw), sd, sdv, pre_grouped=True)
    n_seed = int(vh.num_voxels(m))

    mo_pts = rng.uniform(6, 12, size=(800, 3)).astype(np.float32)
    md, mdv = voxel_downsample(jnp.asarray(mo_pts), jnp.ones(800, bool), 0.5,
                               out_size=1024)
    n_mo = int(jnp.sum(mdv))
    m = vh.insert(m, md, mdv, pre_grouped=True, moments_only=True)
    assert int(vh.num_voxels(m)) == n_seed + n_mo

    # crop to a box that CONTAINS everything: nothing may be killed
    # (the old points-derived coords put moments-only voxels at the
    # sentinel, far outside, and killed them all)
    lo = jnp.asarray([-20.0, -20.0, -20.0]); hi = jnp.asarray([20.0] * 3)
    mc = vh.crop_outside_box(jax.tree_util.tree_map(jnp.copy, m), lo, hi)
    assert int(vh.num_voxels(mc)) == n_seed + n_mo

    # crop away the seed region only: exactly the moments-only voxels stay
    mc2 = vh.crop_outside_box(
        jax.tree_util.tree_map(jnp.copy, m),
        jnp.asarray([5.75, 5.75, 5.75]), jnp.asarray([20.0] * 3))
    assert int(vh.num_voxels(mc2)) == n_mo

    # rebuild with a center: moments-only voxels survive with moments
    mr = vh.rebuild(jax.tree_util.tree_map(jnp.copy, m),
                    center=jnp.zeros(3))
    assert int(vh.num_voxels(mr)) == n_seed + n_mo
    assert float(jnp.sum(mr.mom[:, 0])) == float(jnp.sum(m.mom[:, 0]))


def test_insert_mom_budget_freeze_parity(rng):
    """Compacted moment scatter (mom_budget): below saturation and under
    budget it must be bit-identical to the full scatter; saturated voxels
    freeze at exactly mom_cap points (voxel_hash.insert docstring)."""
    import jax

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    kw = dict(capacity_log2=14, bucket=4, voxel_size=0.5,
              dtype=jnp.float32, dense_log2=(7, 7, 6), moments=True)
    pts = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    ds, dv = voxel_downsample(jnp.asarray(pts), jnp.ones(3000, bool), 0.5,
                              out_size=4096)
    copy = lambda m: jax.tree_util.tree_map(jnp.copy, m)  # noqa: E731

    # 1) one insert into an empty map: n=1 everywhere < cap -> identical
    m_full = vh.insert(vh.make_map(**kw), ds, dv, pre_grouped=True)
    m_bud = vh.insert(vh.make_map(**kw), ds, dv, pre_grouped=True,
                      mom_cap=8, mom_budget=4096)
    np.testing.assert_array_equal(np.asarray(m_full.mom),
                                  np.asarray(m_bud.mom))

    # 2) repeated inserts: counts freeze at exactly mom_cap
    m = vh.make_map(**kw)
    for _ in range(12):
        m = vh.insert(copy(m), ds, dv, pre_grouped=True,
                      mom_cap=8, mom_budget=4096)
    nmax = float(np.asarray(m.mom[:, 0]).max())
    assert nmax == 8.0, nmax

    # 3) budget < needy rows: overflow self-heals on re-insert (each
    # insert serves 256 needy rows; cohorts saturate after cap inserts,
    # so coverage needs ~ceil(n_vox/budget)*cap rounds)
    m = vh.make_map(**kw)
    n_vox = None
    for _ in range(80):
        m = vh.insert(copy(m), ds, dv, pre_grouped=True,
                      mom_cap=4, mom_budget=256)
        n_vox = float(np.asarray(m.mom[:, 0] > 0).sum())
        if n_vox == int(vh.num_voxels(m)):
            break
    live = int(vh.num_voxels(m))
    assert n_vox == live, (n_vox, live)
