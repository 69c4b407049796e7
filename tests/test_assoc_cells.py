"""Reduced association neighborhoods (shapes.assoc_cells).

The steady-state plane-cache association normally blends the 7-cell
neighborhood (own + 6 face neighbors).  "tangent5" reads the own cell
first, takes its moment normal, and blends only the 4 face neighbors on
the two TANGENT axes; "octant4" reads own + the 3 same-side neighbors.
The association gather is the dominant, random-row-bound step cost
(PERF.md), so the row count is a first-order perf knob.  Covers: sums
equal a numpy group-by blend of the expected cells, plane recovery on an
analytic plane, cell selection semantics, and slot-table vs dense-table
agreement.
"""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.core import measurement
from better_fastlio2_tpu.map import voxel_hash as vh


def _mom_numpy(pts, voxel):
    ijk = np.floor(pts / voxel).astype(np.int64)
    out = {}
    for p, v in zip(pts, ijk):
        q = p - v * voxel
        row = out.setdefault(tuple(v), np.zeros(10))
        row[0] += 1
        row[1:4] += q
        row[4:10] += [q[0] * q[0], q[0] * q[1], q[0] * q[2],
                      q[1] * q[1], q[1] * q[2], q[2] * q[2]]
    return out


def _rebase(row, delta):
    """Rebase corner-relative moments by delta (numpy reference)."""
    n, S1, S2 = row[0], row[1:4], row[4:10]
    iu = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    S1r = S1 + n * delta
    S2r = np.array([S2[k] + delta[a] * S1[b] + delta[b] * S1[a]
                    + n * delta[a] * delta[b]
                    for k, (a, b) in enumerate(iu)])
    return np.concatenate([[n], S1r, S2r])


def test_octant_sums_match_numpy_blend(rng):
    voxel = 0.5
    pts = rng.uniform(-4, 4, size=(3000, 3)).astype(np.float32)
    m = vh.make_map(capacity_log2=13, bucket=2, voxel_size=voxel,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    ref = _mom_numpy(pts, voxel)

    q = pts[:128]
    sums, ijk = measurement.neighborhood_moment_sums(
        m, jnp.asarray(q), cells="octant4")
    sums = np.asarray(sums)
    ijk = np.asarray(ijk)

    for i, p in enumerate(q):
        own = ijk[i]
        frac = p / voxel - own
        sgn = np.where(frac >= 0.5, 1, -1)
        cells = [tuple(own)]
        for a in range(3):
            c = own.copy()
            c[a] += sgn[a]
            cells.append(tuple(c))
        expect = np.zeros(10)
        for c in cells:
            if c in ref:
                delta = (np.array(c) - own) * voxel
                expect += _rebase(ref[c], delta)
        np.testing.assert_allclose(sums[i], expect, rtol=1e-3, atol=1e-3)


def test_octant_recovers_analytic_plane(rng):
    n_true = np.array([-0.3, -0.1, 1.0])
    n_true = n_true / np.linalg.norm(n_true)
    xy = rng.uniform(0, 10, size=(8000, 2))
    z = 0.3 * xy[:, 0] + 0.1 * xy[:, 1] + 5.0
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts += 0.01 * rng.standard_normal(pts.shape).astype(np.float32)

    m = vh.make_map(capacity_log2=14, bucket=4, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = jnp.asarray(pts[:256])
    v = jnp.ones(256, bool)
    n4, d4, ok4 = measurement.plane_from_moments(m, q, v, cells="octant4")
    assert int(ok4.sum()) >= 250  # plane gates pass on planar geometry
    n4 = np.asarray(n4)[np.asarray(ok4)]
    cos = np.abs(n4 @ n_true)
    assert cos.min() > 0.999
    # residual of the fitted planes at the query points
    r = np.abs(np.einsum("ni,ni->n", np.asarray(n4),
                         np.asarray(q)[np.asarray(ok4)])
               + np.asarray(d4)[np.asarray(ok4)])
    assert r.max() < 0.05


def test_octant_slot_and_dense_paths_agree(rng):
    """The dmom dense-table gather and the slot-table gather must produce
    identical octant sums when both hold the same voxels."""
    voxel = 1.0
    m = vh.make_map(capacity_log2=14, bucket=4, voxel_size=voxel,
                    dtype=jnp.float32, dense_log2=(7, 7, 5), moments=True)
    pts = rng.uniform(-30, 30, size=(2000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-12, 12, size=2000).astype(np.float32)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    dmom = vh.build_dense_moments(m, center=np.zeros(3))
    md = m._replace(dmom=dmom)

    q = jnp.asarray(pts[:128])
    s_slot, _ = measurement.neighborhood_moment_sums(m, q, cells="octant4")
    s_dense, _ = measurement.neighborhood_moment_sums(md, q, cells="octant4")
    np.testing.assert_allclose(np.asarray(s_slot), np.asarray(s_dense),
                               rtol=1e-5, atol=1e-5)


def test_octant_cells_are_nearest_side(rng):
    """A point near the (+,+,+) corner of its cell must blend the +x/+y/+z
    neighbors, not the -side ones: seed geometry ONLY in the +side cells
    and check the octant union sees it while the 7-cell union of a
    -side-shifted twin point would."""
    voxel = 1.0
    # own cell [0,1)^3 empty of map points; +side neighbors populated
    side = []
    rng_pts = rng.uniform(0, 1, size=(60, 3)).astype(np.float32)
    side.append(rng_pts + np.array([1.0, 0.0, 0.0], np.float32))
    side.append(rng_pts + np.array([0.0, 1.0, 0.0], np.float32))
    side.append(rng_pts + np.array([0.0, 0.0, 1.0], np.float32))
    pts = np.concatenate(side)
    m = vh.make_map(capacity_log2=10, bucket=8, voxel_size=voxel,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q_plus = jnp.asarray([[0.9, 0.9, 0.9]], jnp.float32)  # +corner
    q_minus = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)  # -corner
    s_plus, _ = measurement.neighborhood_moment_sums(m, q_plus, cells="octant4")
    s_minus, _ = measurement.neighborhood_moment_sums(m, q_minus,
                                                      cells="octant4")
    assert float(s_plus[0, 0]) == 180.0  # all three +side cells blended
    assert float(s_minus[0, 0]) == 0.0  # -side cells are empty


def test_tangent5_sums_match_numpy_blend(rng):
    """tangent5 on near-planar geometry: dominant own-normal axis is z,
    so the union must be own + the ±x/±y ring (rebased)."""
    voxel = 0.5
    xy = rng.uniform(-4, 4, size=(6000, 2))
    z = 0.05 * rng.standard_normal(6000) + 1.2  # near-horizontal sheet
    pts = np.column_stack([xy, z]).astype(np.float32)
    m = vh.make_map(capacity_log2=13, bucket=2, voxel_size=voxel,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    ref = _mom_numpy(pts, voxel)

    q = pts[:96]
    sums, ijk = measurement.neighborhood_moment_sums(
        m, jnp.asarray(q), cells="tangent5")
    sums = np.asarray(sums)
    ijk = np.asarray(ijk)

    for i in range(len(q)):
        own = ijk[i]
        own_key = tuple(own)
        if own_key not in ref or ref[own_key][0] < 3:
            continue  # young own cell: z-prior fallback, same ring here
        cells = [own_key]
        for a, s in ((0, 1), (0, -1), (1, 1), (1, -1)):  # ±x, ±y ring
            c = own.copy()
            c[a] += s
            cells.append(tuple(c))
        expect = np.zeros(10)
        for c in cells:
            if c in ref:
                delta = (np.array(c) - own) * voxel
                expect += _rebase(ref[c], delta)
        np.testing.assert_allclose(sums[i], expect, rtol=1e-3, atol=1e-3)


def test_tangent5_recovers_analytic_plane(rng):
    n_true = np.array([-0.3, -0.1, 1.0])
    n_true = n_true / np.linalg.norm(n_true)
    xy = rng.uniform(0, 10, size=(8000, 2))
    z = 0.3 * xy[:, 0] + 0.1 * xy[:, 1] + 5.0
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts += 0.01 * rng.standard_normal(pts.shape).astype(np.float32)

    m = vh.make_map(capacity_log2=14, bucket=4, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = jnp.asarray(pts[:256])
    v = jnp.ones(256, bool)
    n5, d5, ok5 = measurement.plane_from_moments(m, q, v, cells="tangent5")
    assert int(ok5.sum()) >= 250
    n5m = np.asarray(n5)[np.asarray(ok5)]
    assert np.abs(n5m @ n_true).min() > 0.999
    r = np.abs(np.einsum("ni,ni->n", n5m,
                         np.asarray(q)[np.asarray(ok5)])
               + np.asarray(d5)[np.asarray(ok5)])
    assert r.max() < 0.05


def test_tangent5_keeps_wall_tangent_support(rng):
    """A vertical wall in the y-z plane: tangent5 must blend the ±y/±z
    neighbors (where the wall extends) and skip the ±x pair — exactly
    the support octant4 loses."""
    voxel = 1.0
    yz = rng.uniform(0, 1, size=(200, 2)).astype(np.float32)
    x = rng.uniform(0.45, 0.55, size=(200, 1)).astype(np.float32)
    wall = np.concatenate([
        np.column_stack([x[:50, 0], yz[:50, 0] + 1.0, yz[:50, 1]]),  # +y
        np.column_stack([x[50:100, 0], yz[50:100, 0] - 1.0, yz[50:100, 1]]),
        np.column_stack([x[100:150, 0], yz[100:150, 0], yz[100:150, 1] + 1.0]),
        np.column_stack([x[150:, 0], yz[150:, 0], yz[150:, 1] - 1.0]),  # -z
    ]).astype(np.float32)
    own = np.column_stack([x[:, 0], yz[:, 0], yz[:, 1]]).astype(np.float32)
    pts = np.concatenate([own, wall])
    m = vh.make_map(capacity_log2=10, bucket=32, voxel_size=voxel,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    s5, _ = measurement.neighborhood_moment_sums(m, q, cells="tangent5")
    # own cell holds 200 pts (mom uncapped here), the 4 y/z neighbors 50
    # each; the (empty) ±x pair contributes nothing
    assert float(s5[0, 0]) == 400.0
