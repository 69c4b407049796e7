"""Golden tests for the faithful LOAM give_feature cascade
(io/features.py classify_ring / give_feature_ring), constructed scans
checked against the reference rules of src/preprocess.cpp:528-1020."""

import numpy as np

from better_fastlio2_tpu.io import features as F


def ring_line(n=40, r0=5.0, spacing=0.05, z=0.0):
    """Points along a straight wall segment at ~r0 range in front of the
    sensor: x constant, y sweeping — a smooth planar run."""
    y = (np.arange(n) - n / 2) * spacing
    return np.stack([np.full(n, r0), y, np.full(n, z)], axis=1)


def test_plane_run_classifies_real_plane():
    pts = ring_line(40)
    ft = F.classify_ring(pts, blind=1.0)
    # pass 1 covers i < n-GROUP_SIZE; interior of the run must be
    # Real_Plane (plane_judge: uniform spacing -> ratios 1, straight
    # chord -> p2l ratio -> inf)
    interior = ft[2:28]
    assert np.mean(interior == F.REAL_PLANE) > 0.9, ft
    # nothing should be an edge on a clean wall
    assert not np.any((ft == F.EDGE_JUMP) | (ft == F.EDGE_PLANE))


def test_blind_points_stay_unclassified():
    pts = ring_line(40)
    pts[:5] = [[0.2, 0.0, 0.0]] * 5  # inside blind radius
    ft = F.classify_ring(pts, blind=1.0)
    assert np.all(ft[:5] == F.NOR)


def test_edge_plane_at_wall_junction():
    # two walls meeting at a ~90 deg corner: the junction point starts a
    # new planar group whose direction flips ~90 deg from the previous
    # group -> |last_direct . curr_direct| < 0.707 -> Edge_Plane
    # (preprocess.cpp:585-599)
    # Edge_Plane fires when the wall-junction VERTEX lands exactly on a
    # plane-group boundary: groups tile every GROUP_SIZE points (no
    # extension at this range: chord 0.35 m > group_dis 0.15 m), so with
    # wall A on indices 0..23 and the vertex at 24, group [16..24] is
    # collinear on wall A (vertex lies on both wall lines), the next
    # group starts AT the vertex and runs along wall B, and the
    # direction dot cos(60 deg) = 0.5 < 0.707 labels the vertex
    # Edge_Plane (preprocess.cpp:585-599).
    n1, n2 = 24, 24
    spacing = 0.05
    a = np.stack([np.full(n1, 5.0), np.arange(-n1, 0) * spacing,
                  np.zeros(n1)], axis=1)
    vertex = np.array([[5.0, 0.0, 0.0]])
    db = np.array([np.sin(np.pi / 3), np.cos(np.pi / 3), 0.0])
    b = vertex + np.arange(1, n2 + 1)[:, None] * (spacing * db)
    pts = np.concatenate([a, vertex, b])
    ft = F.classify_ring(pts, blind=1.0)
    assert ft[n1] == F.EDGE_PLANE, ft[n1 - 4: n1 + 4]
    assert np.mean(ft[4: n1 - 4] == F.REAL_PLANE) > 0.8


def test_edge_jump_at_occlusion_boundary():
    # foreground wall ending; background far behind along the ray:
    # next-point vector nearly parallel to the ray => Nr_zero, spacing
    # jump 4x with consistent foreground spacing => Edge_Jump (rule 1,
    # preprocess.cpp:713-722)
    n1 = 20
    spacing = 0.05
    fg = np.stack([np.full(n1, 5.0), np.arange(-n1, 0) * spacing,
                   np.zeros(n1)], axis=1)
    # background points: along the ray of the last fg point, 3 m behind,
    # then continuing the sweep at 8 m range
    n2 = 20
    bg_r = 8.0
    ang = np.arange(1, n2 + 1) * (spacing / bg_r)
    bg = np.stack([bg_r * np.cos(ang), bg_r * np.sin(ang),
                   np.zeros(n2)], axis=1)
    pts = np.concatenate([fg, bg])
    ft = F.classify_ring(pts, blind=1.0)
    # the boundary point (last foreground, index n1-1) must be Edge_Jump
    assert ft[n1 - 1] == F.EDGE_JUMP, ft[n1 - 3: n1 + 3]


def test_edge_jump_judge_spacing_consistency():
    # hand-computed: d1/d2 spacings must be within 2x and differ < 0.1
    rng = np.full(10, 5.0)
    dista = np.full(10, 0.01)
    assert F._edge_jump_judge(rng, dista, 5, 0, blind=1.0)
    dista2 = dista.copy()
    dista2[4] = 0.01
    dista2[3] = 0.09  # sqrt ratios: 0.3/0.1 = 3 > 2 -> reject
    assert not F._edge_jump_judge(rng, dista2, 5, 0, blind=1.0)


def test_plane_judge_rejects_spacing_outliers():
    # a group with one 4x spacing outlier fails limit_maxmin = 3.24
    pts = ring_line(20)
    pts[10:, 1] += 0.17  # insert a gap: spacing sqrt ratio ~4.4 > 1.8^2
    rng = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    d = np.diff(pts, axis=0)
    dista = np.zeros(20)
    dista[:19] = np.einsum("ij,ij->i", d, d)
    ptype, _, direct = F._plane_judge(pts, rng, dista, 5, 1.0, False)
    assert ptype == 0
    assert np.allclose(direct, 0)


def test_give_feature_ring_strides_surf_points():
    pts = ring_line(40)
    t = np.linspace(0, 0.1, 40)
    sp, st, cp, ct = F.give_feature_ring(pts, t, blind=1.0,
                                         point_filter_num=4)
    # plane run strided every 4th point + run-tail averages; corner empty
    assert len(cp) == 0
    assert 5 <= len(sp) <= 14
    assert len(sp) == len(st)


def test_feature_filter_reduces_scan():
    rng = np.random.default_rng(0)
    # synthetic multi-ring scan of a box room via the simulator
    from better_fastlio2_tpu.io.synthetic import SyntheticWorld, Trajectory

    w = SyntheticWorld(seed=1)
    traj = Trajectory()
    pts, t = w.scan(traj.pos, traj.rot, 0.0, 0.1, 6000, rng=rng)
    out_p, out_t = F.feature_filter(pts.astype(np.float32), t, n_rings=16)
    assert len(out_p) == len(out_t)
    assert 200 <= len(out_p) <= len(pts)
