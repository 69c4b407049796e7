"""Perception plugin tests: Patchwork ground segmentation and the
SSC/TGRS dynamic-removal pipeline on synthetic scenes."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.perception import dynamic as dyn
from better_fastlio2_tpu.perception.patchwork import (
    PatchworkParams,
    estimate_ground,
)
from better_fastlio2_tpu.utils import se3


def ground_scene(rng, n_ground=20000, n_obj=600, h=1.732):
    """Flat ground at z=-h + a box-shaped object + a wall."""
    g = np.stack(
        [
            rng.uniform(-30, 30, n_ground),
            rng.uniform(-30, 30, n_ground),
            -h + rng.normal(scale=0.02, size=n_ground),
        ],
        1,
    )
    box = np.stack(
        [
            rng.uniform(5, 6, n_obj),
            rng.uniform(2, 3, n_obj),
            rng.uniform(-h, -h + 1.2, n_obj),
        ],
        1,
    )
    wall = np.stack(
        [
            rng.uniform(-20, 20, n_obj),
            np.full(n_obj, 30.0),
            rng.uniform(-h, 6.0, n_obj),
        ],
        1,
    )
    pts = np.concatenate([g, box, wall]).astype(np.float32)
    labels = np.concatenate(
        [np.ones(n_ground, bool), np.zeros(2 * n_obj, bool)]
    )
    return pts, labels


def test_patchwork_separates_ground(rng):
    pts, is_ground = ground_scene(rng)
    mask = np.asarray(
        estimate_ground(jnp.asarray(pts), jnp.ones(len(pts), bool),
                        PatchworkParams(sensor_height=1.732))
    )
    # recall: most true ground found
    recall = mask[is_ground].mean()
    # precision: few object points called ground
    precision = is_ground[mask].mean() if mask.any() else 0.0
    assert recall > 0.85, f"ground recall {recall:.2f}"
    assert precision > 0.9, f"ground precision {precision:.2f}"


def box_cluster(rng, center, n=300, size=0.6, zlo=-0.3, zhi=0.6):
    return np.stack(
        [
            rng.uniform(center[0] - size, center[0] + size, n),
            rng.uniform(center[1] - size, center[1] + size, n),
            rng.uniform(zlo, zhi, n),
        ],
        1,
    ).astype(np.float32)


def test_cluster_separates_objects(rng):
    prm = dyn.SSCParams()
    a = box_cluster(rng, (6, 5))
    b = box_cluster(rng, (-5, 10))
    pts = jnp.asarray(np.concatenate([a, b]))
    grid = dyn.encode_scan(pts, jnp.ones(len(pts), bool), prm)
    grid = dyn.cluster_grid(grid, prm)
    lab = np.asarray(grid.labels.reshape(-1))
    pv = np.asarray(grid.pt_voxel)
    la = np.unique(lab[pv[:300][pv[:300] >= 0]])
    lb = np.unique(lab[pv[300:][pv[300:] >= 0]])
    # each object is one component, and they differ
    assert len(la) == 1 and len(lb) == 1
    assert la[0] != lb[0]


def test_pd_recognition(rng):
    """A pedestrian-sized cluster is PD; a tall wall is not."""
    prm = dyn.SSCParams(sensor_height=0.4)
    ped = box_cluster(rng, (4, 3), size=0.3, zlo=-0.35, zhi=0.45)
    wall = np.stack(
        [rng.uniform(10, 18, 800), np.full(800, 10.0),
         rng.uniform(-0.2, 5.0, 800)], 1
    ).astype(np.float32)
    pts = jnp.asarray(np.concatenate([ped, wall]))
    grid = dyn.cluster_grid(dyn.encode_scan(pts, jnp.ones(len(pts), bool),
                                            prm), prm)
    pd = np.asarray(dyn.recognize_pd(grid, prm).reshape(-1))
    pv = np.asarray(grid.pt_voxel)
    ped_pd = pd[pv[:300][pv[:300] >= 0]]
    wall_pd = pd[pv[300:][pv[300:] >= 0]]
    assert ped_pd.mean() > 0.9
    assert wall_pd.mean() < 0.1


def test_track_pd_flags_moving_object(rng):
    """Static PD cluster overlaps its previous projection (kept); a moved
    cluster does not (flagged dynamic)."""
    prm = dyn.SSCParams(sensor_height=0.4)
    static_obj = box_cluster(rng, (6, 3), size=0.3, zlo=-0.35, zhi=0.45)
    moving_prev = box_cluster(rng, (10, -4), size=0.3, zlo=-0.35, zhi=0.45)
    moving_next = box_cluster(rng, (14, -4), size=0.3, zlo=-0.35, zhi=0.45)

    prev_pts = jnp.asarray(np.concatenate([static_obj, moving_prev]))
    next_pts = jnp.asarray(np.concatenate([static_obj, moving_next]))
    gprev = dyn.cluster_grid(
        dyn.encode_scan(prev_pts, jnp.ones(len(prev_pts), bool), prm), prm
    )
    gnext = dyn.cluster_grid(
        dyn.encode_scan(next_pts, jnp.ones(len(next_pts), bool), prm), prm
    )
    pd = dyn.recognize_pd(gnext, prm)
    hd = np.asarray(
        dyn.track_pd(gprev, se3.identity(jnp.float32), gnext, pd, prm)
    ).reshape(-1)
    pv = np.asarray(gnext.pt_voxel)
    hd_static = hd[pv[:300][pv[:300] >= 0]]
    hd_moving = hd[pv[300:][pv[300:] >= 0]]
    assert hd_static.mean() < 0.1, "static object wrongly dynamic"
    assert hd_moving.mean() > 0.9, "moved object not flagged"


def test_dynamic_removal_end_to_end(rng):
    prm = dyn.SSCParams(sensor_height=0.4)
    ground = np.stack(
        [rng.uniform(-20, 20, 2000), rng.uniform(-20, 20, 2000),
         -0.4 + rng.normal(scale=0.01, size=2000)], 1
    ).astype(np.float32)
    walker_prev = box_cluster(rng, (8, 2), size=0.3, zlo=-0.35, zhi=0.45)
    walker_next = box_cluster(rng, (11, 2), size=0.3, zlo=-0.35, zhi=0.45)

    prev_pts = jnp.asarray(np.concatenate([ground, walker_prev]))
    next_pts = jnp.asarray(np.concatenate([ground, walker_next]))
    gm_prev = jnp.asarray(
        np.concatenate([np.ones(2000, bool), np.zeros(300, bool)])
    )
    _, gprev = dyn.dynamic_removal_masks(
        prev_pts, jnp.ones(len(prev_pts), bool), gm_prev, None,
        se3.identity(jnp.float32), prm,
    )
    static, _ = dyn.dynamic_removal_masks(
        next_pts, jnp.ones(len(next_pts), bool), gm_prev, gprev,
        se3.identity(jnp.float32), prm,
    )
    static = np.asarray(static)
    assert static[:2000].mean() > 0.99  # ground kept
    assert static[2000:].mean() < 0.2  # moving object removed


def test_cluster_color_dump_roundtrip(tmp_path, rng):
    """saveColorCloud analog (tgrs.cpp:214-243): the cluster-colored
    dump round-trips through the PCD writer with one stable color per
    cluster and distinct colors across clusters."""
    from better_fastlio2_tpu.io.pcd import read_pcd_fields

    prm = dyn.SSCParams()
    a = box_cluster(rng, (8, 2))
    b = box_cluster(rng, (14, -5))
    pts = jnp.asarray(np.concatenate([a, b]))
    grid = dyn.cluster_grid(dyn.encode_scan(pts, jnp.ones(len(a) + len(b),
                                                          bool), prm), prm)
    path = str(tmp_path / "000000_color.pcd")
    n = dyn.save_cluster_cloud(path, np.asarray(pts), grid)
    fields, data = read_pcd_fields(path)
    assert fields == ["x", "y", "z", "rgb"] and len(data) == n

    labels = dyn.point_labels(grid)
    valid = np.asarray(grid.pt_valid)
    rgb_packed = data[:, 3].view(np.uint32)
    lab_v = labels[valid]
    # one packed color per cluster, and the two clusters differ
    for lb in np.unique(lab_v[lab_v >= 0]):
        assert len(np.unique(rgb_packed[lab_v == lb])) == 1
    la = lab_v[: int(valid[: len(a)].sum())]
    lb_ = lab_v[int(valid[: len(a)].sum()):]
    ca = rgb_packed[: len(la)][la >= 0]
    cb = rgb_packed[len(la):][lb_ >= 0]
    assert len(ca) and len(cb) and ca[0] != cb[0]


def test_pr_rr_f1_on_synthetic_movers():
    """Artifact-level pr_rr_f1 consumer: the SCV-OD chain on the
    OutdoorWorld's labelled movers (synthetic ground truth via
    scan(return_labels=True)) detects the moved cars."""
    from better_fastlio2_tpu.io.evaluate import pr_rr_f1
    from better_fastlio2_tpu.io.synthetic import OutdoorWorld

    world = OutdoorWorld(seed=1, half=40.0)
    H = 2.0  # sensor mounted above the car-height movers' PD band
    pos = lambda t: np.array([0.0, 0.0, H])  # noqa: E731
    rot = lambda t: np.eye(3)  # noqa: E731
    prm = dyn.SSCParams(sensor_height=0.4)

    def one(t0):
        pts, _, gt_dyn = world.scan(pos, rot, t0, 0.1, 12000, noise=0.005,
                                    rng=np.random.default_rng(7),
                                    return_labels=True)
        pts = pts.astype(np.float32)
        gm = pts[:, 2] < -1.5  # ground plane sits at ~-H in sensor frame
        return pts, gm, gt_dyn

    p1, g1, _ = one(0.0)
    p2, g2, gt2 = one(2.0)  # movers displace 2-6 m in the gap
    _, grid1 = dyn.dynamic_removal_masks(
        jnp.asarray(p1), jnp.ones(len(p1), bool), jnp.asarray(g1), None,
        se3.identity(jnp.float32), prm)
    static, _ = dyn.dynamic_removal_masks(
        jnp.asarray(p2), jnp.ones(len(p2), bool), jnp.asarray(g2), grid1,
        se3.identity(jnp.float32), prm)
    pred_dyn = ~np.asarray(static)
    pr, rr, f1 = pr_rr_f1(pred_dyn, gt2)
    assert rr > 0.5, f"mover recall {rr:.2f}"
    assert f1 > 0.4, f"f1 {f1:.2f} (precision {pr:.2f})"


def test_appearance_dynamic_mask_basic():
    """World-occupancy appearance test (dyn_track_mode="appearance"):
    a cluster whose world voxels were occupied in the old union stays;
    a cluster in previously-free space is removed whole when strongly
    fresh; a moderately fresh cluster sheds only its fresh points."""
    import numpy as np

    from better_fastlio2_tpu.perception import dynamic as dyn

    vs = 0.5
    # static cluster at x~0, mover cluster at x~10 (fresh), mixed at x~20
    pts = np.concatenate([
        np.stack([0.1 + 0.5 * np.arange(6), np.zeros(6), np.zeros(6)], 1),
        np.stack([10.1 + 0.5 * np.arange(6), np.zeros(6), np.zeros(6)], 1),
        np.stack([20.1 + 0.5 * np.arange(6), np.zeros(6), np.zeros(6)], 1),
    ])
    keys = dyn.world_voxel_keys(pts, vs)
    lab = np.repeat([1, 2, 3], 6)
    band = np.ones(18, bool)
    scored = band.copy()
    # old union: the static cluster's exact voxels; for the mixed
    # cluster, 4 of 6 voxels (frac 0.67: weak band between 0.55 and 0.9)
    old = np.unique(np.concatenate([keys[:6], keys[12:16]]))
    dynmask = dyn.appearance_dynamic_mask(keys, scored, band, lab, old)
    assert not dynmask[:6].any(), "static cluster must not be removed"
    assert dynmask[6:12].all(), "fresh cluster must be removed whole"
    # mixed: only the 2 fresh points go (27-neighbourhood makes the
    # voxels adjacent to old ones count as occupied, so check the far end)
    assert not dynmask[12:16].any()
    # far-end points beyond the dilated old set are removed
    assert dynmask[17]
