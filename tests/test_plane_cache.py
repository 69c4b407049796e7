"""Per-voxel moment cache and the plane-cache measurement path.

Covers: moment accumulation vs a numpy group-by (including points dropped
by full buckets), rebase-and-blend plane recovery on an analytic plane,
crop/rebuild moment semantics, and end-to-end ATE with
ikdtree.plane_cache=True.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.core import measurement
from better_fastlio2_tpu.map import voxel_hash as vh


def _mom_numpy(pts, voxel):
    """Reference corner-relative moments per voxel."""
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


def test_moments_match_numpy_groupby(rng):
    pts = rng.uniform(-6, 6, size=(3000, 3)).astype(np.float32)
    m = vh.make_map(capacity_log2=13, bucket=2, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    # bucket=2: most voxels overflow storage — moments must still count
    # every point
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    ref = _mom_numpy(pts, 0.5)

    live = (np.asarray(m.key) & (1 << 30)) != 0
    coords = np.asarray(m.coords)
    mom = np.asarray(m.mom)
    n_checked = 0
    for s in np.where(live)[0]:
        v = tuple(coords[s])
        assert v in ref
        np.testing.assert_allclose(mom[s], ref[v], rtol=1e-4, atol=1e-4)
        n_checked += 1
    assert n_checked == len(ref)


def test_plane_from_moments_recovers_analytic_plane(rng):
    # slanted plane z = 0.3 x + 0.1 y + 5, far from the origin in x
    n_true = np.array([-0.3, -0.1, 1.0])
    n_true = n_true / np.linalg.norm(n_true)
    xy = rng.uniform(0, 10, size=(8000, 2)) + np.array([200.0, -50.0])
    z = 0.3 * xy[:, 0] + 0.1 * xy[:, 1] + 5.0
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts += 0.01 * rng.standard_normal(pts.shape).astype(np.float32)

    m = vh.make_map(capacity_log2=14, bucket=4, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = pts[::40] + np.array([0, 0, 0.02], np.float32)
    nvec, d, ok = measurement.plane_from_moments(
        m, jnp.asarray(q), jnp.ones(len(q), bool)
    )
    nvec, d, ok = np.asarray(nvec), np.asarray(d), np.asarray(ok)
    assert ok.mean() > 0.9
    cosang = np.abs(nvec[ok] @ n_true)
    assert (cosang > 0.995).mean() > 0.95
    # plane residual of the true surface points
    resid = np.abs(np.einsum("ni,ni->n", nvec[ok], q[ok]) + d[ok])
    assert np.median(resid) < 0.05


def test_plane_cache_rejects_nonplanar_and_sparse(rng):
    # volumetric noise is not a plane; empty space has no points
    pts = rng.uniform(-3, 3, size=(5000, 3)).astype(np.float32)
    m = vh.make_map(capacity_log2=13, bucket=4, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    q_in = pts[:64]
    q_out = (pts[:64] + 100.0).astype(np.float32)
    _, _, ok_in = measurement.plane_from_moments(
        m, jnp.asarray(q_in), jnp.ones(64, bool))
    _, _, ok_out = measurement.plane_from_moments(
        m, jnp.asarray(q_out), jnp.ones(64, bool))
    assert np.asarray(ok_in).mean() < 0.5  # volumetric -> mostly rejected
    assert not np.asarray(ok_out).any()  # empty space -> no planes


def test_crop_clears_moments_rebuild_carries_them(rng):
    pts = rng.uniform(-4, 4, size=(2000, 3)).astype(np.float32)
    m = vh.make_map(capacity_log2=12, bucket=2, voxel_size=0.5,
                    dtype=jnp.float32, moments=True)
    m = vh.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    total0 = float(np.asarray(m.mom)[:, 0].sum())
    assert total0 == len(pts)

    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    mc = vh.crop_outside_box(m, lo, hi)
    live = (np.asarray(mc.key) & (1 << 30)) != 0
    dead_mom = np.asarray(mc.mom)[~live]
    assert np.all(dead_mom == 0.0)

    mr = vh.rebuild(mc)
    # rebuild must carry the FULL moment accumulation (bucket=2 stored
    # fewer points than were accumulated)
    np.testing.assert_allclose(
        np.asarray(mr.mom)[:, 0].sum(), np.asarray(mc.mom)[:, 0].sum())


@pytest.mark.slow
def test_lio_plane_cache_tracks_trajectory():
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline
    from tests.test_lio_pipeline import small_cfg

    cfg = small_cfg()
    cfg.ikdtree.plane_cache = True
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
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.10, f"plane-cache ATE RMSE {ate:.3f} m"
    assert errs[-1] < 0.15
