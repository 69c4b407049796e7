"""Tests for downsample + plane fit ops."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.core.measurement import plane_fit
from better_fastlio2_tpu.ops.downsample import voxel_downsample


def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(0, 4, size=(500, 3))
    out, ok = voxel_downsample(jnp.asarray(pts), jnp.ones(500, bool), 1.0)
    out = np.asarray(out)[np.asarray(ok)]

    # brute-force centroids
    keys = np.floor(pts / 1.0).astype(int)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    cents = np.zeros((len(uniq), 3))
    np.add.at(cents, inv, pts)
    cnt = np.bincount(inv)
    cents /= cnt[:, None]

    assert len(out) == len(uniq)
    got = out[np.lexsort(out.T)]
    want = cents[np.lexsort(cents.T)]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_voxel_downsample_masks(rng):
    pts = rng.uniform(0, 4, size=(100, 3))
    valid = rng.uniform(size=100) > 0.5
    out, ok = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.5)
    keys = np.floor(pts[valid] / 0.5).astype(int)
    n_uniq = len(np.unique(keys, axis=0))
    assert int(np.asarray(ok).sum()) == n_uniq


def test_plane_fit_exact_plane(rng):
    n = rng.normal(size=(16, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = rng.uniform(0.5, 2.0, size=16)
    # 5 points on each plane n·p + d = 0
    pts = []
    for i in range(16):
        basis = np.linalg.svd(n[i : i + 1])[2][1:]  # 2 vectors orthogonal to n
        coef = rng.normal(size=(5, 2))
        pts.append(coef @ basis - d[i] * n[i])
    pts = np.stack(pts)
    nn, dd, ok = plane_fit(jnp.asarray(pts), jnp.ones(16, bool))
    assert np.asarray(ok).all()
    nn, dd = np.asarray(nn), np.asarray(dd)
    for i in range(16):
        # sign of fit: reference normalizes so d > 0
        s = np.sign(np.dot(nn[i], n[i]))
        np.testing.assert_allclose(s * nn[i], n[i], atol=1e-6)
        np.testing.assert_allclose(
            np.abs(pts[i] @ nn[i] + dd[i]), 0.0, atol=1e-6
        )


def test_plane_fit_rejects_nonplanar(rng):
    pts = rng.uniform(-1, 1, size=(32, 5, 3)) * 2.0
    _, _, ok = plane_fit(jnp.asarray(pts), jnp.ones(32, bool))
    # random blobs should mostly fail the 0.1 m inlier test
    assert np.asarray(ok).sum() < 8


def test_voxel_downsample_packed_key_matches_lexsort(rng):
    """Packed-key sort path must produce the same centroid SET as the
    3-key lexsort path for sensor-range-bounded batches."""
    import numpy as np

    from better_fastlio2_tpu.ops.downsample import voxel_downsample

    pts = jnp.asarray(rng.uniform(-60, 60, (5000, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random(5000) > 0.1)
    a, av = voxel_downsample(pts, valid, 0.5, out_size=8192)
    b, bv = voxel_downsample(pts, valid, 0.5, out_size=8192,
                             packed_key=True)
    assert int(av.sum()) == int(bv.sum())
    sa = sorted(map(tuple, np.round(np.asarray(a)[np.asarray(av)], 4)))
    sb = sorted(map(tuple, np.round(np.asarray(b)[np.asarray(bv)], 4)))
    assert sa == sb
