"""Scan Context descriptor/retrieval tests.

Golden checks against a direct numpy transcription of the reference
implementation (Scancontext.cpp:80-251) plus behavioral properties
(rotation equivariance of the descriptor, rotation invariance of the ring
key, loop retrieval on revisits)."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.ops import scancontext as sc

P = sc.SCParams()


def np_make_descriptor(pts):
    """Literal transcription of makeScancontext (Scancontext.cpp:195-251)."""
    R, S = P.num_ring, P.num_sector
    desc = np.full((R, S), -1000.0)
    for x, y, z in pts:
        z = z + P.lidar_height
        rng = np.hypot(x, y)
        if rng > P.max_radius:
            continue
        theta = np.degrees(np.arctan2(y, x))
        if theta < 0:
            theta += 360.0
        ring = max(min(R, int(np.ceil(rng / P.max_radius * R))), 1)
        sect = max(min(S, int(np.ceil(theta / 360.0 * S))), 1)
        desc[ring - 1, sect - 1] = max(desc[ring - 1, sect - 1], z)
    desc[desc == -1000.0] = 0.0
    return desc


def np_dist_direct(d1, d2):
    sims, cnt = 0.0, 0
    for c in range(d1.shape[1]):
        n1, n2 = np.linalg.norm(d1[:, c]), np.linalg.norm(d2[:, c])
        if n1 == 0 or n2 == 0:
            continue
        sims += d1[:, c] @ d2[:, c] / (n1 * n2)
        cnt += 1
    return 1.0 - sims / max(cnt, 1)


def rand_scan(rng, n=2000):
    r = rng.uniform(2, 70, n)
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.4, 6.0, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1)


def test_descriptor_matches_reference_transcription(rng):
    pts = rand_scan(rng)
    got = np.asarray(
        sc.make_descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool))
    )
    want = np_make_descriptor(pts)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_distance_matches_reference_at_every_shift(rng):
    d1 = np_make_descriptor(rand_scan(rng))
    d2 = np_make_descriptor(rand_scan(rng))
    got = np.asarray(sc._all_shift_cosine(jnp.asarray(d1), jnp.asarray(d2)))
    for s in range(P.num_sector):
        want = np_dist_direct(d1, np.roll(d2, s, axis=1))
        np.testing.assert_allclose(got[s], want, atol=1e-9)


def test_rotation_equivariance(rng):
    """Rotating the scan by k sectors cyclically shifts the descriptor and
    the alignment recovers the shift with ~zero distance."""
    pts = rand_scan(rng)
    k = 17
    ang = k * 2 * np.pi / P.num_sector
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    d1 = sc.make_descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool))
    d2 = sc.make_descriptor(jnp.asarray(pts @ R.T), jnp.ones(len(pts), bool))
    # ring key invariant
    np.testing.assert_allclose(
        np.asarray(sc.ring_key(d1)), np.asarray(sc.ring_key(d2)), atol=1e-9
    )
    dist, shift = sc.sc_distance(d1, d2)
    assert float(dist) < 1e-6
    # d2[:, c] = d1[:, c-k]  =>  aligning shift s satisfies s+k ≡ 0 (mod S)
    assert int(shift) == (P.num_sector - k) % P.num_sector


def test_detect_loop_on_revisit(rng):
    db = sc.make_database(128, P)
    scans = [rand_scan(rng) for _ in range(40)]
    descs = [
        sc.make_descriptor(jnp.asarray(s2), jnp.ones(len(s2), bool))
        for s2 in scans
    ]
    for d in descs:
        db = sc.add_descriptor(db, d)
    # revisit of scan 3 (small noise)
    noisy = scans[3] + rng.normal(scale=0.02, size=scans[3].shape)
    q = sc.make_descriptor(jnp.asarray(noisy), jnp.ones(len(noisy), bool))
    idx, dist, shift = sc.detect_loop(db, q, P)
    assert int(idx) == 3
    assert float(dist) < P.dist_thresh


def test_detect_loop_excludes_recent(rng):
    db = sc.make_database(64, P)
    scans = [rand_scan(rng) for _ in range(10)]  # < num_exclude_recent
    for s2 in scans:
        db = sc.add_descriptor(
            db, sc.make_descriptor(jnp.asarray(s2), jnp.ones(len(s2), bool))
        )
    q = sc.make_descriptor(jnp.asarray(scans[0]), jnp.ones(len(scans[0]), bool))
    idx, dist, shift = sc.detect_loop(db, q, P)
    assert int(idx) == -1
