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
