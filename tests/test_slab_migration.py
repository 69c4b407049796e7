"""Slab-ownership sharded map + collective_permute migration (SURVEY P6).

On the virtual 8-device CPU mesh: insert under slab ownership, advance
the slab shift (the FoV moved one slab forward), migrate rows ring-wise
via lax.ppermute, and verify the global map content is exactly preserved
and re-partitioned to the new owners.
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
    # span several x-slabs (slab_log2=3 at 0.5 m leaves -> 4 m slabs)
    return np.stack(
        [rng.uniform(-30, 30, n), rng.uniform(-6, 6, n),
         rng.uniform(-2, 2, n)], 1
    ).astype(np.float32)


def _global_voxels(ms, n_dev):
    """{coord tuple: (count, mom_n)} across all shards."""
    out = {}
    key = np.asarray(ms.key)
    count = np.asarray(ms.count)
    pts = np.asarray(ms.points)
    mom = np.asarray(ms.mom) if ms.mom is not None else None
    vs = float(np.asarray(ms.voxel_size).reshape(-1)[0])
    for d in range(n_dev):
        live = (key[d] & (1 << 30)) != 0
        for s in np.nonzero(live)[0]:
            c = tuple(np.floor(pts[d, s, 0] / vs).astype(int))
            assert c not in out, f"voxel {c} held twice"
            out[c] = (int(count[d, s]),
                      float(mom[d, s, 0]) if mom is not None else 0.0, d)
    return out


def test_slab_migrate_preserves_map(mesh):
    n_dev = mesh.devices.size
    rng = np.random.default_rng(5)
    pts = jnp.asarray(_cloud(rng, 4000))
    val = jnp.ones(pts.shape[0], bool)
    slab_log2 = 3

    ms = sharded.make_sharded_map(mesh, capacity_log2_per_dev=11, bucket=4,
                                  voxel_size=0.5, moments=True)
    ins = sharded.sharded_slab_insert(mesh, slab_log2=slab_log2)
    ms = ins(ms, jnp.asarray(0, jnp.int32), pts, val)

    before = _global_voxels(ms, n_dev)
    assert len(before) > 200

    # ownership invariant at shift=0
    for c, (_, _, d) in before.items():
        assert (c[0] >> slab_log2) % n_dev == d

    mig = sharded.sharded_slab_migrate(mesh, slab_log2=slab_log2,
                                       max_rows=256)
    shift1 = jnp.asarray(1, jnp.int32)
    total_bytes = 0
    for _ in range(40):  # capped buffer -> iterate until drained
        ms, n_left, bts, n_lost = mig(ms, shift1)
        total_bytes += int(bts)
        assert int(n_lost) == 0
        if int(n_left) == 0:
            break
    assert int(n_left) == 0
    assert total_bytes > 0

    after = _global_voxels(ms, n_dev)
    # exact content preservation: same voxels, counts, moment weights
    assert set(after) == set(before)
    for c in before:
        assert after[c][0] == before[c][0], c
        np.testing.assert_allclose(after[c][1], before[c][1])
    # re-partitioned to the new owners
    for c, (_, _, d) in after.items():
        assert int(jnp.mod((c[0] >> slab_log2) - 1, n_dev)) == d


def test_comm_volume_accounting():
    from better_fastlio2_tpu.config import LIOConfig, ShapesConfig

    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(n_raw=1 << 15, n_ds=1 << 14, n_imu=16,
                              map_capacity_log2=20, map_bucket=4,
                              map_max_probe=6, knn_chunk=1 << 14)
    vol = sharded.comm_volume_per_scan(cfg, 8)
    assert vol["n_devices"] == 8
    # steady path: downsample gather + moment psum + tiny gram psums
    assert 0 < vol["steady_total_bytes_per_scan"] < 3e6
    # warmup kNN merge is the expensive collective
    assert (vol["warmup_total_bytes_per_scan"]
            > vol["steady_total_bytes_per_scan"])
