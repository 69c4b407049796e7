"""Voxel-hash map in device HBM — the TPU-native replacement for ikd-Tree.

The reference maintains an incremental k-d tree with a background rebuild
thread (reference: include/ikd-Tree/ikd_Tree.{h,cpp}); pointer chasing and
fine-grained locking do not map to a TPU.  Following the direction the
reference's own README recommends (README.md:266-267, Faster-LIO-style
sparse voxel hash), the map here is a fixed-capacity open-addressing hash
table of voxel buckets living entirely in HBM:

    coords: (C, 3) int32   voxel integer coordinates per slot
    state:  (C,)   int8    0 = empty, 1 = live, 2 = tombstone
    count:  (C,)   int32   number of points stored in the slot (<= B)
    points: (C, B, 3)      SoA point storage

* insert: batched, race-free via a deterministic scatter-min claim
  protocol (no atomics needed; identical result every run).
* kNN: gather the 27-voxel neighborhood per query and top-k by distance —
  a dense, VPU-friendly computation replacing tree traversal
  (ikd_Tree.cpp:367 Nearest_Search).
* box-delete (FoV cube slide, laserMapping.cpp:1136-1200): a vectorized
  predicate turns out-of-cube voxels into tombstones — O(C), no tree
  surgery.  Tombstones keep probe chains intact; `rebuild` compacts the
  table periodically, the analog of the reference's background rebuild
  thread (ikd_Tree.cpp:201-316) and recontructIKdTree
  (laserMapping.cpp:612-669) — but synchronous, deterministic, and cheap.

All shapes are static; the table is a pytree and threads through jit/scan.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "VoxelHashMap",
    "make_map",
    "insert",
    "knn",
    "crop_outside_box",
    "rebuild",
    "num_voxels",
]

_INT_MAX = jnp.iinfo(jnp.int32).max

EMPTY, LIVE, TOMB = 0, 1, 2

# Multiplicative hash constants (the classic spatial-hash primes).
_P1, _P2, _P3 = 73856093, 19349669, 83492791


class VoxelHashMap(NamedTuple):
    coords: jax.Array  # (C, 3) int32
    state: jax.Array  # (C,) int8
    count: jax.Array  # (C,) int32
    points: jax.Array  # (C, B, 3) float
    voxel_size: jax.Array  # () float — carried on-device so the map is a pure pytree

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def bucket(self) -> int:
        return self.points.shape[1]


def make_map(
    capacity_log2: int = 19,
    bucket: int = 8,
    voxel_size: float = 0.5,
    dtype=jnp.float32,
) -> VoxelHashMap:
    """Allocate an empty map. Capacity is 2**capacity_log2 slots."""
    C = 1 << capacity_log2
    return VoxelHashMap(
        coords=jnp.zeros((C, 3), jnp.int32),
        state=jnp.zeros(C, jnp.int8),
        count=jnp.zeros(C, jnp.int32),
        points=jnp.zeros((C, bucket, 3), dtype),
        voxel_size=jnp.asarray(voxel_size, dtype),
    )


def num_voxels(m: VoxelHashMap) -> jax.Array:
    return jnp.sum((m.state == LIVE).astype(jnp.int32))


def _voxel_of(points: jax.Array, voxel_size) -> jax.Array:
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def _hash(ijk: jax.Array, mask: int) -> jax.Array:
    h = ijk[..., 0] * _P1 ^ ijk[..., 1] * _P2 ^ ijk[..., 2] * _P3
    return (h & 0x7FFFFFFF) & mask


def _lookup_slots(
    coords: jax.Array, state: jax.Array, ijk: jax.Array, max_probe: int
) -> jax.Array:
    """Find the live slot index for each voxel coord; -1 if absent.

    Linear probing; tombstones keep the chain walking, empty ends it.
    """
    C = coords.shape[0]
    mask = C - 1
    h0 = _hash(ijk, mask)
    n = ijk.shape[0]

    def body(j, carry):
        slot, open_ = carry
        cand = (h0 + j) & mask
        st = state[cand]
        match = (st == LIVE) & jnp.all(coords[cand] == ijk, axis=-1)
        slot = jnp.where(open_ & match, cand, slot)
        open_ = open_ & ~match & (st != EMPTY)
        return slot, open_

    slot0 = jnp.full(n, -1, jnp.int32)
    slot, _ = jax.lax.fori_loop(0, max_probe, body, (slot0, jnp.ones(n, bool)))
    return slot


@partial(jax.jit, static_argnames=("max_probe",), donate_argnums=(0,))
def insert(
    m: VoxelHashMap,
    pts_world: jax.Array,
    valid: jax.Array,
    max_probe: int = 16,
) -> VoxelHashMap:
    """Insert a batch of world-frame points (padded; `valid` masks rows).

    Semantics mirror ikd-Tree Add_Points with downsample-on-insert
    (ikd_Tree.cpp:414): each voxel bucket holds at most B points and
    excess points in a full voxel are dropped (the map is already dense
    there).  New voxels claim empty slots via scatter-min: within one
    probe round every contending voxel writes its point-rank into the
    candidate slot and reads back whether it won — deterministic, so the
    map state is bit-identical across replays.
    """
    C, B = m.capacity, m.bucket
    hmask = C - 1
    n = pts_world.shape[0]
    ijk = _voxel_of(pts_world, m.voxel_size)
    ijk = jnp.where(valid[:, None], ijk, jnp.full_like(ijk, _INT_MAX))

    # ---- group points by voxel (sort by hash, then coords) ---------------
    h0 = jnp.where(valid, _hash(ijk, hmask), _INT_MAX)
    order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], h0))
    ijk_s = ijk[order]
    pts_s = pts_world[order]
    valid_s = valid[order]

    first = jnp.concatenate(
        [jnp.array([True]), jnp.any(ijk_s[1:] != ijk_s[:-1], axis=-1)]
    )
    is_head = first & valid_s
    idx = jnp.arange(n, dtype=jnp.int32)
    # index of each row's group head, via running max over head positions
    group_head = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    rank = idx - group_head

    # ---- resolve a slot for every group head -----------------------------
    h_s = _hash(ijk_s, hmask)

    def claim_round(st):
        slot, probe, state_arr, coords_arr, unresolved = st[:5]
        cand = (h_s + probe) & hmask
        slot_state = state_arr[cand]
        match = (slot_state == LIVE) & jnp.all(coords_arr[cand] == ijk_s, axis=-1)
        found = unresolved & match
        slot = jnp.where(found, cand, slot)
        unresolved = unresolved & ~found

        # claim empty slots (tombstones are never reclaimed; see rebuild)
        tryc = unresolved & (slot_state == EMPTY)
        claim = jnp.full(C, _INT_MAX, jnp.int32)
        claim = claim.at[jnp.where(tryc, cand, 0)].min(
            jnp.where(tryc, idx, _INT_MAX)
        )
        won = tryc & (claim[cand] == idx)
        wslot = jnp.where(won, cand, C)
        state_arr = state_arr.at[wslot].set(LIVE, mode="drop")
        coords_arr = coords_arr.at[wslot].set(ijk_s, mode="drop")
        slot = jnp.where(won, cand, slot)
        unresolved = unresolved & ~won
        probe = jnp.where(unresolved, probe + 1, probe)
        unresolved = unresolved & (probe < max_probe)
        return (slot, probe, state_arr, coords_arr, unresolved, jnp.any(unresolved))

    st = (
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.int32),
        m.state,
        m.coords,
        is_head,
        jnp.any(is_head),
    )
    st = jax.lax.while_loop(lambda s: s[-1], claim_round, st)
    head_slot, _, state_arr, coords_arr, _, _ = st

    # every row inherits its group head's slot (-1 if the head failed)
    slot_all = head_slot[group_head]
    slot_all = jnp.where(valid_s, slot_all, -1)

    # ---- append points into buckets --------------------------------------
    base = m.count[jnp.maximum(slot_all, 0)]
    dest = base + rank
    ok = (slot_all >= 0) & (dest < B) & valid_s
    flat_idx = jnp.where(ok, slot_all * B + dest, C * B)  # OOB rows drop
    points = (
        m.points.reshape(C * B, 3).at[flat_idx].set(pts_s, mode="drop")
    ).reshape(C, B, 3)

    add = jnp.zeros(C, jnp.int32).at[jnp.where(ok, slot_all, 0)].add(
        ok.astype(jnp.int32)
    )
    count = jnp.minimum(m.count + add, B)

    return VoxelHashMap(coords_arr, state_arr, count, points, m.voxel_size)


@partial(jax.jit, static_argnames=("k", "max_probe", "chunk"))
def knn(
    m: VoxelHashMap,
    queries: jax.Array,
    k: int = 5,
    max_probe: int = 16,
    chunk: int = 4096,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched k-nearest-neighbors over the 27-voxel neighborhood.

    Returns (neighbors (N,k,3), sq_dists (N,k), valid (N,k)).  Replaces
    ikd-Tree Nearest_Search (ikd_Tree.cpp:367); candidates are bounded to
    the 3x3x3 voxel shell around each query, which at map resolution
    covers the reference's effective point-to-plane match radius.
    """
    N = queries.shape[0]
    B = m.bucket
    dtype = m.points.dtype
    BIG = jnp.asarray(1e18, dtype)

    offs = (
        jnp.stack(
            jnp.meshgrid(
                jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
                indexing="ij",
            ),
            axis=-1,
        )
        .reshape(27, 3)
        .astype(jnp.int32)
    )

    def one_chunk(q):
        c = q.shape[0]
        ijk = _voxel_of(q, m.voxel_size)
        nb = ijk[:, None, :] + offs[None, :, :]
        slots = _lookup_slots(m.coords, m.state, nb.reshape(-1, 3), max_probe)
        slots = slots.reshape(c, 27)
        safe = jnp.maximum(slots, 0)
        cand = m.points[safe]  # (c, 27, B, 3)
        cnt = m.count[safe]
        lane = jnp.arange(B, dtype=jnp.int32)
        cand_ok = (slots[..., None] >= 0) & (lane[None, None, :] < cnt[..., None])
        d2 = jnp.sum((cand - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_ok, d2, BIG)
        neg_top, top_i = jax.lax.top_k(-d2.reshape(c, 27 * B), k)
        top_d2 = -neg_top
        pts = jnp.take_along_axis(
            cand.reshape(c, 27 * B, 3), top_i[..., None], axis=1
        )
        return pts, top_d2, top_d2 < BIG

    if N <= chunk:
        return one_chunk(queries)
    pad = (-N) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    pts, d2, ok = jax.lax.map(one_chunk, qp.reshape(-1, chunk, 3))
    return (
        pts.reshape(-1, k, 3)[:N],
        d2.reshape(-1, k)[:N],
        ok.reshape(-1, k)[:N],
    )


@jax.jit
def crop_outside_box(m: VoxelHashMap, lo: jax.Array, hi: jax.Array) -> VoxelHashMap:
    """Tombstone every voxel whose center lies outside [lo, hi) — the
    analog of the moving-FoV-cube box deletion (lasermap_fov_segment,
    laserMapping.cpp:1136-1200 + ikd-Tree Delete_Point_Boxes)."""
    centers = (m.coords.astype(m.points.dtype) + 0.5) * m.voxel_size
    outside = jnp.any((centers < lo) | (centers >= hi), axis=-1)
    kill = (m.state == LIVE) & outside
    return VoxelHashMap(
        coords=m.coords,
        state=jnp.where(kill, jnp.int8(TOMB), m.state),
        count=jnp.where(kill, 0, m.count),
        points=m.points,
        voxel_size=m.voxel_size,
    )


def tombstone_fraction(m: VoxelHashMap) -> jax.Array:
    return jnp.mean((m.state == TOMB).astype(jnp.float32))


def rebuild(m: VoxelHashMap, max_probe: int = 16) -> VoxelHashMap:
    """Compact the table: re-insert every live point into a fresh map.

    The synchronous, deterministic analog of the reference's background
    rebuild thread + operation replay log (ikd_Tree.cpp:201-316).  Call
    when tombstone_fraction grows (e.g. > 0.2) or every `kd_step`-like
    cadence (recontructIKdTree, laserMapping.cpp:612-669).
    """
    C, B = m.capacity, m.bucket
    live = (m.state == LIVE)[:, None] & (
        jnp.arange(B)[None, :] < m.count[:, None]
    )
    fresh = make_map(
        capacity_log2=int(C).bit_length() - 1,
        bucket=B,
        voxel_size=float(m.voxel_size),
        dtype=m.points.dtype,
    )
    return insert(
        fresh,
        m.points.reshape(C * B, 3),
        live.reshape(C * B),
        max_probe=max_probe,
    )
