"""PatchWork ground segmentation — batched concentric-zone plane fitting.

TPU-native re-design of the reference's PatchWork
(reference: include/dynamic-remove/patchwork.h).  The reference iterates
over 504 patches sequentially, sorting and fitting each; here every
patch is a lane of one dense batched computation:

  * points -> (zone, ring, sector) patch ids (CZM layout,
    patchwork.h:50-93: zones {2,4,4,4} rings x {16,32,54,32} sectors)
  * per-patch capped point matrix via sort + scatter
  * seed extraction (lowest-point-representative mean + th_seeds,
    extract_initial_seeds_, patchwork.h:238-270)
  * num_iter=3 rounds of masked PCA plane fit + th_dist reclassification
    (estimate_plane_ / extract_piecewiseground, :219-234, :378-420)
  * patch-level gates: uprightness, elevation, flatness (:335-395)

Every point is classified by its patch's final plane, so patches larger
than the fitting cap still classify all their points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PatchworkParams", "estimate_ground"]


class PatchworkParams(NamedTuple):
    sensor_height: float = 1.732
    num_iter: int = 3
    num_lpr: int = 20
    num_min_pts: int = 10
    th_seeds: float = 0.3
    th_dist: float = 0.1
    max_range: float = 80.0
    min_range: float = 0.1
    uprightness_thr: float = 0.707
    adaptive_margin: float = -1.1
    patch_cap: int = 256  # max points used for fitting per patch


# CZM layout (patchwork.h:50-51)
_SECTORS = (16, 32, 54, 32)
_RINGS = (2, 4, 4, 4)
_ELEV_THR = (-1.2, -0.9984, -0.851, -0.605)
_FLAT_THR = (0.0, 0.000125, 0.000185, 0.000185)
N_PATCHES = sum(r * s for r, s in zip(_RINGS, _SECTORS))  # 504


def _zone_boundaries(p: PatchworkParams):
    z2 = (7 * p.min_range + p.max_range) / 8.0
    z3 = (3 * p.min_range + p.max_range) / 4.0
    z4 = (p.min_range + p.max_range) / 2.0
    return (p.min_range, z2, z3, z4, p.max_range)


@partial(jax.jit, static_argnames=("params",))
def estimate_ground(
    pts: jax.Array, valid: jax.Array, params: PatchworkParams = PatchworkParams()
) -> jax.Array:
    """Returns a bool ground mask over pts (N, 3).

    Out-of-range or invalid points are non-ground (the reference routes
    them to cloud_nonground)."""
    p = params
    dtype = pts.dtype
    N = pts.shape[0]
    CAP = p.patch_cap

    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = jnp.hypot(x, y)
    theta = jnp.arctan2(y, x)
    theta = jnp.where(theta < 0, theta + 2 * jnp.pi, theta)

    bounds = _zone_boundaries(p)
    in_range = (r >= bounds[0]) & (r < bounds[4]) & valid

    # patch id assembly
    patch_id = jnp.zeros(N, jnp.int32)
    ring_concentric = jnp.zeros(N, jnp.int32)  # cumulative ring index
    zone_of = jnp.zeros(N, jnp.int32)
    base = 0
    ring_base = 0
    for k in range(4):
        lo, hi = bounds[k], bounds[k + 1]
        nr, ns = _RINGS[k], _SECTORS[k]
        inz = (r >= lo) & (r < hi)
        ring = jnp.clip(((r - lo) / ((hi - lo) / nr)).astype(jnp.int32), 0,
                        nr - 1)
        sect = jnp.clip((theta / (2 * jnp.pi / ns)).astype(jnp.int32), 0,
                        ns - 1)
        pid = base + ring * ns + sect
        patch_id = jnp.where(inz, pid, patch_id)
        ring_concentric = jnp.where(inz, ring_base + ring, ring_concentric)
        zone_of = jnp.where(inz, k, zone_of)
        base += nr * ns
        ring_base += nr
    patch_id = jnp.where(in_range, patch_id, N_PATCHES)  # overflow bucket

    # ---- per-patch capped point matrices (sorted by z ascending) ---------
    order = jnp.lexsort((z, patch_id))
    pid_s = patch_id[order]
    pts_s = pts[order]
    idx = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]), pid_s[1:] != pid_s[:-1]])
    group_head = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, 0)
    )
    rank = idx - group_head
    ok = (pid_s < N_PATCHES) & (rank < CAP)
    dest = jnp.where(ok, pid_s * CAP + rank, N_PATCHES * CAP)
    P = jnp.zeros((N_PATCHES * CAP, 3), dtype).at[dest].set(
        pts_s, mode="drop"
    ).reshape(N_PATCHES, CAP, 3)
    M = jnp.zeros(N_PATCHES * CAP, bool).at[dest].set(
        ok, mode="drop"
    ).reshape(N_PATCHES, CAP)
    counts = jnp.zeros(N_PATCHES + 1, jnp.int32).at[pid_s].add(
        1, mode="drop"
    )[:N_PATCHES]

    zl, rl = [], []
    for k in range(4):
        for ring in range(_RINGS[k]):
            zl += [k] * _SECTORS[k]
            rl += [sum(_RINGS[:k]) + ring] * _SECTORS[k]
    zone_of_patch = jnp.asarray(np.array(zl, np.int32))
    ring_of_patch = jnp.asarray(np.array(rl, np.int32))

    # ---- initial seeds ----------------------------------------------------
    lane = jnp.arange(CAP)[None, :]
    # zone-0 margin skip: ignore points below margin * sensor_height
    too_low = (P[:, :, 2] < p.adaptive_margin * p.sensor_height) & (
        zone_of_patch[:, None] == 0
    )
    seed_ok = M & ~too_low
    # LPR = mean z of first num_lpr eligible (z-sorted) points
    elig_rank = jnp.cumsum(seed_ok.astype(jnp.int32), axis=1) - 1
    in_lpr = seed_ok & (elig_rank < p.num_lpr)
    lpr = jnp.sum(jnp.where(in_lpr, P[:, :, 2], 0.0), axis=1) / jnp.maximum(
        jnp.sum(in_lpr, axis=1), 1
    )
    ground = seed_ok & (P[:, :, 2] < (lpr + p.th_seeds)[:, None])

    # ---- iterative plane fit ---------------------------------------------
    def fit(ground_mask):
        w = ground_mask.astype(dtype)[..., None]
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        mean = jnp.sum(P * w, axis=1) / cnt
        q = (P - mean[:, None, :]) * w
        C = jnp.einsum("pki,pkj->pij", q, q) / cnt[..., None]
        from ..core.measurement import _sym3_smallest_eigvec

        normal = _sym3_smallest_eigvec(C)
        evals = jnp.sort(jnp.linalg.eigvalsh(C), axis=-1)
        # orient upward like the reference's SVD convention is arbitrary;
        # uprightness uses |n_z| so sign is irrelevant, but elevation uses
        # mean z, not the normal
        d = -jnp.einsum("pi,pi->p", normal, mean)
        return normal, d, mean, evals

    for it in range(p.num_iter):
        normal, d, mean, evals = fit(ground)
        th_dist_d = p.th_dist - d
        proj = jnp.einsum("pki,pi->pk", P, normal)
        ground = M & (proj < th_dist_d[:, None])

    # ---- patch-level gates -----------------------------------------------
    upright = jnp.abs(normal[:, 2]) >= p.uprightness_thr
    elev = mean[:, 2]
    surface_var = evals[:, 0] / jnp.maximum(
        evals[:, 0] + evals[:, 1] + evals[:, 2], 1e-12
    )
    elev_thr = jnp.asarray(_ELEV_THR, dtype)
    flat_thr = jnp.asarray(_FLAT_THR, dtype)
    ridx = jnp.clip(ring_of_patch, 0, 3)
    near = ring_of_patch < len(_ELEV_THR)
    elev_ok = elev <= elev_thr[ridx]
    flat_ok = flat_thr[ridx] > surface_var
    patch_ground_ok = upright & (
        ~near | elev_ok | flat_ok
    ) & (counts >= p.num_min_pts)

    # ---- classify EVERY input point by its patch plane --------------------
    pid_safe = jnp.minimum(patch_id, N_PATCHES - 1)
    n_pt = normal[pid_safe]
    proj_pt = jnp.einsum("ni,ni->n", pts, n_pt)
    below = proj_pt < (p.th_dist - d)[pid_safe]
    return in_range & below & patch_ground_ok[pid_safe]
