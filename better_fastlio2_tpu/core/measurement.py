"""Point-to-plane measurement model (h_share_model) — batched and masked.

TPU-native re-design of the reference's OpenMP residual/Jacobian loop
(reference: src/laserMapping.cpp:1876-2004) and the 5-point plane fit
(include/common_lib.h esti_plane, :507-536).  The per-point work —
transform, 5-NN against the voxel map, plane fit, robust gating, Jacobian
rows — is one fused batched computation over a statically padded point set;
validity masks replace the reference's dynamic compaction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..map import voxel_hash
from ..utils import so3
from .esikf import MeasurementOut
from .state import State

__all__ = ["plane_fit", "plane_from_moments", "MeasureAux", "make_measure_fn",
           "transform_to_world"]

NUM_MATCH_POINTS = 5  # NN count (common_lib.h NUM_MATCH_POINTS)
MAX_NN_DIST2 = 5.0  # 5th-NN gate: sq dist > 5 invalid (laserMapping.cpp:1909-1912)
PLANE_INLIER_THRESH = 0.1  # esti_plane threshold (laserMapping.cpp:1922)
ROBUST_S_GATE = 0.9  # accept if s > 0.9 (laserMapping.cpp:1930)


def _sym3_smallest_eig(C: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(eigenvector, eigenvalue) of the smallest eigenvalue of batched
    symmetric 3x3 matrices, closed form (Cardano's trigonometric
    eigenvalues + cross-product eigenvector extraction).  Branch-free;
    degenerate inputs return an arbitrary unit vector (callers gate on
    residuals).
    """
    dtype = C.dtype
    a00, a11, a22 = C[..., 0, 0], C[..., 1, 1], C[..., 2, 2]
    a01, a02, a12 = C[..., 0, 1], C[..., 0, 2], C[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    qm = (a00 + a11 + a22) / 3.0
    p2 = (
        (a00 - qm) ** 2 + (a11 - qm) ** 2 + (a22 - qm) ** 2 + 2.0 * p1
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    Bm = (C - qm[..., None, None] * jnp.eye(3, dtype=dtype)) / p[..., None, None]
    detB = (
        Bm[..., 0, 0] * (Bm[..., 1, 1] * Bm[..., 2, 2] - Bm[..., 1, 2] ** 2)
        - Bm[..., 0, 1]
        * (Bm[..., 0, 1] * Bm[..., 2, 2] - Bm[..., 1, 2] * Bm[..., 0, 2])
        + Bm[..., 0, 2]
        * (Bm[..., 0, 1] * Bm[..., 1, 2] - Bm[..., 1, 1] * Bm[..., 0, 2])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = qm + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector: null space of (C - lam I) via the largest row cross
    M = C - lam_min[..., None, None] * jnp.eye(3, dtype=dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nrm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(best).at[..., 2].set(1.0)
    vec = jnp.where(nrm > 1e-20, best / jnp.maximum(nrm, 1e-20), fallback)
    return vec, lam_min


def _sym3_smallest_eigvec(C: jax.Array) -> jax.Array:
    return _sym3_smallest_eig(C)[0]


def plane_fit(
    neighbors: jax.Array, valid: jax.Array, thresh: float = PLANE_INLIER_THRESH
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fit plane n·p + d = 0 through k neighbor points, batched.

    Solves A @ nv = -1 in least squares via the 3x3 normal equations (the
    reference uses col-pivoted QR on the 5x3 system, common_lib.h:521;
    normal equations are MXU-friendly and equivalent here since the
    systems are tiny and well-scaled), then normalizes:
    n = nv/|nv|, d = 1/|nv|.  A fit is valid when all k inlier residuals
    |n·p + d| <= thresh (common_lib.h:526-533).

    Args: neighbors (N, k, 3), valid (N,) — rows with valid=False return
    plane_ok=False.
    Returns: (normal (N,3), d (N,), plane_ok (N,)).
    """
    A = neighbors  # (N, k, 3)
    # Centered PCA fit: the reference's A n = -1 normal-equations system is
    # numerically singular in f32 for coplanar points at large world
    # coordinates (entries ~ coord^2), so we fit in the centroid frame:
    # the LSQ plane passes through the centroid with normal = smallest
    # eigenvector of the scatter matrix — identical plane, conditioned on
    # the point spread (~ leaf size) instead of the world position.
    # The eigenvector comes from a closed-form 3x3 symmetric solve
    # (Cardano + cross products) — pure VPU arithmetic, no iterative eigh.
    c = jnp.mean(A, axis=1, keepdims=True)
    q = A - c
    C = jnp.einsum("nki,nkj->nij", q, q)
    n = _sym3_smallest_eigvec(C)
    d = -jnp.einsum("ni,ni->n", n, c[:, 0, :])
    # reference sign convention: d > 0 (pca_result(3) = 1/|nv|)
    sgn = jnp.where(d < 0, -1.0, 1.0)
    n = n * sgn[:, None]
    d = d * sgn
    resid = jnp.abs(jnp.einsum("nki,ni->nk", A, n) + d[:, None])
    plane_ok = valid & jnp.all(resid <= thresh, axis=-1)
    return n, d, plane_ok


def _gather_moment_rows(m, nb, cell_mask_fn, max_probe, dtype):
    """List of (N, 10) masked corner-relative moment rows, one per
    neighbor column of `nb` (N, NB, 3) — dense-table (tag-validated) or
    slot-table path.  One 1-D-indexed row gather PER OFFSET: lowering
    variants A/B-measured in profile_ablate2 (ms/scan full window): this
    form 7.6-7.7; single (N, NB) 2-D-index gather +0.44; 4-D multi-dim
    indexing ~21; vmap(dynamic_slice) (3, CH)-slices for the contiguous
    z-run ~51 (!).  XLA's gather lowering on this backend strongly
    prefers plain 1-D row indexing."""
    NB = nb.shape[1]
    mask_ok = cell_mask_fn(nb) if cell_mask_fn is not None else None
    rows_l = []
    if m.dmom is not None:
        dense_shape = m.dense.shape
        lin = voxel_hash._dense_linear(dense_shape, nb)  # (N, NB)
        tag = voxel_hash._alias_tag(dense_shape, nb).astype(dtype)
        for j in range(NB):
            rj = m.dmom[lin[:, j]]  # (N, DMOM_CH)
            okj = rj[:, 0] == tag[:, j]
            if mask_ok is not None:
                okj = okj & mask_ok[:, j]
            rows_l.append(jnp.where(okj[:, None], rj[:, 1:11], 0.0))
    else:
        assert m.mom is not None, "map must be allocated with moments=True"
        N = nb.shape[0]
        if m.dense is not None:
            slots = voxel_hash._dense_lookup(m.dense, nb)
        else:
            slots = voxel_hash._lookup_slots(
                m.key, nb.reshape(-1, 3), max_probe
            ).reshape(N, NB)
        if mask_ok is not None:
            slots = jnp.where(mask_ok, slots, -1)
        for j in range(NB):
            sl = slots[:, j]
            rows_l.append(jnp.where((sl >= 0)[:, None],
                                    m.mom[jnp.maximum(sl, 0)], 0.0))
    return rows_l


def _accumulate_rebased(sums, momj, dj, iu):
    """sums += momj rebased by delta dj (3 scalars or (N,) arrays):
    S1' = S1 + n δ,  S2'_ab = S2_ab + δ_a S1_b + δ_b S1_a + n δ_a δ_b.
    Accumulated one offset at a time so only (N, 10) intermediates ever
    exist, vs the (N, NB, 3, 3) broadcast tensors of the tensorized form
    (~17 MB of HBM round trips at n_ds = 16k, measurably slower on
    v5e)."""
    n_c = momj[:, 0]
    S1 = momj[:, 1:4]
    S1r = jnp.stack([S1[:, a] + n_c * dj[a] for a in range(3)], -1)
    S2r = jnp.stack(
        [momj[:, 4 + k] + dj[a] * S1[:, b] + dj[b] * S1[:, a]
         + n_c * (dj[a] * dj[b]) for k, (a, b) in enumerate(iu)],
        -1,
    )
    return sums + jnp.concatenate([n_c[:, None], S1r, S2r], axis=-1)


_REBASE_IU = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def neighborhood_moment_sums(
    m: voxel_hash.VoxelHashMap,
    p_world: jax.Array,
    max_probe: int = 16,
    cell_mask_fn=None,
    cells: str = "face7",
) -> tuple[jax.Array, jax.Array]:
    """(sums (N, 10), ijk (N, 3)): per-query moments of the blended cell
    neighborhood, rebased to the query's own-cell corner and summed.
    `cell_mask_fn(nb_coords) -> bool` restricts which cells contribute
    (the device-sharded map sums only OWNED cells and psums the partials
    — sums are associative across shards).

    With a dense moment table (m.dmom, the steady-state fast path) the
    whole read is a tag-validated row gather per neighbor offset — no
    slot lookup, no second gather; identical sums whenever the two
    tables hold the same voxels.

    `cells` selects the neighborhood (the association gather is the
    dominant step cost, ~21 ns/row random-row reads — PERF.md — so the
    row count is a first-order perf knob):
    - "face7" (default): own + 6 face neighbors, the reference-parity
      symmetric union.
    - "tangent5": two-phase read — the own-cell row first, its moment
      normal's dominant axis, then ONLY the 4 face neighbors on the two
      TANGENT axes (where a locally planar surface actually extends);
      the 2 normal-direction neighbors a plane cannot reach are skipped.
      5 rows instead of 7 (~29% of the gather), support stays symmetric
      in the tangent plane.  Own cells with < 3 points default to a
      z-normal (ground prior).
    - "octant4": own + the 3 face neighbors on the point's side of its
      cell center.  Cheapest (4 rows).

    MEASURED-REJECTED for production (PERF.md round-5): both reduced
    modes pin the motion axis at trajectory transients on the e2e
    pipeline (est velocity never acquired; ATE 1.9 m vs 0.10 m) even
    though their static plane quality matches face7.  A control
    experiment (tangent5 union CONTENT via the static face7 gather)
    reproduces the pin exactly, so the failure is the union content:
    when the pose error approaches a voxel, the cells IN FRONT of a
    surface associate through their normal-direction neighbors — that
    is how face7 lanes see the true surface and pull the state through
    a transient; without them the under-corrected filter inserts a
    phantom surface at the wrong pose and the map corruption locks the
    pin.  The normal-direction reads are load-bearing, not padding.
    Kept as measurement knobs; default face7."""
    dtype = m.points.dtype
    vs = m.voxel_size
    N = p_world.shape[0]
    iu = _REBASE_IU

    ijk = voxel_hash._voxel_of(p_world, vs)

    if cells == "tangent5":
        # phase 1: own-cell row (delta 0 — rebase is identity)
        own = _gather_moment_rows(m, ijk[:, None, :], cell_mask_fn,
                                  max_probe, dtype)[0]
        n_c = own[:, 0]
        S1 = own[:, 1:4]
        iu3 = jnp.array([[0, 1, 2], [1, 3, 4], [2, 4, 5]])
        S2 = own[:, 4:10][:, iu3]
        c = S1 / jnp.maximum(n_c, 1.0)[:, None]
        Cov = S2 - S1[:, :, None] * c[:, None, :]
        nvec, _ = _sym3_smallest_eig(Cov)
        # dominant normal axis; young own cells (< 3 pts) -> z (ground
        # prior): their union then blends the ±x/±y ring, the safest
        # default for scan geometry
        dom = jnp.where(n_c >= 3, jnp.argmax(jnp.abs(nvec), axis=-1), 2)
        a1 = (dom + 1) % 3
        a2 = (dom + 2) % 3
        e1 = jax.nn.one_hot(a1, 3, dtype=jnp.int32)  # (N, 3)
        e2 = jax.nn.one_hot(a2, 3, dtype=jnp.int32)
        # phase 2: the 4 tangent-axis face neighbors
        nb = jnp.stack([ijk + e1, ijk - e1, ijk + e2, ijk - e2], axis=1)
        rows = _gather_moment_rows(m, nb, cell_mask_fn, max_probe, dtype)
        sums = own  # own-cell contribution
        deltas = [e1.astype(dtype) * vs, -e1.astype(dtype) * vs,
                  e2.astype(dtype) * vs, -e2.astype(dtype) * vs]
        for j in range(4):
            dj = [deltas[j][:, a] for a in range(3)]
            sums = _accumulate_rebased(sums, rows[j], dj, iu)
        return sums, ijk

    if cells == "octant4":
        # sign of the point's offset from its cell CENTER, per axis
        frac = p_world / vs - ijk.astype(dtype)  # in [0, 1)
        sgn = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)  # (N, 3)
        eye = jnp.eye(3, dtype=jnp.int32)
        step = sgn[:, :, None] * eye[None, :, :]  # (N, 3, 3): row a = ±e_a
        nb = jnp.concatenate(
            [ijk[:, None, :], ijk[:, None, :] + step], axis=1)  # (N, 4, 3)
        rows = _gather_moment_rows(m, nb, cell_mask_fn, max_probe, dtype)
        sums = rows[0]  # own cell: zero delta
        for j in range(1, 4):
            dj = [step[:, j - 1, a].astype(dtype) * vs for a in range(3)]
            sums = _accumulate_rebased(sums, rows[j], dj, iu)
        return sums, ijk

    assert cells == "face7", f"unknown cells mode {cells!r}"
    offs = voxel_hash._neighbor_offsets(7)  # own + 6 face neighbors
    NB = offs.shape[0]
    nb = ijk[:, None, :] + offs[None, :, :]
    rows = _gather_moment_rows(m, nb, cell_mask_fn, max_probe, dtype)
    sums = jnp.zeros((N, 10), dtype)
    for j in range(NB):
        # δ_j as python-float scalars when vs is static, else traced
        dj = [offs[j, a].astype(dtype) * vs for a in range(3)]
        sums = _accumulate_rebased(sums, rows[j], dj, iu)
    return sums, ijk


def finalize_plane_from_sums(
    sums: jax.Array,
    ijk: jax.Array,
    voxel_size,
    valid: jax.Array,
    thresh: float = PLANE_INLIER_THRESH,
    min_points: int = NUM_MATCH_POINTS,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form LSQ plane per query from blended moment sums."""
    dtype = sums.dtype
    n_tot = sums[:, 0]
    S1t = sums[:, 1:4]
    iu = jnp.array([[0, 1, 2], [1, 3, 4], [2, 4, 5]])
    S2t = sums[:, 4:10][:, iu]  # (N, 3, 3)

    nn = jnp.maximum(n_tot, 1.0)
    c = S1t / nn[:, None]  # centroid, own-corner frame
    Cov = S2t - S1t[:, :, None] * c[:, None, :]  # scatter matrix
    nvec, lam_min = _sym3_smallest_eig(Cov)
    rms = jnp.sqrt(jnp.maximum(lam_min, 0.0) / nn)

    centroid_w = c + ijk.astype(dtype) * voxel_size
    d = -jnp.einsum("ni,ni->n", nvec, centroid_w)
    sgn = jnp.where(d < 0, -1.0, 1.0)
    nvec = nvec * sgn[:, None]
    d = d * sgn
    plane_ok = valid & (n_tot >= min_points) & (rms <= thresh)
    return nvec, d, plane_ok


def plane_from_moments(
    m: voxel_hash.VoxelHashMap,
    p_world: jax.Array,
    valid: jax.Array,
    max_probe: int = 16,
    thresh: float = PLANE_INLIER_THRESH,
    min_points: int = NUM_MATCH_POINTS,
    cells: str = "face7",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-point plane from the map's per-voxel moment cache.

    The TPU-fast alternative to 5-NN + esti_plane (the VoxelMap /
    Faster-LIO direction the reference README recommends, README:266-267):
    each query blends the accumulated point moments of its own voxel and
    the 6 face neighbors — the union-of-points least-squares plane in
    closed form, with NO candidate-point gather and NO top-k.  Gates:
    >= `min_points` accumulated points (the NUM_MATCH_POINTS analog) and
    rms point-plane distance sqrt(lam_min/n) <= `thresh` (the esti_plane
    inlier-residual analog, laserMapping.cpp:1922 / common_lib.h:526-533).

    Returns (normal (N,3), d (N,), plane_ok (N,)) with n·p + d = 0,
    d >= 0 sign convention matching plane_fit.
    """
    sums, ijk = neighborhood_moment_sums(m, p_world, max_probe=max_probe,
                                         cells=cells)
    return finalize_plane_from_sums(
        sums, ijk, m.voxel_size, valid, thresh=thresh, min_points=min_points
    )


class MeasureAux(NamedTuple):
    """Association cache threaded through ESIKF iterations — the analog
    of Nearest_Points / point_selected_surf persisting across h_share_model
    calls (laserMapping.cpp:117,1903-1913).

    The plane fit depends only on the neighbor set, not on the state, so
    its results (normal, d, fit_ok) are computed once per association
    pass and cached here instead of being refit every iteration (the
    reference refits per call — laserMapping.cpp:1919 — because its loop
    is CPU-cheap; on TPU the refit is measurable dead work)."""

    normal: jax.Array  # (N, 3) plane unit normals (world)
    d: jax.Array  # (N,) plane offsets, n·p + d = 0
    fit_ok: jax.Array  # (N,) nn_ok & plane residuals within threshold
    searched: jax.Array  # () bool — an association pass has run
    assoc_ijk: jax.Array  # (N, 3) int32 voxel of each point at association
    refreshed: jax.Array  # () bool — the one lazy refresh pass has run
    soa: jax.Array | None = None  # (16, N) fused-solve buffer (pack_soa)
    soa_c: jax.Array | None = None  # (16, B) live-lane compacted buffer
    use_c: jax.Array | None = None  # () bool — soa_c holds ALL live lanes


def transform_to_world(s: State, pts_body: jax.Array) -> jax.Array:
    """p_world = R_wi (R_il p + t_il) + t_wi (laserMapping.cpp:1895)."""
    p_imu = so3.quat_rotate(s.off_r, pts_body) + s.off_t
    return so3.quat_rotate(s.rot, p_imu) + s.pos


def _budgeted_refresh(aux, p_world, ijk_now, pts_valid, search_rows,
                      refresh_budget: int, N: int, extra_update=None):
    """Shared lazy re-association body (see make_measure_fn docstring):
    rows whose voxel moved since the full association pass get fresh
    planes, compacted under `refresh_budget` (ascending-index selection,
    deterministic).  `extra_update(aux, safe, act, dst, n_s, d_s, ok_s)`
    lets the fused path refresh its SoA columns in the same pass."""
    need = (pts_valid & aux.searched
            & jnp.any(ijk_now != aux.assoc_ijk, axis=-1))
    sel = jnp.nonzero(need, size=refresh_budget,
                      fill_value=N)[0].astype(jnp.int32)
    act = sel < N
    safe = jnp.minimum(sel, N - 1)
    n_s, d_s, ok_s = search_rows(p_world[safe], act)
    dst = jnp.where(act, sel, N)
    aux = aux._replace(
        normal=aux.normal.at[dst].set(n_s, mode="drop"),
        d=aux.d.at[dst].set(d_s, mode="drop"),
        fit_ok=aux.fit_ok.at[dst].set(ok_s, mode="drop"),
        assoc_ijk=aux.assoc_ijk.at[dst].set(ijk_now[safe], mode="drop"),
        refreshed=jnp.array(True),
    )
    if extra_update is not None:
        aux = extra_update(aux, safe, act, dst, n_s, d_s, ok_s)
    return aux


def make_measure_fn(
    m: voxel_hash.VoxelHashMap,
    pts_body: jax.Array,
    pts_valid: jax.Array,
    extrinsic_est: bool = False,
    max_probe: int = 16,
    n_neighbors: int = 27,
    single_association: bool = False,
    max_live: int = 0,
    plane_cache: bool = False,
    refresh_budget: int = 4096,
    fused_solve: bool = False,
    early_converge: bool = False,
    solve_compact: int = 0,
    psum_axis: str | None = None,
    assoc_cells: str = "face7",
):
    """Build a measure_fn(state, converged, aux) -> MeasurementOut closure
    over a fixed scan + map, for esikf.update_iterated.

    `converged` gates re-association exactly like dyn_share.converge does
    in the reference (laserMapping.cpp:1906-1913).  With
    single_association=True the FULL association runs once per scan and
    later converged iterations run a LAZY re-association instead: only
    the rows whose voxel assignment changed since the full pass are
    re-searched, compacted under `refresh_budget` (an association is a
    pure function of the point's voxel, so unchanged-voxel rows are
    bit-identical under re-search — the refresh IS the reference's
    post-convergence re-search, evaluated sparsely).  While tracking,
    updates move points ≪ a voxel and the refresh is an empty cond
    (~zero cost — this is where the single-association speedup comes
    from); during transients the changed rows get corrected planes,
    which prevents the stale-association fixpoint that otherwise
    compounds through the map into meters-level divergence
    (tools/_probe_crop2.py: 9.0 m vs 0.06 m ATE at motion onset).
    refresh_budget=0 disables the refresh (the pre-guard behavior).
    plane_cache=True replaces the 5-NN + plane fit with the per-voxel
    moment-cache plane (plane_from_moments) — the map must be allocated
    with moments=True.
    early_converge=True (fused path only) lets the iterated update exit
    on the FIRST converged pass whenever the lazy-refresh trigger
    certifies a re-association would change nothing (n_moved below the
    fire threshold): the reference's confirmation pass
    (esekfom.hpp:1846-1851) exists only to re-associate, and with the
    cached association it recomputes a bit-identical system — skipping
    it saves ~1-2 solve passes per scan at < limit (1e-3) trajectory
    impact (tests/test_fused_solve.py bounds it).
    fused_solve=True (requires single_association and extrinsic_est off)
    runs each solve iteration as ONE fused Pallas pass
    (ops/pallas_kernels.fused_normal_eqs): transform, residual, robust
    gate, Jacobian rows and the 6x6 normal equations never materialise
    N-sized intermediates in HBM.  Valid because with extrinsic
    estimation off the extrinsic error-state columns of the gain are
    exactly zero (H has no extrinsic columns and P keeps the extrinsic
    blocks decoupled), so p_imu = R_il p + t_il is bit-constant across
    iterations and can be packed once per association pass.  On
    non-TPU backends the identical-math jnp reference runs instead.
    psum_axis (SPMD mode, inside shard_map): `pts_body` is this device's
    contiguous slice of the scan and every control-flow scalar that
    gates iteration behavior (the lazy-refresh trigger counts n_moved /
    n_valid, the early-converge certificate) is psum'd over the mesh
    axis so all devices take identical branches — the Gram itself is
    psum'd downstream by esikf.update_iterated(psum_axis=...).
    """
    N = pts_body.shape[0]
    dtype = pts_body.dtype

    def search_rows(p_w, rows_valid):
        """Association of a (possibly compacted) row set -> (n, d, ok)."""
        if plane_cache:
            return plane_from_moments(m, p_w, rows_valid,
                                      max_probe=max_probe,
                                      cells=assoc_cells)
        nb, d2, ok = voxel_hash.knn(
            m, p_w, k=NUM_MATCH_POINTS, max_probe=max_probe,
            n_neighbors=n_neighbors, max_live=max_live,
        )
        nn_ok = (
            jnp.all(ok, axis=-1)
            & (d2[:, NUM_MATCH_POINTS - 1] <= MAX_NN_DIST2)
            & rows_valid
        )
        return plane_fit(nb, nn_ok)

    if fused_solve:
        assert not extrinsic_est, "fused_solve requires extrinsic_est off"
        assert single_association, "fused_solve requires single_association"
        return _make_fused_measure(
            m, pts_body, pts_valid, search_rows, refresh_budget,
            early_converge=early_converge, solve_compact=solve_compact,
            psum_axis=psum_axis)

    def measure(s: State, converged: jax.Array, aux: MeasureAux) -> MeasurementOut:
        p_world = transform_to_world(s, pts_body)
        ijk_now = voxel_hash._voxel_of(p_world, m.voxel_size)

        def do_search(_):
            n, d, plane_ok = search_rows(p_world, pts_valid)
            return MeasureAux(n, d, plane_ok, jnp.array(True), ijk_now,
                              jnp.array(False))

        if single_association:
            gate = jnp.logical_not(aux.searched)
        else:
            gate = converged
        aux = jax.lax.cond(gate, do_search, lambda a: a, aux)

        if single_association and refresh_budget > 0:
            # lazy re-association (see docstring): rows whose voxel moved
            # since the full pass get fresh planes, budget-compacted.
            # AT MOST ONCE per scan (like the reference's single
            # post-convergence re-search) — an unbounded refresh loop
            # resets convergence every pass and pays 2+ extra iterations
            need = (pts_valid & aux.searched
                    & jnp.any(ijk_now != aux.assoc_ijk, axis=-1))
            # fire only on real transients: every scan re-associates in
            # full at iteration 0, so within-scan staleness matters only
            # when the update moved a sizable fraction of rows across a
            # voxel boundary.  Tracking updates (~mm) leave ~1-3% of rows
            # with an approximately-valid previous plane — refreshing
            # those costs 2+ extra iterations/scan for no accuracy gain.
            n_need = jnp.sum(need.astype(jnp.int32))
            n_val = jnp.sum(pts_valid.astype(jnp.int32))
            if psum_axis is not None:  # uniform trigger across the mesh
                n_need = jax.lax.psum(n_need, psum_axis)
                n_val = jax.lax.psum(n_val, psum_axis)
            fire = n_need * 20 > n_val  # > 5% of valid rows

            aux = jax.lax.cond(
                converged & ~aux.refreshed & fire,
                lambda a: _budgeted_refresh(
                    a, p_world, ijk_now, pts_valid, search_rows,
                    refresh_budget, N),
                lambda a: a, aux)

        n, d, plane_ok = aux.normal, aux.d, aux.fit_ok
        pd2 = jnp.einsum("ni,ni->n", n, p_world) + d
        body_norm = jnp.linalg.norm(pts_body, axis=-1)
        srob = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.maximum(body_norm, 1e-8))
        sel = plane_ok & (srob > ROBUST_S_GATE)

        # Jacobian rows (laserMapping.cpp:1966-2002):
        #   C = R_wi^T n (world normal into imu frame)
        #   A = (R_il p + t_il)^ C
        #   B = p_body^ R_il^T C   (extrinsic rotation, optional)
        # With extrinsic estimation off the trailing 6 columns are zero
        # (laserMapping.cpp:1995-2000) — emit only the live 6 so the
        # normal equations shrink to 6x6 (esikf handles any width).
        p_imu = so3.quat_rotate(s.off_r, pts_body) + s.off_t
        C = so3.quat_inv_rotate(s.rot, n)
        Arow = jnp.cross(p_imu, C)
        cols = [n, Arow]
        if extrinsic_est:
            cols += [
                jnp.cross(pts_body, so3.quat_inv_rotate(s.off_r, C)),
                C,
            ]
        h_x = jnp.concatenate(cols, axis=-1)
        h = -pd2
        return MeasurementOut(h_x=h_x, h=h, mask=sel, aux=aux)

    aux0 = MeasureAux(
        normal=jnp.zeros((N, 3), dtype),
        d=jnp.zeros(N, dtype),
        fit_ok=jnp.zeros(N, bool),
        searched=jnp.array(False),
        assoc_ijk=jnp.zeros((N, 3), jnp.int32),
        refreshed=jnp.array(False),
    )
    return measure, aux0


def _make_fused_measure(m, pts_body, pts_valid, search_rows,
                        refresh_budget: int, early_converge: bool = False,
                        solve_compact: int = 0,
                        psum_axis: str | None = None):
    """Fused-solve variant of make_measure_fn's measure closure (see its
    docstring).  Association packs a (16, N) SoA buffer once per scan;
    every iteration is one fused_normal_eqs pass producing the Gram
    matrix the esikf consumes directly (MeasurementOut.gram).

    solve_compact = B > 0 adds valid-lane compaction: lanes with
    fit_ok=0 or valid=0 contribute exactly zero to the Gram in every
    iteration, so when the association leaves <= B live lanes the
    per-iteration kernel runs over an ascending-index compacted (16, B)
    buffer instead of all N columns (one jnp.nonzero + gather per scan,
    amortised over every solve pass).  Scans with more live lanes fall
    back to the full-width kernel — never drops a measurement.  Two
    bounded semantic deltas vs B=0, both confined to transient scans:
    n_moved counts only live-lane voxel moves (dead lanes can't trigger
    the lazy refresh), and a dead lane can only be resurrected by the
    refresh pass, not by the per-iteration robust gate re-evaluation it
    never had.  The reference rejects exactly these lanes early and
    for good (laserMapping.cpp:1944-1954 compacts point_selected_surf).
    """
    from ..ops import pallas_kernels as pk

    N = pts_body.shape[0]
    dtype = pts_body.dtype
    # Pallas-TPU lowering only on TPU-family backends ('axon' is the
    # remote-TPU plugin); every other backend (cpu, gpu, ...) runs the
    # identical-math jnp reference
    use_kernel = jax.default_backend() in ("tpu", "axon")
    invb = 0.9 / jnp.sqrt(
        jnp.maximum(jnp.linalg.norm(pts_body, axis=-1), 1e-8))
    vs = jnp.asarray(m.voxel_size, dtype)
    n_val_scan = jnp.sum(pts_valid.astype(dtype))
    if psum_axis is not None:  # global valid count (uniform thresholds)
        n_val_scan = jax.lax.psum(n_val_scan, psum_axis)
    B = int(solve_compact) if 0 < int(solve_compact) < N else 0

    def normal_eqs(soa, params):
        if use_kernel:
            return pk.fused_normal_eqs(soa, params)
        return pk.fused_normal_eqs_reference(soa, params)

    def _compact(soa):
        """(soa_c, use_c): live lanes gathered to the first B columns
        (ascending index, deterministic); use_c=False when they don't
        fit — callers then run the full-width kernel."""
        live = (soa[pk._OK] > 0) & (soa[pk._VAL] > 0)
        use = jnp.sum(live.astype(jnp.int32)) <= B

        def do(_):
            idx = jnp.nonzero(live, size=B,
                              fill_value=N)[0].astype(jnp.int32)
            act = idx < N
            cols = soa[:, jnp.minimum(idx, N - 1)]
            return jnp.where(act[None, :], cols, 0.0)

        soa_c = jax.lax.cond(
            use, do, lambda _: jnp.zeros((pk.SOA_CH, B), soa.dtype), 0)
        return soa_c, use

    def _with_compact(aux):
        if not B:
            return aux
        soa_c, use_c = _compact(aux.soa)
        return aux._replace(soa_c=soa_c, use_c=use_c)

    def solve(aux, params):
        if not B:
            return normal_eqs(aux.soa, params)
        return jax.lax.cond(
            aux.use_c,
            lambda: normal_eqs(aux.soa_c, params),
            lambda: normal_eqs(aux.soa, params))

    def build_aux(s, aux):
        p_world = transform_to_world(s, pts_body)
        ijk = voxel_hash._voxel_of(p_world, m.voxel_size)
        n, d, ok = search_rows(p_world, pts_valid)
        p_imu = so3.quat_rotate(s.off_r, pts_body) + s.off_t
        soa = pk.pack_soa(p_imu, n, d, invb, ok, ijk, pts_valid)
        return _with_compact(aux._replace(
            normal=n, d=d, fit_ok=ok, searched=jnp.array(True),
            assoc_ijk=ijk, refreshed=jnp.array(False), soa=soa))

    def measure(s: State, converged: jax.Array,
                aux: MeasureAux) -> MeasurementOut:
        aux = jax.lax.cond(
            jnp.logical_not(aux.searched),
            lambda a: build_aux(s, a), lambda a: a, aux)

        params = jnp.concatenate([
            so3.quat_to_matrix(s.rot).reshape(-1), s.pos,
            vs[None], jnp.zeros(3, dtype),
        ]).astype(jnp.float32)
        G, n_moved_l = solve(aux, params)
        # uniform trigger across the mesh: psum the LOCAL moved count
        # (the Gram itself is psum'd by esikf.update_iterated)
        n_moved = (jax.lax.psum(n_moved_l, psum_axis)
                   if psum_axis is not None else n_moved_l)

        if refresh_budget > 0:
            fire = (converged & jnp.logical_not(aux.refreshed)
                    & (n_moved * 20.0 > n_val_scan))

            def do_refresh(aux):
                p_world = transform_to_world(s, pts_body)
                ijk_now = voxel_hash._voxel_of(p_world, m.voxel_size)

                def update_soa(aux, safe, act, dst, n_s, d_s, ok_s):
                    p_imu_s = (so3.quat_rotate(s.off_r, pts_body[safe])
                               + s.off_t)
                    cols = pk.pack_soa(p_imu_s, n_s, d_s, invb[safe],
                                       ok_s, ijk_now[safe],
                                       pts_valid[safe] & act)
                    # refreshed rows can change the live set (a moved
                    # row may gain or lose fit_ok) — re-derive the
                    # compacted buffer from the updated full soa
                    return _with_compact(aux._replace(
                        soa=aux.soa.at[:, dst].set(cols, mode="drop")))

                return _budgeted_refresh(
                    aux, p_world, ijk_now, pts_valid, search_rows,
                    refresh_budget, N, extra_update=update_soa)

            aux = jax.lax.cond(fire, do_refresh, lambda a: a, aux)
            # re-solve over the refreshed association; the cond carries
            # only LOCAL values (solve has no collectives), the psum
            # runs unconditionally after it — uniform either way
            G, n_moved_l = jax.lax.cond(
                fire,
                lambda: solve(aux, params),
                lambda: (G, n_moved_l),
            )
            n_moved = (jax.lax.psum(n_moved_l, psum_axis)
                       if psum_axis is not None else n_moved_l)

        if early_converge:
            # re-association would change nothing only when the moved
            # fraction itself is below the trigger — judged on the raw
            # moved count regardless of whether the per-scan refresh has
            # already been spent, so a post-refresh re-divergence (the
            # case where the reference, esekfom.hpp:1846-1851, would
            # re-associate) still forces the confirmation pass
            early_ok = n_moved * 20.0 <= n_val_scan
        else:
            early_ok = None
        return MeasurementOut(
            h_x=jnp.zeros((0, 6), dtype), h=jnp.zeros(0, dtype),
            mask=jnp.zeros(0, bool), aux=aux, gram=G, early_ok=early_ok,
        )

    aux0 = MeasureAux(
        normal=jnp.zeros((N, 3), dtype),
        d=jnp.zeros(N, dtype),
        fit_ok=jnp.zeros(N, bool),
        searched=jnp.array(False),
        assoc_ijk=jnp.zeros((N, 3), jnp.int32),
        refreshed=jnp.array(False),
        soa=jnp.zeros((pk.SOA_CH, N), dtype),
        soa_c=jnp.zeros((pk.SOA_CH, B), dtype) if B else None,
        use_c=jnp.array(False) if B else None,
    )
    return measure, aux0
