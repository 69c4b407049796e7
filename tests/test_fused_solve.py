"""Fused Pallas solve path (ops/pallas_kernels.fused_normal_eqs +
measurement._make_fused_measure): kernel-vs-reference parity and
end-to-end update parity against the unfused row path.

On the CPU test mesh the fused measure dispatches the jnp reference
implementation (identical math); the Pallas kernel itself is exercised
in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from better_fastlio2_tpu.core import esikf, measurement
from better_fastlio2_tpu.core.state import State
from better_fastlio2_tpu.map import voxel_hash
from better_fastlio2_tpu.ops import pallas_kernels as pk
from better_fastlio2_tpu.utils import so3


def _random_soa(rng, n):
    p_imu = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    d = rng.normal(size=n).astype(np.float32)
    invb = (0.9 / np.sqrt(np.maximum(
        np.linalg.norm(p_imu, axis=-1), 1e-8))).astype(np.float32)
    ok = (rng.uniform(size=n) > 0.3)
    ijk = np.floor(p_imu / 0.5).astype(np.int32)
    # perturb some assoc voxels so n_moved is nonzero
    ijk[: n // 8] += 1
    valid = rng.uniform(size=n) > 0.1
    return pk.pack_soa(
        jnp.asarray(p_imu), jnp.asarray(normal), jnp.asarray(d),
        jnp.asarray(invb), jnp.asarray(ok), jnp.asarray(ijk),
        jnp.asarray(valid),
    )


def _params(rng):
    q = so3.quat_normalize(jnp.asarray(
        rng.normal(size=4).astype(np.float32)))
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    return jnp.concatenate([
        so3.quat_to_matrix(q).reshape(-1), t,
        jnp.asarray([0.5], jnp.float32), jnp.zeros(3, jnp.float32),
    ])


def test_kernel_matches_reference_interpret():
    rng = np.random.default_rng(3)
    soa = _random_soa(rng, 2048 * 4)
    params = _params(rng)
    G_ref, mv_ref = pk.fused_normal_eqs_reference(soa, params)
    G_k, mv_k = pk.fused_normal_eqs(soa, params, interpret=True)
    np.testing.assert_allclose(np.asarray(G_k), np.asarray(G_ref),
                               rtol=1e-5, atol=1e-3)
    assert int(mv_k) == int(mv_ref)


def test_gram_layout_matches_row_build():
    """G[:6,:6] / G[:6,6] / G[7,7] equal the masked row-path reduction."""
    rng = np.random.default_rng(4)
    n = 512
    soa = _random_soa(rng, n)
    params = _params(rng)
    G, _ = pk.fused_normal_eqs_reference(soa, params)

    R = np.asarray(params[:9]).reshape(3, 3)
    t = np.asarray(params[9:12])
    p_imu = np.asarray(soa[0:3]).T
    nrm = np.asarray(soa[3:6]).T
    d = np.asarray(soa[6])
    invb = np.asarray(soa[7])
    ok = np.asarray(soa[8]) > 0.5
    pw = p_imu @ R.T + t
    pd2 = np.einsum("ni,ni->n", nrm, pw) + d
    sel = ok & (np.abs(pd2) * invb < 0.1)
    C = nrm @ R
    h_x = np.concatenate([nrm, np.cross(p_imu, C)], axis=-1)
    w = sel.astype(np.float32)
    hx = h_x * w[:, None]
    HTH = hx.T @ hx
    HTh = hx.T @ (-pd2 * w)
    np.testing.assert_allclose(np.asarray(G[:6, :6]), HTH, rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(G[:6, 6]), HTh, rtol=1e-4,
                               atol=1e-3)
    assert int(G[7, 7]) == int(w.sum())


def _toy_problem(seed=0, n=1024, plane_cache=False):
    rng = np.random.default_rng(seed)
    # map: points on three walls
    wall = []
    for ax in range(3):
        g = rng.uniform(-4, 4, size=(4000, 3)).astype(np.float32)
        g[:, ax] = rng.normal(scale=0.01, size=4000) + (2.0 + ax)
        wall.append(g)
    map_pts = np.concatenate(wall)
    m = voxel_hash.make_map(capacity_log2=15, bucket=8, voxel_size=0.5,
                            moments=plane_cache)
    m = voxel_hash.insert(m, jnp.asarray(map_pts),
                          jnp.ones(len(map_pts), bool))

    from better_fastlio2_tpu.core.state import identity_state
    x_true = identity_state()
    # scan points: samples of the same walls in body frame (identity pose)
    scan = map_pts[rng.choice(len(map_pts), n)] + rng.normal(
        scale=0.005, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    # perturbed prior
    x0 = x_true._replace(
        pos=jnp.asarray([0.05, -0.03, 0.02], jnp.float32),
        rot=so3.quat_normalize(jnp.asarray([1.0, 0.01, -0.01, 0.005],
                                           jnp.float32)),
    )
    P0 = jnp.eye(esikf.ERR_DIM, dtype=jnp.float32) * 1e-2
    return m, jnp.asarray(scan), jnp.asarray(valid), x0, P0


@pytest.mark.parametrize("plane_cache", [False, True])
def test_update_parity_fused_vs_rows(plane_cache):
    m, scan, valid, x0, P0 = _toy_problem(plane_cache=plane_cache)

    outs = []
    for fused in (False, True):
        measure, aux0 = measurement.make_measure_fn(
            m, scan, valid, single_association=True,
            plane_cache=plane_cache, fused_solve=fused,
        )
        x, P, _, info = esikf.update_iterated(
            x0, P0, measure, aux0, max_iter=4, n_cols=6)
        outs.append((x, P, info))

    (x_r, P_r, i_r), (x_f, P_f, i_f) = outs
    np.testing.assert_allclose(np.asarray(x_f.pos), np.asarray(x_r.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_f.rot), np.asarray(x_r.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(P_f), np.asarray(P_r),
                               rtol=1e-3, atol=1e-5)
    # converged near the true pose (prior was 5-8 cm off)
    assert float(jnp.linalg.norm(x_f.pos)) < 0.02


def test_fused_requires_flags():
    m, scan, valid, x0, P0 = _toy_problem()
    with pytest.raises(AssertionError):
        measurement.make_measure_fn(
            m, scan, valid, single_association=False, fused_solve=True)
    with pytest.raises(AssertionError):
        measurement.make_measure_fn(
            m, scan, valid, single_association=True, extrinsic_est=True,
            fused_solve=True)


def test_early_converge_bounds_and_saves_passes():
    """early_converge exits on the first converged pass when the refresh
    trigger certifies re-association is a no-op: iteration count drops,
    and the state stays within the convergence limit of the full run."""
    m, scan, valid, x0, P0 = _toy_problem(plane_cache=True)

    outs = []
    for early in (False, True):
        measure, aux0 = measurement.make_measure_fn(
            m, scan, valid, single_association=True, plane_cache=True,
            fused_solve=True, early_converge=early,
        )
        x, P, _, info = esikf.update_iterated(
            x0, P0, measure, aux0, max_iter=4, n_cols=6)
        outs.append((x, P, info))
    (x_f, P_f, i_f), (x_e, P_e, i_e) = outs
    assert int(i_e["iters"]) <= int(i_f["iters"])
    # bounded by the convergence limit (1e-3 per component), not bitwise
    np.testing.assert_allclose(np.asarray(x_e.pos), np.asarray(x_f.pos),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(x_e.rot), np.asarray(x_f.rot),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(P_e), np.asarray(P_f),
                               rtol=0.05, atol=1e-4)


@pytest.mark.parametrize("budget,expect_compact", [
    (1024, True),    # == n: every live set fits -> compact branch runs
    (64, False),     # tiny: live lanes overflow -> full-width fallback
])
def test_solve_compact_update_parity(budget, expect_compact):
    """Valid-lane solve compaction (shapes.solve_compact): dead lanes
    (fit_ok=0 / valid=0) contribute zero to the Gram, so the compacted
    update must match the full-width one bitwise-closely when the live
    set fits the budget, and fall back to the identical full kernel when
    it doesn't."""
    m, scan, valid, x0, P0 = _toy_problem(plane_cache=True)

    outs = []
    for sc in (0, budget):
        measure, aux0 = measurement.make_measure_fn(
            m, scan, valid, single_association=True, plane_cache=True,
            fused_solve=True, solve_compact=sc,
        )
        x, P, _, info = esikf.update_iterated(
            x0, P0, measure, aux0, max_iter=4, n_cols=6)
        outs.append((x, P, info))
    (x_f, P_f, i_f), (x_c, P_c, i_c) = outs
    np.testing.assert_allclose(np.asarray(x_c.pos), np.asarray(x_f.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_c.rot), np.asarray(x_f.rot),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(P_c), np.asarray(P_f),
                               rtol=1e-4, atol=1e-6)
    assert int(i_c["n_eff"]) == int(i_f["n_eff"])


def test_solve_compact_gram_equivalence_direct():
    """Direct check: the compacted buffer produces the same Gram as the
    full soa for any random live pattern that fits the budget."""
    rng = np.random.default_rng(9)
    n, B = 2048, 1800
    soa = np.array(_random_soa(rng, n))  # writable copy
    # production invariant: fit_ok already includes the row-valid mask
    # (search_rows ANDs them) — enforce it on the random buffer, since
    # the kernel weights on the ok channel alone
    soa[pk._OK] = soa[pk._OK] * soa[pk._VAL]
    soa = jnp.asarray(soa)
    params = _params(rng)
    live = np.asarray((soa[pk._OK] > 0) & (soa[pk._VAL] > 0))
    assert live.sum() <= B
    idx = np.flatnonzero(live)
    soa_c = np.zeros((pk.SOA_CH, B), np.float32)
    soa_c[:, : len(idx)] = np.asarray(soa)[:, idx]
    G_full, _ = pk.fused_normal_eqs_reference(soa, params)
    G_c, _ = pk.fused_normal_eqs_reference(jnp.asarray(soa_c), params)
    np.testing.assert_allclose(np.asarray(G_c), np.asarray(G_full),
                               rtol=1e-5, atol=1e-3)
