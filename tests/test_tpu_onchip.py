"""On-chip compiled-kernel parity (VERDICT r2 weak #6 / next #7).

The CPU suite runs every Pallas kernel in interpret mode; this module
asserts the COMPILED kernel on the real TPU backend matches the jnp
reference — including the pad-to-tile fallback branch for awkward N.

Skipped automatically off-TPU (the CI suite forces the cpu backend);
run on the chip with:

    JAX_PLATFORMS= python -m pytest tests/test_tpu_onchip.py -q -p no:cacheprovider --override-ini="addopts=" \
        --deselect tests/conftest.py

or simply `python tests/test_tpu_onchip.py` which self-drives without
the conftest's forced-CPU config.
"""

import numpy as np


def _run_parity():
    import jax
    import jax.numpy as jnp

    from better_fastlio2_tpu.ops import pallas_kernels as pk

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    rng = np.random.default_rng(5)
    out = []
    for N in (16384, 8192, 4096 + 8, 1000, 6151):  # incl. pad-branch Ns
        p_imu = rng.normal(scale=10, size=(N, 3)).astype(np.float32)
        normal = rng.normal(size=(N, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=1, keepdims=True)
        d = rng.normal(size=N).astype(np.float32)
        invb = (0.9 / np.sqrt(np.maximum(
            np.linalg.norm(p_imu, axis=1), 1e-8))).astype(np.float32)
        ok = (rng.random(N) > 0.2).astype(np.float32)
        ijk = rng.integers(-40, 40, (N, 3)).astype(np.int32)
        val = (rng.random(N) > 0.1)
        soa = pk.pack_soa(jnp.asarray(p_imu), jnp.asarray(normal),
                          jnp.asarray(d), jnp.asarray(invb),
                          jnp.asarray(ok), jnp.asarray(ijk),
                          jnp.asarray(val))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        params = jnp.asarray(np.concatenate(
            [R.reshape(-1), rng.normal(size=3), [0.5], np.zeros(3)]
        ).astype(np.float32))
        G_dev, mv_dev = pk.fused_normal_eqs(soa, params)
        G_ref, mv_ref = pk.fused_normal_eqs_reference(soa, params)
        np.testing.assert_allclose(np.asarray(G_dev), np.asarray(G_ref),
                                   rtol=2e-5, atol=2e-3)
        np.testing.assert_allclose(float(mv_dev), float(mv_ref), atol=0.5)
        out.append((N, float(np.abs(np.asarray(G_dev)
                                    - np.asarray(G_ref)).max())))
    return out


def test_compiled_fused_normal_eqs_matches_reference():
    import jax
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("real-TPU-only parity check (run via the bench host)")
    _run_parity()


if __name__ == "__main__":
    # standalone driver-runnable mode (no conftest CPU forcing)
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    res = _run_parity()
    for N, err in res:
        print(f"N={N:6d}: compiled vs jnp max |dG| = {err:.3e}")
    print("compiled-kernel parity OK")
