"""Pallas kernel tests (interpreter mode on CPU) against jnp references."""

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.ops.pallas_kernels import (
    fused_hth,
    fused_hth_reference,
)


def test_fused_hth_matches_reference(rng):
    N = 5000
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 10)
    pimu = pts + jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
    n = rng.normal(size=(N, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.asarray(n)
    C = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pd2 = jnp.asarray(rng.normal(size=N).astype(np.float32) * 0.1)
    sel = jnp.asarray(rng.uniform(size=N) > 0.3)

    HTH, HTh = fused_hth(pts, pimu, n, C, pd2, sel, interpret=True)
    HTH_r, HTh_r = fused_hth_reference(pts, pimu, n, C, pd2, sel)
    np.testing.assert_allclose(np.asarray(HTH), np.asarray(HTH_r),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(HTh), np.asarray(HTh_r),
                               rtol=2e-4, atol=2e-2)


def test_fused_hth_extrinsic_mode(rng):
    N = 2048
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pimu = pts * 1.1
    n = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pd2 = jnp.asarray(rng.normal(size=N).astype(np.float32))
    sel = jnp.ones(N, bool)
    HTH, HTh = fused_hth(pts, pimu, n, C, pd2, sel, extrinsic=True,
                         interpret=True)
    HTH_r, HTh_r = fused_hth_reference(pts, pimu, n, C, pd2, sel,
                                       extrinsic=True)
    np.testing.assert_allclose(np.asarray(HTH), np.asarray(HTH_r),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(HTh), np.asarray(HTh_r),
                               rtol=2e-4, atol=2e-2)
