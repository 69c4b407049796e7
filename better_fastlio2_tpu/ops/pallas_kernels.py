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

__all__ = ["fused_hth", "fused_normal_eqs", "pack_soa", "SOA_CH"]

TILE = 2048

# ---------------------------------------------------------------------------
# fused_normal_eqs: the production per-ESIKF-iteration kernel.
#
# One pass over a per-scan-packed SoA buffer computes, entirely in VMEM:
#   p_world = R p_imu + t                      (laserMapping.cpp:1895)
#   pd2     = n . p_world + d                  (point-to-plane residual)
#   s-gate  = 1 - 0.9 |pd2| / sqrt(|p_body|) > 0.9   (laserMapping.cpp:1930)
#   rows    = [n | (p_imu x R^T n)] . w        (the 6 live Jacobian
#             columns when extrinsic estimation is off,
#             laserMapping.cpp:1966-2002)
#   G       = rows_ext @ rows_ext^T  with rows_ext = [rows; -pd2 w; w]
# so G[:6,:6] = H^T W H, G[:6,6] = H^T W h, G[7,7] = n_valid — the whole
# normal-equations reduction the iterated update consumes
# (esekfom.hpp:1788-1816) without ever materialising the (N, 6) row
# matrix in HBM.  A second scalar output counts rows whose voxel moved
# since association (the lazy-refresh trigger of
# measurement.make_measure_fn).
#
# The SoA layout (SOA_CH x N, channels along sublanes, points along
# lanes) is packed ONCE per association pass; each of the up-to-5 solve
# iterations then reads only this buffer plus 16 scalars — ~1 MB of HBM
# traffic per iteration at n_ds = 16k.
# ---------------------------------------------------------------------------

SOA_CH = 16  # sublane-aligned channel count
# channel indices
_PIX, _PIY, _PIZ = 0, 1, 2  # p_imu (body point in imu frame)
_NX, _NY, _NZ = 3, 4, 5  # plane normal (world)
_D = 6  # plane offset d (n.p + d = 0)
_INVB = 7  # 0.9 / sqrt(max(|p_body|, 1e-8))
_OK = 8  # plane fit ok (0/1)
_AIX, _AIY, _AIZ = 9, 10, 11  # association-time voxel coords (f32-exact)
_VAL = 12  # point valid (0/1)


def pack_soa(p_imu, normal, d, invb, fit_ok, assoc_ijk, valid):
    """Pack the per-scan association results into the (SOA_CH, N) buffer
    fused_normal_eqs streams.  Voxel coords are stored as f32 (exact for
    |ijk| < 2^24 — maps span ~1e3 voxels)."""
    dtype = p_imu.dtype
    z = jnp.zeros_like(d)
    return jnp.stack([
        p_imu[:, 0], p_imu[:, 1], p_imu[:, 2],
        normal[:, 0], normal[:, 1], normal[:, 2],
        d, invb, fit_ok.astype(dtype),
        assoc_ijk[:, 0].astype(dtype), assoc_ijk[:, 1].astype(dtype),
        assoc_ijk[:, 2].astype(dtype),
        valid.astype(dtype), z, z, z,
    ])


def _neq_kernel(par_ref, soa_ref, g_ref, mv_ref, acc_g, acc_mv):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_g[:] = jnp.zeros_like(acc_g)
        acc_mv[0, 0] = 0.0

    R00, R01, R02 = par_ref[0], par_ref[1], par_ref[2]
    R10, R11, R12 = par_ref[3], par_ref[4], par_ref[5]
    R20, R21, R22 = par_ref[6], par_ref[7], par_ref[8]
    tx, ty, tz = par_ref[9], par_ref[10], par_ref[11]
    vs = par_ref[12]

    soa = soa_ref[:]
    pix, piy, piz = soa[_PIX:_PIX + 1], soa[_PIY:_PIY + 1], soa[_PIZ:_PIZ + 1]
    nx, ny, nz = soa[_NX:_NX + 1], soa[_NY:_NY + 1], soa[_NZ:_NZ + 1]
    d = soa[_D:_D + 1]
    invb = soa[_INVB:_INVB + 1]
    ok = soa[_OK:_OK + 1]
    aix, aiy, aiz = soa[_AIX:_AIX + 1], soa[_AIY:_AIY + 1], soa[_AIZ:_AIZ + 1]
    val = soa[_VAL:_VAL + 1]

    pwx = R00 * pix + R01 * piy + R02 * piz + tx
    pwy = R10 * pix + R11 * piy + R12 * piz + ty
    pwz = R20 * pix + R21 * piy + R22 * piz + tz
    pd2 = nx * pwx + ny * pwy + nz * pwz + d

    # robust s-gate: s = 1 - 0.9|pd2|/sqrt(|p|) > 0.9  <=>  |pd2|*invb < 0.1
    w = ok * (jnp.abs(pd2) * invb < 0.1).astype(soa.dtype)

    # C = R^T n
    cx = R00 * nx + R10 * ny + R20 * nz
    cy = R01 * nx + R11 * ny + R21 * nz
    cz = R02 * nx + R12 * ny + R22 * nz
    ax = piy * cz - piz * cy
    ay = piz * cx - pix * cz
    az = pix * cy - piy * cx

    rows = jnp.concatenate(
        [nx, ny, nz, ax, ay, az, -pd2, jnp.ones_like(pd2)], axis=0
    ) * w  # (8, TILE)
    acc_g[:] += jax.lax.dot_general(
        rows, rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # voxel-moved count (lazy-refresh trigger): same floor(p/vs) as
    # voxel_hash._voxel_of, compared against the association-time coords
    mx = jnp.floor(pwx / vs) != aix
    my = jnp.floor(pwy / vs) != aiy
    mz = jnp.floor(pwz / vs) != aiz
    moved = val * (mx | my | mz).astype(soa.dtype)
    acc_mv[0, 0] += jnp.sum(moved)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        g_ref[:] = acc_g[:]
        mv_ref[0, 0] = acc_mv[0, 0]


@partial(jax.jit, static_argnames=("interpret",))
def fused_normal_eqs(
    soa: jax.Array, params: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """(G (8,8), n_moved ()) of a packed scan under the pose in `params`.

    soa: (SOA_CH, N) from pack_soa — any N (columns are zero-padded up to
    a whole tile internally; padded columns contribute exactly zero).
    params: (16,) f32 [R row-major 9 | t 3 | voxel_size
    | 0...].  G[:6,:6] = HtWH, G[:6,6] = HtWh, G[7,7] = n_valid.
    Set interpret=True on CPU.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = soa.shape[1]
    # pad N up to a whole number of tiles instead of hunting for an exact
    # divisor (a large-prime N used to degenerate to tile=1): padded
    # columns carry ok=0/valid=0 and contribute exactly zero to both
    # outputs, so any N works at full tile width.  No pad is ever needed
    # at the usual power-of-two n_ds.
    tile = min(TILE * 4, N)
    pad = (-N) % tile
    if pad:
        soa = jnp.pad(soa, ((0, 0), (0, pad)))
        N += pad
    grid = (N // tile,)
    G, mv = pl.pallas_call(
        _neq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SOA_CH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 8), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(params, soa)
    return G, mv[0, 0]


def fused_normal_eqs_reference(soa, params):
    """Pure-jnp reference for testing fused_normal_eqs."""
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    vs = params[12]
    p_imu = soa[0:3].T
    n = soa[3:6].T
    d = soa[_D]
    invb = soa[_INVB]
    ok = soa[_OK]
    aijk = soa[_AIX:_AIX + 3].T
    val = soa[_VAL]
    pw = p_imu @ R.T + t
    pd2 = jnp.einsum("ni,ni->n", n, pw) + d
    w = ok * (jnp.abs(pd2) * invb < 0.1)
    C = n @ R  # R^T n, batched
    A = jnp.cross(p_imu, C)
    rows = jnp.concatenate(
        [n, A, -pd2[:, None], jnp.ones_like(pd2)[:, None]], axis=1
    ) * w[:, None]
    G = rows.T @ rows
    moved = val * jnp.any(jnp.floor(pw / vs) != aijk, axis=-1)
    return G, jnp.sum(moved)


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
