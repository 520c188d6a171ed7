"""Pallas geometric-consistency cost — companion to ops/pallas_ncc.py.

Reference: ComputeGeomConsistencyCost (src/ACMMP.cu:518-543): forward-project
the ref plane depth into each source view, read the source depth map,
back-project, and clamp the reprojection distance. The depth-map read is the
same random-access gather that makes XLA slow; this kernel reuses the
row-scan gather (nearest sampling — the reference reads depth textures at
truncated integer coordinates, ACMMP.cu:528).

The two projective chains are folded into per-view 3x4 matrices computed
once in jnp:

    src_h = M  @ [x*d, y*d, d, 1]     (ref pixel + depth -> src pixel)
    ref_h = Mb @ [u*sd, v*sd, sd, 1]  (src pixel + src depth -> ref pixel)

with M = [Ks Rs Rr^T Kr^{-1} | Ks (ts - Rs Rr^T tr)] and Mb its mirror.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo

TILE_H = 8
TILE_W = 128


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _chain_matrix(from_cam: geo.Camera, to_cam: geo.Camera) -> jax.Array:
    """[3,4] M with to_h = M @ [x*d, y*d, d, 1] for pixel (x,y) at depth d
    in `from_cam`."""
    e = lambda *a: jnp.einsum(*a, precision=jax.lax.Precision.HIGHEST)
    Kf_inv = jnp.linalg.inv(from_cam.K)
    R_rel = e("ij,kj->ik", to_cam.R, from_cam.R)        # Rt Rf^T
    A = e("ij,jk,kl->il", to_cam.K, R_rel, Kf_inv)      # [3,3]
    t_rel = to_cam.t - e("ij,j->i", R_rel, from_cam.t)
    b = e("ij,j->i", to_cam.K, t_rel)                   # [3]
    return jnp.concatenate([A, b[:, None]], axis=1)     # [3,4]


def geom_consistency_cost_pallas(
    ref_cam: geo.Camera,
    src_cams: geo.Camera,     # stacked [V]
    src_depths: jax.Array,    # [V, Hs, Ws] depth maps (0 = invalid)
    planes: jax.Array,        # [K, H, W, 4]
    params: PatchMatchParams,
    origin=None,              # (y0, x0) offset of the planes tile
    row_pack_off=None,        # parity row packing (ops/parity.py)
) -> jax.Array:
    """Returns [K, H, W, V] clamped reprojection errors (H is the packed
    row count when `row_pack_off` is given)."""
    assert planes.ndim == 4
    K = planes.shape[0]
    H, W = planes.shape[1], planes.shape[2]
    V, Hs, Ws = src_depths.shape
    row_packed = row_pack_off is not None
    Hs_p, Ws_p = _round_up(Hs, TILE_H), _round_up(Ws, TILE_W)
    if (Hs_p, Ws_p) != (Hs, Ws):
        src_depths = jnp.pad(
            src_depths, ((0, 0), (0, Hs_p - Hs), (0, Ws_p - Ws)))

    M = jax.vmap(lambda sc: _chain_matrix(ref_cam, sc))(src_cams)   # [V,3,4]
    Mb = jax.vmap(lambda sc: _chain_matrix(sc, ref_cam))(src_cams)  # [V,3,4]
    swh = jnp.stack([src_cams.width.astype(jnp.float32),
                     src_cams.height.astype(jnp.float32)], axis=-1)
    # ref-camera intrinsics for plane -> depth, plus the tile origin
    Kr = ref_cam.K
    if origin is None:
        oy = jnp.float32(0.0)
        ox = jnp.float32(0.0)
    else:
        oy = jnp.asarray(origin[0], jnp.float32)
        ox = jnp.asarray(origin[1], jnp.float32)
    off = (jnp.asarray(row_pack_off, jnp.float32) if row_packed
           else jnp.float32(0.0))
    kparams = jnp.stack([Kr[0, 0], Kr[1, 1], Kr[0, 2], Kr[1, 2], oy, ox, off])

    planes_t = jnp.transpose(planes, (0, 3, 1, 2))      # [K,4,H,W]
    assert H % TILE_H == 0 and W % TILE_W == 0, (
        f"grid must be ({TILE_H},{TILE_W})-aligned, got {(H, W)}")
    grid = (K, V, H // TILE_H, W // TILE_W)
    max_cost = params.geom_cost_max

    def kernel(m_ref, mb_ref, swh_ref, kp_ref, pl_ref, sd_ref, out_ref):
        v = pl.program_id(1)
        ti = pl.program_id(2)
        tj = pl.program_id(3)
        ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
              + ti * TILE_H)
        jj = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
              + tj * TILE_W)
        if row_packed:
            rr = 2 * ii + (kp_ref[6].astype(jnp.int32) + jj) % 2
        else:
            rr = ii
        yy = rr.astype(jnp.float32) + kp_ref[4]
        xx = jj.astype(jnp.float32) + kp_ref[5]

        fx, fy, cx, cy = kp_ref[0], kp_ref[1], kp_ref[2], kp_ref[3]
        nx = pl_ref[0, 0]
        ny = pl_ref[0, 1]
        nz = pl_ref[0, 2]
        pw = pl_ref[0, 3]
        denom = (xx - cx) * nx + (fx / fy) * (yy - cy) * ny + fx * nz
        d = -pw * fx / denom

        m = [[m_ref[v, i, j] for j in range(4)] for i in range(3)]
        xd = xx * d
        yd = yy * d
        h0 = m[0][0] * xd + m[0][1] * yd + m[0][2] * d + m[0][3]
        h1 = m[1][0] * xd + m[1][1] * yd + m[1][2] * d + m[1][3]
        h2 = m[2][0] * xd + m[2][1] * yd + m[2][2] * d + m[2][3]
        inv_h2 = 1.0 / h2
        u = h0 * inv_h2
        w_ = h1 * inv_h2

        sw = swh_ref[v, 0]
        sh = swh_ref[v, 1]
        # reference samples depth textures at truncated integer coords
        # (ACMMP.cu:528), clamped to the true extent
        ui = jnp.clip(jnp.nan_to_num(u), 0.0, sw - 1.0).astype(jnp.int32)
        wi = jnp.clip(jnp.nan_to_num(w_), 0.0, sh - 1.0).astype(jnp.int32)

        # chunked scan (8 rows/iteration): Mosaic loop overhead dominates
        # single-row bodies
        rb_lo = jnp.min(wi) // TILE_H
        n_rb = jnp.max(wi) // TILE_H + 1 - rb_lo
        col_lo = jnp.min(ui) // TILE_W
        n_cols = jnp.max(ui) // TILE_W + 1 - col_lo

        def scan_body(i, sd):
            r0 = (rb_lo + i // n_cols) * TILE_H
            c0 = (col_lo + i % n_cols) * TILE_W
            chunk = sd_ref[0, pl.ds(r0, TILE_H), pl.ds(c0, TILE_W)]
            xl = ui - c0
            inx = (xl >= 0) & (xl < TILE_W)
            xc = jnp.clip(xl, 0, TILE_W - 1)
            for r in range(TILE_H):
                rowv = jnp.broadcast_to(chunk[r:r + 1, :], (TILE_H, TILE_W))
                g = jnp.take_along_axis(rowv, xc, axis=1)
                sd = jnp.where((wi == r0 + r) & inx, g, sd)
            return sd

        sd = jax.lax.fori_loop(
            0, n_rb * n_cols, scan_body,
            jnp.zeros((TILE_H, TILE_W), jnp.float32))

        # back-project via Mb with the sampled coords (reference uses the
        # float projection coords, ACMMP.cu:530-534)
        mb = [[mb_ref[v, i, j] for j in range(4)] for i in range(3)]
        usd = u * sd
        wsd = w_ * sd
        b0 = mb[0][0] * usd + mb[0][1] * wsd + mb[0][2] * sd + mb[0][3]
        b1 = mb[1][0] * usd + mb[1][1] * wsd + mb[1][2] * sd + mb[1][3]
        b2 = mb[2][0] * usd + mb[2][1] * wsd + mb[2][2] * sd + mb[2][3]
        inv_b2 = 1.0 / b2
        bu = b0 * inv_b2
        bv = b1 * inv_b2
        err = jnp.sqrt((xx - bu) ** 2 + (yy - bv) ** 2)
        err = jnp.minimum(jnp.nan_to_num(err, nan=max_cost), max_cost)
        out_ref[0, 0] = jnp.where(sd <= 0.0, max_cost, err)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # M [V,3,4]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # Mb [V,3,4]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # swh [V,2]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kparams [4]
            pl.BlockSpec((1, 4, TILE_H, TILE_W),
                         lambda k, v, i, j: (k, 0, i, j),
                         memory_space=pltpu.VMEM),   # planes tile
            # one view's depth map resident at a time (VMEM at full-res)
            pl.BlockSpec((1, Hs_p, Ws_p), lambda k, v, i, j: (v, 0, 0),
                         memory_space=pltpu.VMEM),   # src depth view block
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda k, v, i, j: (k, v, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, V, H, W), jnp.float32),
    )(M, Mb, swh, kparams, planes_t, src_depths)

    return jnp.transpose(out, (0, 2, 3, 1))
