"""Cost decomposition of the K-shared propagation NCC kernel on the real
TPU (round-5 follow-up to tools/prop_attack.py: grouping bought only
~1.07x, so the scan-visit model underpredicts — this tool finds where the
measured ~2.1-3.3 s/call at the DTU shape actually goes).

A tool-local replica of ops/pallas_ncc._kshared_call (single group,
u8-packed, two-phase, one-view-resident, parity-packed — the DTU
configuration) with ablation switches, timed on a stand-in converged
field (the relief scene's analytic GT surface planes, with the 8
propagation candidates built as neighbor-shifted copies — the same
structure as real sweep-3 fields, no 10-minute solve needed):

  full      — replica of the shipped kernel (sanity vs prop_attack)
  noext     — skip the per-(k,tap) extraction/bilinear/ZNCC block
              (accumulate raw gathered words); isolates the scan loop
  nobounds  — per-tap warp still computed, but min/max bbox reductions
              only at tap 0 (reused for all taps); isolates the 4x8x36
              cross-lane reductions per tile visit
  noscan    — scan trip count forced to 0 (bounds kept live via a
              1e-30 leak into the output); isolates fixed per-(k,tap)
              warp+bounds+extract cost
  f32take   — lane gathers + row-match selects on f32-BITCAST chunks
              instead of int32 (probes whether Mosaic's i32
              take_along_axis lowers worse than f32); includes an exact
              bitwise NaN-pattern equivalence probe first

Usage: python tools/prop_ablate.py [--height 1184 --width 1600 --views 8]
       [--reps 3] [--modes full,noext,nobounds,noscan,f32take]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TILE_H, TILE_W = 8, 128


def build_fields(args):
    """Relief-GT converged stand-in: plane field of the analytic surface,
    8 neighbor-shifted candidate fields (the checkerboard regions' reach:
    near +-1..3 px, far strips 3..3+2i px, ACMMP.cu:804-992)."""
    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.ops import parity
    from acmmp_tpu.utils.synth import textured_relief_scene

    params = PatchMatchParams()
    images, cams, gt = textured_relief_scene(
        n_views=args.views + 1, width=args.width, height=args.height,
        f=140.0 * args.width / 96.0, spread=1.2, converge=True)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    gt_pad = np.pad(gt, ((0, H - gt.shape[0]), (0, W - gt.shape[1])),
                    mode="edge")
    depth = jnp.asarray(gt_pad)
    # surface normal from the depth gradient (world z-up-ish relief):
    # cheap approximation — structure (slopes), not exactness, matters
    dzdx = jnp.gradient(depth, axis=1)
    dzdy = jnp.gradient(depth, axis=0)
    n_world = jnp.stack([-dzdx * 50, -dzdy * 50, -jnp.ones_like(depth)],
                        axis=-1)
    n_world = n_world / jnp.linalg.norm(n_world, axis=-1, keepdims=True)
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n_world)
    planes = geo.plane_from_depth_normal(inputs.ref_cam, x, y, depth, n_cam)

    offs = [(0, -1), (0, -5), (0, 1), (0, 5), (-1, 0), (-5, 0), (1, 0),
            (5, 0)]
    cands = []
    for dx, dy in offs:
        cands.append(jnp.roll(jnp.roll(planes, dy, axis=0), dx, axis=1))
    cand = jnp.stack(cands)                        # [8, H, W, 4]

    pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
    off0 = parity.row_pack_offset(pm)
    cand_pk = parity.pack_rows_c(cand, off0)
    return params, inputs, vg, cand_pk, off0


def ablate_call(mode, ref_img, src_imgs, vg, planes, params, off0, n_views):
    """multiview_zncc_pallas(k_shared) replica with ablation switches."""
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.ops.pallas_ncc import (
        TWO_PHASE_MAX_BYTES, VMEM_RESIDENT_BYTES, _pack_rows_u8, _ref_side,
        _round_up,
    )

    K = planes.shape[0]
    H, W = ref_img.shape
    Hg = planes.shape[1]
    V, Hs, Ws = src_imgs.shape
    R, bw = 4, 8
    Hs_p, Ws_p = _round_up(Hs, 8 * R), _round_up(Ws, TILE_W)
    if (Hs_p, Ws_p) != (Hs, Ws):
        src_imgs = jnp.pad(src_imgs,
                           ((0, 0), (0, Hs_p - Hs), (0, Ws_p - Ws)),
                           mode="edge")
    src_dev = _pack_rows_u8(src_imgs)
    PHASE = TILE_H // 2
    view_bytes = (Hs_p // R) * Ws_p * 4
    two_phase = 2 * view_bytes <= TWO_PHASE_MAX_BYTES
    if two_phase:
        src_dev = jnp.concatenate(
            [src_dev, jnp.concatenate(
                [src_dev[:, PHASE:], src_dev[:, -1:].repeat(PHASE, axis=1)],
                axis=1)], axis=1)
    n_phase = 2 if two_phase else 1
    all_resident = V * n_phase * view_bytes <= VMEM_RESIDENT_BYTES

    taps = ncc_ops.tap_weights_spatial(params)
    T = len(taps)
    w_taps, wr_taps, refsums = _ref_side(ref_img, params)
    from acmmp_tpu.ops import parity

    w_taps = parity.pack_rows(w_taps, off0)
    wr_taps = parity.pack_rows(wr_taps, off0)
    refsums = parity.pack_rows(refsums, off0)

    m = jnp.einsum("ij,khwj->khwi", vg.KrT, planes[..., :3],
                   precision=jax.lax.Precision.HIGHEST)
    inv_w = 1.0 / planes[..., 3]
    mfield = jnp.transpose(
        jnp.concatenate([m, inv_w[..., None]], axis=-1), (0, 3, 1, 2))

    A = vg.A.astype(jnp.float32)
    B = vg.B.astype(jnp.float32)
    swh = jnp.stack([vg.src_width.astype(jnp.float32),
                     vg.src_height.astype(jnp.float32)], axis=-1)
    org = jnp.stack([jnp.float32(0.0), jnp.float32(0.0),
                     jnp.asarray(off0, jnp.float32),
                     jnp.asarray(n_views, jnp.float32)])
    cost_max = params.cost_max
    min_var = params.min_var
    f32take = mode == "f32take"

    def kernel(a_ref, b_ref, swh_ref, org_ref, src_ref, m_ref, w_ref,
               wr_ref, rs_ref, out_ref):
        v = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        @pl.when(v.astype(jnp.float32) < org_ref[3])
        def _compute():
            ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
                  + ti * TILE_H)
            jj = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
                  + tj * TILE_W)
            rr = 2 * ii + (org_ref[2].astype(jnp.int32) + jj) % 2
            yy = rr.astype(jnp.float32) + org_ref[0]
            xx = jj.astype(jnp.float32) + org_ref[1]
            sw = swh_ref[v, 0]
            sh = swh_ref[v, 1]
            a00, a01, a02 = a_ref[v, 0, 0], a_ref[v, 0, 1], a_ref[v, 0, 2]
            a10, a11, a12 = a_ref[v, 1, 0], a_ref[v, 1, 1], a_ref[v, 1, 2]
            a20, a21, a22 = a_ref[v, 2, 0], a_ref[v, 2, 1], a_ref[v, 2, 2]
            b0, b1, b2 = b_ref[v, 0], b_ref[v, 1], b_ref[v, 2]

            px00 = [None] * K
            py00 = [None] * K
            pz00 = [None] * K
            ux = [None] * K
            uy = [None] * K
            uz = [None] * K
            tx = [None] * K
            ty = [None] * K
            tz = [None] * K
            in_b = [None] * K
            for k in range(K):
                m0 = m_ref[k, 0]
                m1 = m_ref[k, 1]
                m2 = m_ref[k, 2]
                iw = m_ref[k, 3]
                m0i = m0 * iw
                m1i = m1 * iw
                mq00 = (m0 * xx + m1 * yy + m2) * iw
                px00[k] = a00 * xx + a01 * yy + a02 - b0 * mq00
                py00[k] = a10 * xx + a11 * yy + a12 - b1 * mq00
                pz00[k] = a20 * xx + a21 * yy + a22 - b2 * mq00
                ux[k] = a00 - b0 * m0i
                uy[k] = a10 - b1 * m0i
                uz[k] = a20 - b2 * m0i
                tx[k] = a01 - b0 * m1i
                ty[k] = a11 - b1 * m1i
                tz[k] = a21 - b2 * m1i
                cx = px00[k] / pz00[k]
                cy = py00[k] / pz00[k]
                in_b[k] = ((cx >= 0.0) & (cx < sw) & (cy >= 0.0)
                           & (cy < sh))

            sum_w = rs_ref[0, 0]
            sum_ref = rs_ref[0, 1]
            sum_ref_ref = rs_ref[0, 2]
            zf = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            sum_src = [zf] * K
            sum_src_src = [zf] * K
            sum_ref_src = [zf] * K

            n_words = Hs_p // R
            last_col = Ws_p // TILE_W - 1
            leak = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            bounds0 = [None]

            for t, (di, dj, _ws) in enumerate(taps):
                fdi = jnp.float32(di)
                fdj = jnp.float32(dj)
                xi = [None] * K
                yi = [None] * K
                fx = [None] * K
                fy = [None] * K
                for k in range(K):
                    px = px00[k] + fdi * ux[k] + fdj * tx[k]
                    py = py00[k] + fdi * uy[k] + fdj * ty[k]
                    pz = pz00[k] + fdi * uz[k] + fdj * tz[k]
                    inv_pz = 1.0 / pz
                    sx = jnp.clip(jnp.nan_to_num(px * inv_pz), 0.0,
                                  Ws_p - 1.0)
                    sy = jnp.clip(jnp.nan_to_num(py * inv_pz), 0.0,
                                  Hs_p - 1.0)
                    xf = jnp.floor(sx)
                    yf = jnp.floor(sy)
                    fx[k] = sx - xf
                    fy[k] = sy - yf
                    xi[k] = xf.astype(jnp.int32)
                    yi[k] = yf.astype(jnp.int32)

                if mode != "nobounds" or t == 0:
                    uy_min = jnp.min(yi[0])
                    uy_max = jnp.max(yi[0])
                    ux_min = jnp.min(xi[0])
                    ux_max = jnp.max(xi[0])
                    for k in range(1, K):
                        uy_min = jnp.minimum(uy_min, jnp.min(yi[k]))
                        uy_max = jnp.maximum(uy_max, jnp.max(yi[k]))
                        ux_min = jnp.minimum(ux_min, jnp.min(xi[k]))
                        ux_max = jnp.maximum(ux_max, jnp.max(xi[k]))
                    bounds0[0] = (uy_min, uy_max, ux_min, ux_max)
                uy_min, uy_max, ux_min, ux_max = bounds0[0]

                w_lo = uy_min // R
                w_hi = jnp.minimum(uy_max + 1, Hs_p - 1) // R
                if two_phase:
                    use_b = (w_lo % TILE_H) >= PHASE
                    off = jnp.where(use_b, PHASE, 0)
                    ph_mem = jnp.where(use_b, n_words, 0)
                else:
                    off = 0
                    ph_mem = 0
                c_lo = (w_lo - off) // TILE_H
                n_rb = (w_hi - off) // TILE_H + 1 - c_lo
                col_lo = ux_min // TILE_W
                col_hi = jnp.minimum((ux_max + 1) // TILE_W, last_col)
                n_cp = (col_hi + 1 - col_lo + 1) // 2
                k0w = [yi[k] // R for k in range(K)]
                k1w = [(yi[k] + 1) // R for k in range(K)]

                def scan_body(i, carry, k0w=k0w, k1w=k1w, xi=xi, c_lo=c_lo,
                              n_cp=n_cp, col_lo=col_lo, col_hi=col_hi,
                              off=off, ph_mem=ph_mem):
                    W00, W01, W10, W11 = (list(c) for c in carry)
                    cw = (c_lo + i // n_cp) * TILE_H
                    r0w = pl.multiple_of(ph_mem + cw, TILE_H)
                    ca = col_lo + 2 * (i % n_cp)
                    has_b = ca < col_hi
                    cb = jnp.minimum(ca + 1, last_col)
                    c0a = ca * TILE_W
                    c0b = cb * TILE_W
                    if all_resident:
                        chA = src_ref[v, pl.ds(r0w, TILE_H),
                                      pl.ds(c0a, TILE_W)]
                        chB = src_ref[v, pl.ds(r0w, TILE_H),
                                      pl.ds(c0b, TILE_W)]
                    else:
                        chA = src_ref[0, pl.ds(r0w, TILE_H),
                                      pl.ds(c0a, TILE_W)]
                        chB = src_ref[0, pl.ds(r0w, TILE_H),
                                      pl.ds(c0b, TILE_W)]
                    if f32take:
                        chA = pltpu.bitcast(chA, jnp.float32)
                        chB = pltpu.bitcast(chB, jnp.float32)
                    xlA = [xi[k] - c0a for k in range(K)]
                    xlB = [xi[k] - c0b for k in range(K)]
                    in0B = [(x >= 0) & (x < TILE_W) & has_b for x in xlB]
                    in1B = [(x + 1 >= 0) & (x + 1 < TILE_W) & has_b
                            for x in xlB]
                    in0 = [((xlA[k] >= 0) & (xlA[k] < TILE_W)) | in0B[k]
                           for k in range(K)]
                    in1 = [((xlA[k] + 1 >= 0) & (xlA[k] + 1 < TILE_W))
                           | in1B[k] for k in range(K)]
                    xc0A = [jnp.clip(x, 0, TILE_W - 1) for x in xlA]
                    xc1A = [jnp.clip(x + 1, 0, TILE_W - 1) for x in xlA]
                    xc0B = [jnp.clip(x, 0, TILE_W - 1) for x in xlB]
                    xc1B = [jnp.clip(x + 1, 0, TILE_W - 1) for x in xlB]
                    k0rel = [k0w[k] - (off + cw) for k in range(K)]
                    k1rel = [k1w[k] - (off + cw) for k in range(K)]
                    for pr in range(TILE_H):
                        rowA = jnp.broadcast_to(chA[pr:pr + 1, :],
                                                (TILE_H, TILE_W))
                        rowB = jnp.broadcast_to(chB[pr:pr + 1, :],
                                                (TILE_H, TILE_W))
                        for k in range(K):
                            g0 = jnp.where(
                                in0B[k],
                                jnp.take_along_axis(rowB, xc0B[k], axis=1),
                                jnp.take_along_axis(rowA, xc0A[k], axis=1))
                            g1 = jnp.where(
                                in1B[k],
                                jnp.take_along_axis(rowB, xc1B[k], axis=1),
                                jnp.take_along_axis(rowA, xc1A[k], axis=1))
                            m0 = k0rel[k] == pr
                            m1 = k1rel[k] == pr
                            W00[k] = jnp.where(m0 & in0[k], g0, W00[k])
                            W01[k] = jnp.where(m1 & in0[k], g0, W01[k])
                            W10[k] = jnp.where(m0 & in1[k], g1, W10[k])
                            W11[k] = jnp.where(m1 & in1[k], g1, W11[k])
                    return (tuple(W00), tuple(W01), tuple(W10), tuple(W11))

                zW = (jnp.zeros((TILE_H, TILE_W), jnp.float32) if f32take
                      else jnp.zeros((TILE_H, TILE_W), jnp.int32))
                zK = (zW,) * K
                trips = (jnp.int32(0) if mode == "noscan"
                         else n_rb * n_cp)
                W00, W01, W10, W11 = jax.lax.fori_loop(
                    0, trips, scan_body, (zK, zK, zK, zK))
                if mode == "noscan":
                    # keep the bounds computation live
                    leak = leak + 1e-30 * (w_lo + w_hi + col_lo
                                           + col_hi).astype(jnp.float32)

                wt = w_ref[0, t]
                wrt = wr_ref[0, t]
                for k in range(K):
                    w00k = (pltpu.bitcast(W00[k], jnp.int32) if f32take
                            else W00[k])
                    w01k = (pltpu.bitcast(W01[k], jnp.int32) if f32take
                            else W01[k])
                    w10k = (pltpu.bitcast(W10[k], jnp.int32) if f32take
                            else W10[k])
                    w11k = (pltpu.bitcast(W11[k], jnp.int32) if f32take
                            else W11[k])
                    if mode == "noext":
                        # raw gathered words, no extraction/bilinear
                        sum_src[k] = sum_src[k] + wt * (
                            w00k + w01k + w10k + w11k).astype(jnp.float32)
                        continue
                    s0 = (yi[k] & (R - 1)) * bw
                    s1 = ((yi[k] + 1) & (R - 1)) * bw
                    e00 = jax.lax.shift_right_logical(w00k, s0)
                    e01 = jax.lax.shift_right_logical(w01k, s1)
                    e10 = jax.lax.shift_right_logical(w10k, s0)
                    e11 = jax.lax.shift_right_logical(w11k, s1)
                    v00 = (e00 & 0xFF).astype(jnp.float32)
                    v01 = (e01 & 0xFF).astype(jnp.float32)
                    v10 = (e10 & 0xFF).astype(jnp.float32)
                    v11 = (e11 & 0xFF).astype(jnp.float32)
                    a0 = 1.0 - fx[k]
                    a1 = fx[k]
                    val = ((1.0 - fy[k]) * (a0 * v00 + a1 * v10)
                           + fy[k] * (a0 * v01 + a1 * v11))
                    sum_src[k] = sum_src[k] + wt * val
                    sum_src_src[k] = sum_src_src[k] + wt * val * val
                    sum_ref_src[k] = sum_ref_src[k] + wrt * val

            inv_sum_w = 1.0 / sum_w
            mean_ref = sum_ref * inv_sum_w
            var_ref = sum_ref_ref * inv_sum_w - mean_ref * mean_ref
            for k in range(K):
                mean_src = sum_src[k] * inv_sum_w
                var_src = sum_src_src[k] * inv_sum_w - mean_src * mean_src
                covar = sum_ref_src[k] * inv_sum_w - mean_ref * mean_src
                denom = jnp.sqrt(jnp.maximum(var_ref * var_src, 1e-30))
                ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
                degenerate = (var_ref < min_var) | (var_src < min_var)
                cost = jnp.where(degenerate, cost_max, ncc)
                out_ref[k, 0] = jnp.where(in_b[k], cost, cost_max) + leak

        @pl.when(v.astype(jnp.float32) >= org_ref[3])
        def _skip():
            out_ref[:, 0] = jnp.full((K, TILE_H, TILE_W), cost_max,
                                     jnp.float32)

    grid = (V, Hg // TILE_H, W // TILE_W)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            (pl.BlockSpec((V, n_phase * (Hs_p // R), Ws_p),
                          lambda v, i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
             if all_resident else
             pl.BlockSpec((1, n_phase * (Hs_p // R), Ws_p),
                          lambda v, i, j: (v, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((K, 4, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, TILE_H, TILE_W),
                               lambda v, i, j: (0, v, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, V, Hg, W), jnp.float32),
    )(A, B, swh, org, src_dev, mfield, w_taps[None], wr_taps[None],
      refsums[None])
    return out


def nan_take_probe():
    """f32 take_along_axis + where must be BIT-EXACT on arbitrary int bit
    patterns (incl. sNaN/qNaN/denormals) or the f32take variant is dead."""
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**32, (8, 128), dtype=np.uint32)
    # adversarial: sNaN (exp all ones, MSB of mantissa 0), qNaN, inf, -0
    words[0, :16] = 0x7F800001            # sNaN
    words[0, 16:32] = 0x7FC00000          # qNaN
    words[0, 32:48] = 0x7F800000          # +inf
    words[0, 48:64] = 0x80000000          # -0
    words[1, :64] = 0xFF800001            # -sNaN
    wi = jax.lax.bitcast_convert_type(jnp.asarray(words), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    sel = jnp.asarray(rng.integers(0, 2, (8, 128)) == 1)

    def k_i32(w_ref, i_ref, s_ref, o_ref):
        g = jnp.take_along_axis(w_ref[...], i_ref[...], axis=1)
        o_ref[...] = jnp.where(s_ref[...], g, w_ref[...])

    def k_f32(w_ref, i_ref, s_ref, o_ref):
        wf = pltpu.bitcast(w_ref[...], jnp.float32)
        g = jnp.take_along_axis(wf, i_ref[...], axis=1)
        o_ref[...] = pltpu.bitcast(jnp.where(s_ref[...], g, wf), jnp.int32)

    def run(k):
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(wi, idx, sel)

    a = np.asarray(run(k_i32))
    b = np.asarray(run(k_f32))
    ok = bool((a == b).all())
    print(f"nan_take_probe: f32 take/select bit-exact = {ok}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1184)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="full,noext,nobounds,noscan,f32take")
    args = ap.parse_args()

    t0 = time.monotonic()
    params, inputs, vg, cand_pk, off0 = build_fields(args)
    nv = jnp.sum(inputs.view_mask)
    print(f"# fields built {time.monotonic() - t0:.1f}s", flush=True)

    probe_ok = nan_take_probe()

    results = {}
    for mode in [m for m in args.modes.split(",") if m]:
        if mode == "f32take" and not probe_ok:
            print("f32take: SKIPPED (probe failed)", flush=True)
            continue

        @jax.jit
        def run(p, off0, mode=mode):
            return jnp.sum(ablate_call(mode, inputs.ref_img,
                                       inputs.src_imgs, vg, p, params,
                                       off0, nv))

        v0 = float(run(cand_pk, off0))
        t1 = time.perf_counter()
        for _ in range(args.reps):
            float(run(cand_pk, off0))
        dt = (time.perf_counter() - t1) / args.reps * 1e3
        results[mode] = round(dt, 1)
        print(f"{mode:9s}: {dt:9.1f} ms/call   [sum={v0:.3e}]", flush=True)

    print(json.dumps({"tool": "prop_ablate",
                      "shape": f"{args.width}x{args.height}",
                      "views": args.views, "times_ms": results,
                      "f32_take_bit_exact": probe_ok}), flush=True)


if __name__ == "__main__":
    main()
