"""Fused warped bilateral-ZNCC Pallas kernel — the hot op, TPU-native.

Replaces the XLA-gather formulation of `ops.ncc.multiview_zncc` (reference
kernel: ComputeBilateralNCC, src/ACMMP.cu:360-432). The per-pixel plane
hypotheses make the source-image reads random-access; XLA's TPU gather
runs at ~10-20 ns/element, which leaves the solver gather-bound. This
kernel keeps the source views resident in VMEM and performs the bilinear
gathers itself: for each output tile and each of the 36 patch taps, it
scans only the rows inside that tap's dynamic coordinate bounding box
(tight for the coherent hypothesis fields PatchMatch spends most of its
sweep on; wide only for the random exploration candidates), selecting
lanes with `take_along_axis` and rows with compare-accumulate.

Packed-row source layout (the round-2 speedup): Mosaic's lane gather
(`take_along_axis`, axis=1) moves 32-bit words, so the source view is
stored with R rows packed per word — R=4 uint8 rows (images are 8-bit,
exactly the reference's uint8 CUDA textures) or R=2 bfloat16 rows (exact
for 8-bit values, used when callers pass un-quantized floats). One gather
then covers R source rows; the two bilinear rows are extracted with
per-lane dynamic shifts. This cuts the dominant gather-op count by R and
the chunk-scan trip count by ~R for wide (random) fields.

Division of labor:
  * jnp (outside): 36 edge-clamped ref-tap shifts, bilateral weights
    (static shifts + exp — XLA fuses these), ref-side ZNCC sums, the
    per-hypothesis homography fields (m = Kr^{-T} n, 1/w), and the
    packed-row source encoding.
  * Pallas (inside): per (hypothesis, view, tile): 36 warp coordinate
    fields via a hoisted rank-1 form (per-tile base + di/dj direction
    vectors), per-tap bbox row scans fused with the weighted src-side
    accumulations, final ZNCC assembly.

Semantics match ops.ncc.multiview_zncc up to float reassociation: same
clamps, same degenerate-variance guard, same center bounds test (edge
padding makes clamp-to-padded-extent equal to clamp-to-true-extent).
With the u8 layout the sampled source values are rint(clip(img, 0, 255))
— a no-op for inputs quantized by engine.inputs.build_solver_inputs
(reference parity: ACMMP's textures are uint8, src/acmmp_definitions.cpp).

Views beyond `n_views` (shape-padded problem slots) are skipped: their
cost tiles are written as cost_max without evaluating the patch loop
(the grid still visits them, but each visit is one vector store).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.ops import ncc as ncc_ops

TILE_H = 8
TILE_W = 128
VMEM_RESIDENT_BYTES = 6 * 1024 * 1024
# two-phase row layout is dropped above this per-view block size (VMEM is
# ~16 MB/core and the one-view-resident path double-buffers the block)
TWO_PHASE_MAX_BYTES = 6 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _ref_side(ref_img: jax.Array, params: PatchMatchParams):
    """Per-tap ref values & bilateral weights and the ref-side ZNCC sums
    (pure jnp; static shifts, fused by XLA)."""
    taps = ncc_ops.tap_weights_spatial(params)
    inv_2sc2 = 1.0 / (2.0 * params.sigma_color ** 2)
    w_list, wr_list = [], []
    sum_w = 0.0
    sum_ref = 0.0
    sum_ref_ref = 0.0
    for di, dj, w_spatial in taps:
        ref_pix = ncc_ops._shift_edge(ref_img, dj, di)
        w = w_spatial * jnp.exp(-jnp.abs(ref_pix - ref_img) * inv_2sc2)
        w_list.append(w)
        wr_list.append(w * ref_pix)
        sum_w = sum_w + w
        sum_ref = sum_ref + w * ref_pix
        sum_ref_ref = sum_ref_ref + w * ref_pix * ref_pix
    w_taps = jnp.stack(w_list)        # [T, H, W]
    wr_taps = jnp.stack(wr_list)      # [T, H, W]
    refsums = jnp.stack([sum_w, sum_ref, sum_ref_ref])  # [3, H, W]
    return w_taps, wr_taps, refsums


def _pack_rows_u8(src: jax.Array) -> jax.Array:
    """[V, H, W] float (u8-valued) -> [V, H//4, W] int32, 4 rows/word
    (row 4r+k in byte k)."""
    q = jnp.clip(jnp.round(src), 0.0, 255.0).astype(jnp.uint32)
    w = (q[:, 0::4] | (q[:, 1::4] << 8) | (q[:, 2::4] << 16)
         | (q[:, 3::4] << 24))
    return jax.lax.bitcast_convert_type(w, jnp.int32)


def _pack_rows_bf16(src: jax.Array) -> jax.Array:
    """[V, H, W] float -> [V, H//2, W] int32, 2 bf16 rows/word
    (row 2r in the low half-word)."""
    u = jax.lax.bitcast_convert_type(
        src.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    w = u[:, 0::2] | (u[:, 1::2] << 16)
    return jax.lax.bitcast_convert_type(w, jnp.int32)


def multiview_zncc_pallas(
    ref_img: jax.Array,       # [H, W] edge-padded, H%8==0, W%128==0
    src_imgs: jax.Array,      # [V, Hs, Ws] edge-padded
    vg: ncc_ops.ViewGeometry,
    planes: jax.Array,        # [K, H, W, 4] camera-frame plane hypotheses
    params: PatchMatchParams,
    force_bf16: bool = False,  # testing hook for the bf16 packed layout
    force_two_phase=None,      # smoke-test hook: override the VMEM gate on
                               # the two-phase row layout (None = auto)
    force_all_resident=None,   # smoke-test hook: override the all-views-
                               # resident VMEM gate (None = auto)
    origin=None,               # (y0, x0) scalar offset of the ref tile
    row_pack_off=None,         # parity row packing (ops/parity.py): planes
                               # are [K, H//2, W, 4] and packed (i, j) maps
                               # to local row 2i + (row_pack_off + j) % 2
    n_views=None,              # dynamic true view count (padded slots are
                               # skipped and written as cost_max)
    k_shared: bool = False,    # evaluate all K hypotheses per (view, tile)
                               # visit, sharing the gathered source chunks
                               # (union scan window) — for MUTUALLY COHERENT
                               # hypothesis stacks (checkerboard propagation
                               # candidates are neighbor pixels' planes, so
                               # their warp windows overlap almost entirely);
                               # a random stack would widen the union to the
                               # whole image and every k pays the widened
                               # scan, so keep it off for exploration fields
    k_groups=None,             # k_shared only: static partition of the K
                               # hypotheses into scan groups, e.g.
                               # ((0,2,4,6),(1,3,5,7)). Each group scans
                               # the union of ITS members' windows, so a
                               # group of tight-window candidates stops
                               # paying for a wide-window sibling (the far
                               # checkerboard strips reach 23 px,
                               # src/ACMMP.cu:819-827 — on curved surfaces
                               # their planes deviate ~(reach)^2 more than
                               # the near candidates'). None = one group
                               # (identical output either way; grouping
                               # only changes scan-visit scheduling)
) -> jax.Array:
    """Per-view bilateral ZNCC costs, [K, H, W, V] (or [K, H//2, W, V] when
    `row_pack_off` is given)."""
    assert planes.ndim == 4, "pallas path expects a leading hypothesis axis"
    K = planes.shape[0]
    H, W = ref_img.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (
        f"ref grid must be ({TILE_H},{TILE_W})-aligned, got {ref_img.shape}")
    row_packed = row_pack_off is not None
    Hg = planes.shape[1]           # output grid rows (H or H//2)
    if row_packed:
        assert Hg * 2 == H and Hg % TILE_H == 0, (H, planes.shape)
    V, Hs, Ws = src_imgs.shape

    # --- source representation (static per shape/flags) ---
    # u8x4: 4 uint8 rows per 32-bit word — the production layout; exact for
    #   u8-valued images (build_solver_inputs quantizes; the reference's
    #   CUDA textures are uint8 so this is the reference's own precision).
    # bf16x2: 2 bfloat16 rows per word — for float-valued sources (tests).
    # One lane gather covers R rows; VMEM cost is 4/R bytes per pixel.
    src_u8 = params.ncc_src_u8 and not force_bf16
    R = 4 if src_u8 else 2
    bw = 32 // R                   # bits per packed row
    Hs_p, Ws_p = _round_up(Hs, 8 * R), _round_up(Ws, TILE_W)
    if (Hs_p, Ws_p) != (Hs, Ws):
        src_imgs = jnp.pad(src_imgs, ((0, 0), (0, Hs_p - Hs), (0, Ws_p - Ws)),
                           mode="edge")
    src_dev = (_pack_rows_u8(src_imgs) if src_u8
               else _pack_rows_bf16(src_imgs))     # [V, Hs_p//R, Ws_p] i32
    # Two phase-shifted copies, concatenated on the word-row axis: copy 1
    # is copy 0 advanced by PHASE=4 word-rows (tail padded with edge words
    # — never matched: their real rows are >= Hs_p, so the in-word row
    # weights zero them). Mosaic requires 8-aligned sublane slices, so
    # scan chunks are 8-word-aligned *within a copy*; picking the copy
    # whose alignment straddles the tap's span least makes the coherent
    # case (~5-6 word-row span) fit ONE chunk where a single copy needs
    # two half the time. Costs 2x source VMEM (u8 packing already saved
    # 4x), so it is gated: a view block must stay well under VMEM
    # (~16 MB/core) with double-buffering.
    PHASE = TILE_H // 2
    view_bytes = (Hs_p // R) * Ws_p * 4
    two_phase = 2 * view_bytes <= TWO_PHASE_MAX_BYTES
    if force_two_phase is not None:
        two_phase = bool(force_two_phase)
    if two_phase:
        src_dev = jnp.concatenate(
            [src_dev, jnp.concatenate(
                [src_dev[:, PHASE:], src_dev[:, -1:].repeat(PHASE, axis=1)],
                axis=1)], axis=1)                  # [V, 2*n_words, Ws_p]
    n_phase = 2 if two_phase else 1
    all_resident = V * n_phase * view_bytes <= VMEM_RESIDENT_BYTES
    if force_all_resident is not None:
        all_resident = bool(force_all_resident)

    taps = ncc_ops.tap_weights_spatial(params)
    T = len(taps)
    w_taps, wr_taps, refsums = _ref_side(ref_img, params)
    if row_packed:
        from acmmp_tpu.ops import parity

        w_taps = parity.pack_rows(w_taps, row_pack_off)
        wr_taps = parity.pack_rows(wr_taps, row_pack_off)
        refsums = parity.pack_rows(refsums, row_pack_off)

    m = jnp.einsum("ij,khwj->khwi", vg.KrT, planes[..., :3],
                   precision=jax.lax.Precision.HIGHEST)
    inv_w = 1.0 / planes[..., 3]
    mfield = jnp.concatenate([m, inv_w[..., None]], axis=-1)  # [K,H,W,4]
    mfield = jnp.transpose(mfield, (0, 3, 1, 2))              # [K,4,H,W]

    A = vg.A.astype(jnp.float32)            # [V, 3, 3]
    B = vg.B.astype(jnp.float32)            # [V, 3]
    swh = jnp.stack([vg.src_width.astype(jnp.float32),
                     vg.src_height.astype(jnp.float32)], axis=-1)  # [V, 2]
    if origin is None:
        oy = jnp.float32(0.0)
        ox = jnp.float32(0.0)
    else:
        oy = jnp.asarray(origin[0], jnp.float32)
        ox = jnp.asarray(origin[1], jnp.float32)
    off = (jnp.asarray(row_pack_off, jnp.float32) if row_packed
           else jnp.float32(0.0))
    nv = (jnp.asarray(n_views, jnp.float32) if n_views is not None
          else jnp.float32(V))
    org = jnp.stack([oy, ox, off, nv])

    cost_max = params.cost_max
    min_var = params.min_var

    if k_shared:
        if k_groups is None:
            k_groups = (tuple(range(K)),)
        else:
            k_groups = tuple(tuple(g) for g in k_groups)
            assert sorted(k for g in k_groups for k in g) == list(range(K)), (
                f"k_groups {k_groups} must partition range({K})")
        return _kshared_call(
            A, B, swh, org, src_dev, mfield, w_taps, wr_taps, refsums,
            taps=taps, K=K, V=V, Hg=Hg, W=W, Hs_p=Hs_p, Ws_p=Ws_p, R=R,
            bw=bw, src_u8=src_u8, two_phase=two_phase, n_phase=n_phase,
            all_resident=all_resident, row_packed=row_packed,
            cost_max=cost_max, min_var=min_var, PHASE=PHASE,
            k_groups=k_groups)

    grid = (K, V, Hg // TILE_H, W // TILE_W)

    def kernel(a_ref, b_ref, swh_ref, org_ref, src_ref, m_ref, w_ref, wr_ref,
               rs_ref, out_ref):
        v = pl.program_id(1)
        ti = pl.program_id(2)
        tj = pl.program_id(3)

        @pl.when(v.astype(jnp.float32) >= org_ref[3])
        def _skip():
            out_ref[0, 0] = jnp.full((TILE_H, TILE_W), cost_max, jnp.float32)

        @pl.when(v.astype(jnp.float32) < org_ref[3])
        def _compute():
            ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
                  + ti * TILE_H)
            jj = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
                  + tj * TILE_W)
            if row_packed:
                # parity row packing: packed row i of column j holds the
                # pixel at local row 2i + (off0 + j) % 2
                rr = 2 * ii + (org_ref[2].astype(jnp.int32) + jj) % 2
            else:
                rr = ii
            yy = rr.astype(jnp.float32) + org_ref[0]
            xx = jj.astype(jnp.float32) + org_ref[1]

            sw = swh_ref[v, 0]
            sh = swh_ref[v, 1]
            a00, a01, a02 = a_ref[v, 0, 0], a_ref[v, 0, 1], a_ref[v, 0, 2]
            a10, a11, a12 = a_ref[v, 1, 0], a_ref[v, 1, 1], a_ref[v, 1, 2]
            a20, a21, a22 = a_ref[v, 2, 0], a_ref[v, 2, 1], a_ref[v, 2, 2]
            b0, b1, b2 = b_ref[v, 0], b_ref[v, 1], b_ref[v, 2]
            m0 = m_ref[0, 0]
            m1 = m_ref[0, 1]
            m2 = m_ref[0, 2]
            iw = m_ref[0, 3]

            # hoisted rank-1 warp: the warped point of tap (di, dj) is
            #   p(di, dj) = p00 + di * u + dj * t   (per component),
            # with p00 the center warp and u/t per-tile direction fields —
            # 6 fma per tap instead of re-deriving the homography.
            m0i = m0 * iw
            m1i = m1 * iw
            mq00 = (m0 * xx + m1 * yy + m2) * iw
            px00 = a00 * xx + a01 * yy + a02 - b0 * mq00
            py00 = a10 * xx + a11 * yy + a12 - b1 * mq00
            pz00 = a20 * xx + a21 * yy + a22 - b2 * mq00
            ux = a00 - b0 * m0i
            uy = a10 - b1 * m0i
            uz = a20 - b2 * m0i
            tx = a01 - b0 * m1i
            ty = a11 - b1 * m1i
            tz = a21 - b2 * m1i

            # center warp + in-bounds test (true extents)
            cx = px00 / pz00
            cy = py00 / pz00
            in_bounds = (cx >= 0.0) & (cx < sw) & (cy >= 0.0) & (cy < sh)

            sum_w = rs_ref[0, 0]
            sum_ref = rs_ref[0, 1]
            sum_ref_ref = rs_ref[0, 2]
            sum_src = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            sum_src_src = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            sum_ref_src = jnp.zeros((TILE_H, TILE_W), jnp.float32)

            for t, (di, dj, _ws) in enumerate(taps):
                fdi = jnp.float32(di)
                fdj = jnp.float32(dj)
                px = px00 + fdi * ux + fdj * tx
                py = py00 + fdi * uy + fdj * ty
                pz = pz00 + fdi * uz + fdj * tz
                inv_pz = 1.0 / pz
                sx = jnp.clip(jnp.nan_to_num(px * inv_pz), 0.0, Ws_p - 1.0)
                sy = jnp.clip(jnp.nan_to_num(py * inv_pz), 0.0, Hs_p - 1.0)
                xf = jnp.floor(sx)
                yf = jnp.floor(sy)
                fx = sx - xf
                fy = sy - yf
                xi = xf.astype(jnp.int32)
                yi = yf.astype(jnp.int32)
                yi_min = jnp.min(yi)
                yi_max = jnp.max(yi)

                # dynamic scan bounds for this tap, in packed-word chunks
                # of (TILE_H words = 8*R real rows, TILE_W lanes). Chunked
                # scanning (8 words per loop iteration, unrolled select)
                # beats per-row loops: Mosaic's while-loop overhead
                # dominates small bodies. Chunks are 8-word-aligned within
                # the phase copy whose alignment wastes least: phase
                # off=PHASE is legal only when w_lo >= PHASE, which the
                # (w_lo % 8) >= PHASE selector guarantees, and it always
                # leaves the start offset-in-chunk < PHASE — so a coherent
                # tap span (<= 4 word-rows + straddle) fits one chunk.
                n_words = Hs_p // R          # static, multiple of TILE_H
                # the pl.multiple_of(ph_mem + cw, TILE_H) promise below is
                # unchecked by the compiler; it holds only while n_words is
                # a TILE_H multiple (guaranteed by _round_up(Hs, 8*R)).
                # Fail loudly at trace time if padding/packing ever changes.
                assert n_words % TILE_H == 0, (
                    f"packed word-row count {n_words} must be a multiple of "
                    f"{TILE_H}: the two-phase pl.multiple_of promise would "
                    "be violated (silent miscompile on TPU)")
                w_lo = yi_min // R
                w_hi = jnp.minimum(yi_max + 1, Hs_p - 1) // R
                if two_phase:
                    use_b = (w_lo % TILE_H) >= PHASE
                    off = jnp.where(use_b, PHASE, 0)
                    ph_mem = jnp.where(use_b, n_words, 0)
                else:
                    off = 0
                    ph_mem = 0
                c_lo = (w_lo - off) // TILE_H
                n_rb = (w_hi - off) // TILE_H + 1 - c_lo
                col_lo = jnp.min(xi) // TILE_W
                # xi+1 can spill into the next column chunk; clamp to the
                # last real chunk (the spilled corner has fx == 0 there)
                col_hi = jnp.minimum((jnp.max(xi) + 1) // TILE_W,
                                     Ws_p // TILE_W - 1)
                n_cols = col_hi + 1 - col_lo

                one_m_fy = 1.0 - fy

                # column chunks are visited in PAIRS: the gathered words
                # from the two chunks are merged per lane (each lane's x
                # lives in exactly one chunk), so the coherent x-span
                # (~130 lanes -> 2 chunks) costs one pass per word-row.
                n_cp = (n_cols + 1) // 2
                last_col = Ws_p // TILE_W - 1

                # the words holding bilinear rows yi and yi+1: the scan
                # SELECTS raw 32-bit words with cheap compare-selects and
                # the ~26-op byte-extraction + bilinear block runs ONCE per
                # tap after the loop, not once per word-row visit. Each
                # (word, column) is found in exactly one (chunk, pair)
                # visit, so plain masked overwrites accumulate correctly
                # across visits; unmatched accumulators stay 0, whose
                # extracted byte is 0 and whose bilinear weight is 0 at
                # every lane that could leave them unmatched (clamped
                # col_hi spill has fx == 0; the clipped bottom edge has
                # fy == 0).
                k0w = yi // R                        # word row of yi
                k1w = (yi + 1) // R                  # word row of yi+1

                def scan_body(i, carry):
                    W00, W01, W10, W11 = carry
                    cw = (c_lo + i // n_cp) * TILE_H    # word base, in-copy
                    # ph_mem is a where-select between 0 and n_words (both
                    # multiples of TILE_H) — Mosaic cannot prove alignment
                    # of the sum statically, so assert it explicitly or the
                    # TPU compile fails ("cannot statically prove that
                    # index in dimension 1 is a multiple of 8").
                    r0w = pl.multiple_of(ph_mem + cw, TILE_H)
                    ca = col_lo + 2 * (i % n_cp)
                    has_b = ca < col_hi                 # 2nd member exists
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
                    xlA = xi - c0a
                    xlB = xi - c0b
                    xl1A = xlA + 1
                    xl1B = xlB + 1
                    in0B = (xlB >= 0) & (xlB < TILE_W) & has_b
                    in1B = (xl1B >= 0) & (xl1B < TILE_W) & has_b
                    # columns x0/x1 can straddle a pair boundary — each is
                    # picked up by the pair that holds it
                    in0 = ((xlA >= 0) & (xlA < TILE_W)) | in0B
                    in1 = ((xl1A >= 0) & (xl1A < TILE_W)) | in1B
                    xc0A = jnp.clip(xlA, 0, TILE_W - 1)
                    xc1A = jnp.clip(xl1A, 0, TILE_W - 1)
                    xc0B = jnp.clip(xlB, 0, TILE_W - 1)
                    xc1B = jnp.clip(xl1B, 0, TILE_W - 1)
                    k0rel = k0w - (off + cw)
                    k1rel = k1w - (off + cw)
                    for pr in range(TILE_H):
                        # NB: a scalar lax.cond guard per word-row (skip
                        # rows no lane samples) was measured 2-3.7x SLOWER
                        # on Mosaic — scf.if with vector carries defeats
                        # the pipeliner. Keep the bodies unconditional.
                        rowA = jnp.broadcast_to(chA[pr:pr + 1, :],
                                                (TILE_H, TILE_W))
                        rowB = jnp.broadcast_to(chB[pr:pr + 1, :],
                                                (TILE_H, TILE_W))
                        g0 = jnp.where(
                            in0B, jnp.take_along_axis(rowB, xc0B, axis=1),
                            jnp.take_along_axis(rowA, xc0A, axis=1))
                        g1 = jnp.where(
                            in1B, jnp.take_along_axis(rowB, xc1B, axis=1),
                            jnp.take_along_axis(rowA, xc1A, axis=1))
                        m0 = k0rel == pr
                        m1 = k1rel == pr
                        W00 = jnp.where(m0 & in0, g0, W00)
                        W01 = jnp.where(m1 & in0, g0, W01)
                        W10 = jnp.where(m0 & in1, g1, W10)
                        W11 = jnp.where(m1 & in1, g1, W11)
                    return W00, W01, W10, W11

                zW = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                W00, W01, W10, W11 = jax.lax.fori_loop(
                    0, n_rb * n_cp, scan_body, (zW, zW, zW, zW))

                # extraction, once per tap: rows yi / yi+1 live at in-word
                # byte positions (yi & (R-1)) — per-lane dynamic shifts
                s0 = (yi & (R - 1)) * bw
                s1 = ((yi + 1) & (R - 1)) * bw
                e00 = jax.lax.shift_right_logical(W00, s0)
                e01 = jax.lax.shift_right_logical(W01, s1)
                e10 = jax.lax.shift_right_logical(W10, s0)
                e11 = jax.lax.shift_right_logical(W11, s1)
                if src_u8:
                    v00 = (e00 & 0xFF).astype(jnp.float32)
                    v01 = (e01 & 0xFF).astype(jnp.float32)
                    v10 = (e10 & 0xFF).astype(jnp.float32)
                    v11 = (e11 & 0xFF).astype(jnp.float32)
                else:
                    bc = lambda e: jax.lax.bitcast_convert_type(  # noqa: E731
                        e << 16, jnp.float32)
                    v00, v01, v10, v11 = bc(e00), bc(e01), bc(e10), bc(e11)
                a0 = 1.0 - fx
                a1 = fx
                val = (one_m_fy * (a0 * v00 + a1 * v10)
                       + fy * (a0 * v01 + a1 * v11))

                wt = w_ref[0, t]
                sum_src = sum_src + wt * val
                sum_src_src = sum_src_src + wt * val * val
                sum_ref_src = sum_ref_src + wr_ref[0, t] * val

            inv_sum_w = 1.0 / sum_w
            mean_ref = sum_ref * inv_sum_w
            mean_src = sum_src * inv_sum_w
            var_ref = sum_ref_ref * inv_sum_w - mean_ref * mean_ref
            var_src = sum_src_src * inv_sum_w - mean_src * mean_src
            covar = sum_ref_src * inv_sum_w - mean_ref * mean_src
            denom = jnp.sqrt(jnp.maximum(var_ref * var_src, 1e-30))
            ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
            degenerate = (var_ref < min_var) | (var_src < min_var)
            cost = jnp.where(degenerate, cost_max, ncc)
            out_ref[0, 0] = jnp.where(in_bounds, cost, cost_max)

    out = pl.pallas_call(  # noqa: C901
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # A [V,3,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # B [V,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # swh [V,2]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # origin/off/nv [4]
            (pl.BlockSpec((V, n_phase * (Hs_p // R), Ws_p),
                          lambda k, v, i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
             if all_resident else
             # one packed source view resident at a time (v changes every
             # HT*WT grid steps); a DTU full-res u8 view is ~3.8 MB
             # two-phase so it fits in VMEM with double-buffering
             pl.BlockSpec((1, n_phase * (Hs_p // R), Ws_p),
                          lambda k, v, i, j: (v, 0, 0),
                          memory_space=pltpu.VMEM)),  # src block
            pl.BlockSpec((1, 4, TILE_H, TILE_W),
                         lambda k, v, i, j: (k, 0, i, j),
                         memory_space=pltpu.VMEM),   # m-field tile
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda k, v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # w taps tile
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda k, v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # w*ref taps tile
            pl.BlockSpec((1, 3, TILE_H, TILE_W),
                         lambda k, v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # ref sums tile
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda k, v, i, j: (k, v, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, V, Hg, W), jnp.float32),
    )(A, B, swh, org, src_dev, mfield, w_taps[None], wr_taps[None],
      refsums[None], )

    return jnp.transpose(out, (0, 2, 3, 1))  # [K, H, W, V]


def _kshared_call(A, B, swh, org, src_dev, mfield, w_taps, wr_taps, refsums,
                  *, taps, K, V, Hg, W, Hs_p, Ws_p, R, bw, src_u8, two_phase,
                  n_phase, all_resident, row_packed, cost_max, min_var,
                  PHASE, k_groups=None):
    """K-batched variant of the ZNCC kernel: the grid drops the hypothesis
    axis and one (view, tile) visit evaluates all K hypotheses, scanning the
    UNION of their per-tap bboxes once — the chunk slices, row broadcasts
    and loop trips are paid once per tap instead of once per (k, tap).

    Correct for any stack; fast only when the K windows overlap (the 8
    checkerboard-propagation candidates are neighbor pixels' planes,
    ACMMP.cu:804-992 — their warped windows are nearly identical). The
    per-(k, word-row) gathers and compare-selects are unchanged: each
    (word, column) is still found in exactly one (chunk, pair) visit of the
    union scan, so the masked-overwrite accumulation argument of the base
    kernel holds per k.

    `k_groups` (static partition of range(K)) splits the scan into one
    loop per group, each over the union of only ITS members' windows —
    sub-stacking for stacks whose members have systematically different
    reach (docs/PERF.md lever 12). Output is bitwise identical for any
    grouping."""
    T = len(taps)
    if k_groups is None:
        k_groups = (tuple(range(K)),)

    def kernel(a_ref, b_ref, swh_ref, org_ref, src_ref, m_ref, w_ref, wr_ref,
               rs_ref, out_ref):
        v = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        @pl.when(v.astype(jnp.float32) >= org_ref[3])
        def _skip():
            out_ref[:, 0] = jnp.full((K, TILE_H, TILE_W), cost_max,
                                     jnp.float32)

        @pl.when(v.astype(jnp.float32) < org_ref[3])
        def _compute():
            ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
                  + ti * TILE_H)
            jj = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
                  + tj * TILE_W)
            if row_packed:
                rr = 2 * ii + (org_ref[2].astype(jnp.int32) + jj) % 2
            else:
                rr = ii
            yy = rr.astype(jnp.float32) + org_ref[0]
            xx = jj.astype(jnp.float32) + org_ref[1]

            sw = swh_ref[v, 0]
            sh = swh_ref[v, 1]
            a00, a01, a02 = a_ref[v, 0, 0], a_ref[v, 0, 1], a_ref[v, 0, 2]
            a10, a11, a12 = a_ref[v, 1, 0], a_ref[v, 1, 1], a_ref[v, 1, 2]
            a20, a21, a22 = a_ref[v, 2, 0], a_ref[v, 2, 1], a_ref[v, 2, 2]
            b0, b1, b2 = b_ref[v, 0], b_ref[v, 1], b_ref[v, 2]

            # per-k hoisted rank-1 warp fields (see the base kernel)
            px00 = [None] * K
            py00 = [None] * K
            pz00 = [None] * K
            ux = [None] * K
            uy = [None] * K
            uz = [None] * K
            tx = [None] * K
            ty = [None] * K
            tz = [None] * K
            in_bounds = [None] * K
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
                in_bounds[k] = ((cx >= 0.0) & (cx < sw)
                                & (cy >= 0.0) & (cy < sh))

            sum_w = rs_ref[0, 0]
            sum_ref = rs_ref[0, 1]
            sum_ref_ref = rs_ref[0, 2]
            zf = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            sum_src = [zf] * K
            sum_src_src = [zf] * K
            sum_ref_src = [zf] * K

            n_words = Hs_p // R
            assert n_words % TILE_H == 0, (
                f"packed word-row count {n_words} must be a multiple of "
                f"{TILE_H} (two-phase pl.multiple_of promise)")
            last_col = Ws_p // TILE_W - 1

            for t, (di, dj, _ws) in enumerate(taps):
                fdi = jnp.float32(di)
                fdj = jnp.float32(dj)
                xi = [None] * K
                yi = [None] * K
                fx = [None] * K
                fy = [None] * K
                ymin = [None] * K
                ymax = [None] * K
                xmin = [None] * K
                xmax = [None] * K
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
                    ymin[k] = jnp.min(yi[k])
                    ymax[k] = jnp.max(yi[k])
                    xmin[k] = jnp.min(xi[k])
                    xmax[k] = jnp.max(xi[k])

                k0w = [yi[k] // R for k in range(K)]
                k1w = [(yi[k] + 1) // R for k in range(K)]
                zW = jnp.zeros((TILE_H, TILE_W), jnp.int32)
                W00 = [zW] * K
                W01 = [zW] * K
                W10 = [zW] * K
                W11 = [zW] * K

                # one scan per hypothesis GROUP, over the union of only
                # that group's windows
                for grp in k_groups:
                    uy_min = ymin[grp[0]]
                    uy_max = ymax[grp[0]]
                    ux_min = xmin[grp[0]]
                    ux_max = xmax[grp[0]]
                    for k in grp[1:]:
                        uy_min = jnp.minimum(uy_min, ymin[k])
                        uy_max = jnp.maximum(uy_max, ymax[k])
                        ux_min = jnp.minimum(ux_min, xmin[k])
                        ux_max = jnp.maximum(ux_max, xmax[k])

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
                    n_cols = col_hi + 1 - col_lo
                    n_cp = (n_cols + 1) // 2

                    def scan_body(i, carry, grp=grp, k0w=k0w, k1w=k1w,
                                  xi=xi, c_lo=c_lo, n_cp=n_cp,
                                  col_lo=col_lo, col_hi=col_hi, off=off,
                                  ph_mem=ph_mem):
                        # carry: (W00, W01, W10, W11) each a |grp|-tuple
                        g00, g01, g10, g11 = (list(c) for c in carry)
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
                        xlA = [xi[k] - c0a for k in grp]
                        xlB = [xi[k] - c0b for k in grp]
                        G = len(grp)
                        in0B = [(x >= 0) & (x < TILE_W) & has_b for x in xlB]
                        in1B = [(x + 1 >= 0) & (x + 1 < TILE_W) & has_b
                                for x in xlB]
                        in0 = [((xlA[j] >= 0) & (xlA[j] < TILE_W)) | in0B[j]
                               for j in range(G)]
                        in1 = [((xlA[j] + 1 >= 0) & (xlA[j] + 1 < TILE_W))
                               | in1B[j] for j in range(G)]
                        xc0A = [jnp.clip(x, 0, TILE_W - 1) for x in xlA]
                        xc1A = [jnp.clip(x + 1, 0, TILE_W - 1) for x in xlA]
                        xc0B = [jnp.clip(x, 0, TILE_W - 1) for x in xlB]
                        xc1B = [jnp.clip(x + 1, 0, TILE_W - 1) for x in xlB]
                        k0rel = [k0w[k] - (off + cw) for k in grp]
                        k1rel = [k1w[k] - (off + cw) for k in grp]
                        for pr in range(TILE_H):
                            # the row slice + broadcast is the shared work —
                            # once per word-row for the whole group
                            rowA = jnp.broadcast_to(chA[pr:pr + 1, :],
                                                    (TILE_H, TILE_W))
                            rowB = jnp.broadcast_to(chB[pr:pr + 1, :],
                                                    (TILE_H, TILE_W))
                            for j in range(G):
                                g0 = jnp.where(
                                    in0B[j],
                                    jnp.take_along_axis(rowB, xc0B[j],
                                                        axis=1),
                                    jnp.take_along_axis(rowA, xc0A[j],
                                                        axis=1))
                                g1 = jnp.where(
                                    in1B[j],
                                    jnp.take_along_axis(rowB, xc1B[j],
                                                        axis=1),
                                    jnp.take_along_axis(rowA, xc1A[j],
                                                        axis=1))
                                m0 = k0rel[j] == pr
                                m1 = k1rel[j] == pr
                                g00[j] = jnp.where(m0 & in0[j], g0, g00[j])
                                g01[j] = jnp.where(m1 & in0[j], g0, g01[j])
                                g10[j] = jnp.where(m0 & in1[j], g1, g10[j])
                                g11[j] = jnp.where(m1 & in1[j], g1, g11[j])
                        return (tuple(g00), tuple(g01), tuple(g10),
                                tuple(g11))

                    zG = (zW,) * len(grp)
                    r00, r01, r10, r11 = jax.lax.fori_loop(
                        0, n_rb * n_cp, scan_body, (zG, zG, zG, zG))
                    for j, k in enumerate(grp):
                        W00[k] = r00[j]
                        W01[k] = r01[j]
                        W10[k] = r10[j]
                        W11[k] = r11[j]

                wt = w_ref[0, t]
                wrt = wr_ref[0, t]
                for k in range(K):
                    s0 = (yi[k] & (R - 1)) * bw
                    s1 = ((yi[k] + 1) & (R - 1)) * bw
                    e00 = jax.lax.shift_right_logical(W00[k], s0)
                    e01 = jax.lax.shift_right_logical(W01[k], s1)
                    e10 = jax.lax.shift_right_logical(W10[k], s0)
                    e11 = jax.lax.shift_right_logical(W11[k], s1)
                    if src_u8:
                        v00 = (e00 & 0xFF).astype(jnp.float32)
                        v01 = (e01 & 0xFF).astype(jnp.float32)
                        v10 = (e10 & 0xFF).astype(jnp.float32)
                        v11 = (e11 & 0xFF).astype(jnp.float32)
                    else:
                        bc = lambda e: jax.lax.bitcast_convert_type(  # noqa: E731
                            e << 16, jnp.float32)
                        v00, v01, v10, v11 = bc(e00), bc(e01), bc(e10), bc(e11)
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
                out_ref[k, 0] = jnp.where(in_bounds[k], cost, cost_max)

    grid = (V, Hg // TILE_H, W // TILE_W)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # A [V,3,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # B [V,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # swh [V,2]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # origin/off/nv [4]
            (pl.BlockSpec((V, n_phase * (Hs_p // R), Ws_p),
                          lambda v, i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
             if all_resident else
             pl.BlockSpec((1, n_phase * (Hs_p // R), Ws_p),
                          lambda v, i, j: (v, 0, 0),
                          memory_space=pltpu.VMEM)),  # src block
            pl.BlockSpec((K, 4, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # all K m-field tiles
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # w taps tile
            pl.BlockSpec((1, T, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # w*ref taps tile
            pl.BlockSpec((1, 3, TILE_H, TILE_W),
                         lambda v, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # ref sums tile
        ],
        out_specs=pl.BlockSpec((K, 1, TILE_H, TILE_W),
                               lambda v, i, j: (0, v, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, V, Hg, W), jnp.float32),
    )(A, B, swh, org, src_dev, mfield, w_taps[None], wr_taps[None],
      refsums[None])

    return jnp.transpose(out, (0, 2, 3, 1))  # [K, H, W, V]
