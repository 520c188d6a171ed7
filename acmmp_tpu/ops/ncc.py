"""Bilateral-weighted ZNCC photometric cost — the hottest op in the engine.

Re-designs ComputeBilateralNCC (src/ACMMP.cu:360-432) as a vectorized
image-grid op: instead of one CUDA thread per pixel re-deriving a 3x3
homography per (pixel, view, hypothesis), the plane-induced homography is
factored per view pair into constants ``(A, B, Kr^{-T})`` (see
core.geometry.homography_coeffs) so the per-pixel work is a rank-1 update,
and the 36-tap patch loop becomes 36 unrolled vector steps over the whole
image, each a fused multiply-add plus one bilinear gather from the source
view. All arithmetic is VPU-shaped (elementwise over [K, H, W, V] blocks);
a Pallas fusion of the gather+reduce lives in ops/pallas_ncc.py.

Sampling semantics match the reference's CUDA textures: float coordinate x
interpolates pixels floor(x)..floor(x)+1 (tex2D at x+0.5 with unnormalized
coords). Out-of-window taps clamp to the true image bounds (the reference
wraps; deviation recorded in DEVIATIONS.md).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo


class ViewGeometry(NamedTuple):
    """Precomputed per-source-view homography constants and bounds."""

    A: jax.Array       # [V, 3, 3]
    B: jax.Array       # [V, 3]
    KrT: jax.Array     # [3, 3] (ref K^{-T}, shared)
    src_width: jax.Array   # [V]
    src_height: jax.Array  # [V]


# Scan-group partitions of the 8 checkerboard-propagation candidates for
# the k_shared Pallas kernel (config.ncc_prop_substacks; region order =
# ops.propagation.direction_candidates / ACMMP.cu:806):
PROP_GROUPINGS = {
    "none": None,
    "nearfar": ((0, 2, 4, 6), (1, 3, 5, 7)),
    "four": ((0, 2), (4, 6), (1, 3), (5, 7)),
    "perk": tuple((k,) for k in range(8)),
}

# "auto" threshold: sub-stack ("four") only at source-view sizes where the
# per-tap scan windows dominate the call and the measured grouping win
# holds (tools/prop_attack.py: 1.07-1.10x at 1600x1184x8 on real mid-solve
# fields; below this the 4x chunk re-gather per tile visit is unmeasured,
# so auto keeps the single-union round-4 behavior). Compared against the
# PADDED source pixel count — a static shape, safe under jit.
PROP_SUBSTACKS_AUTO_MIN_PIXELS = 1600 * 1184


def resolve_prop_grouping(name, src_shape):
    """Map config.ncc_prop_substacks to a static k_groups partition.

    `src_shape` is the (padded) source-image shape [..., Hs, Ws]; "auto"
    picks "four" at/above PROP_SUBSTACKS_AUTO_MIN_PIXELS and "none" below.
    Any concrete partition is bitwise-identical to the single union
    (tests/test_pallas_ncc.py::test_k_groups_match_single_group) — the
    choice is purely a visit-scheduling/performance decision.
    """
    if name == "auto":
        big = src_shape[-2] * src_shape[-1] >= PROP_SUBSTACKS_AUTO_MIN_PIXELS
        name = "four" if big else "none"
    return PROP_GROUPINGS[name]


def make_view_geometry(ref_cam: geo.Camera, src_cams: geo.Camera) -> ViewGeometry:
    """src_cams: stacked Camera with leading view axis [V]."""
    A, B, KrT = jax.vmap(lambda sc: geo.homography_coeffs(ref_cam, sc))(src_cams)
    return ViewGeometry(A=A, B=B, KrT=KrT[0], src_width=src_cams.width,
                        src_height=src_cams.height)


def tap_weights_spatial(params: PatchMatchParams):
    """Static per-tap spatial bilateral factors exp(-sqrt(i^2+j^2)/(2 s^2))
    (ComputeBilateralWeight, ACMMP.cu:353-358)."""
    taps = []
    for di in params.tap_offsets:
        for dj in params.tap_offsets:
            sd = math.sqrt(di * di + dj * dj)
            taps.append((di, dj, math.exp(-sd / (2.0 * params.sigma_spatial ** 2))))
    return taps


def multiview_zncc(
    ref_img: jax.Array,      # [H, W] padded with edge replication
    src_imgs: jax.Array,     # [V, Hs, Ws] padded with edge replication
    vg: ViewGeometry,
    planes: jax.Array,       # [..., H, W, 4] camera-frame plane hypotheses
    params: PatchMatchParams,
    origin=None,             # (y0, x0) of ref_img's top-left pixel in the
                             # full image (tile shards carry a row offset)
    n_views=None,            # dynamic true view count (padded slots skipped
                             # by the Pallas kernel; oracle masks downstream)
    coherent_hyps=False,     # the K hypothesis fields are mutually coherent
                             # (e.g. propagation candidates = neighbor
                             # planes): the Pallas kernel then evaluates all
                             # K per tile visit sharing the gathered source
                             # chunks (k_shared, ops/pallas_ncc.py)
    k_groups=None,           # static scan-group partition for the k_shared
                             # kernel (ops/pallas_ncc.py); ignored by the
                             # oracle (grouping never changes values)
) -> jax.Array:
    """Per-view bilateral ZNCC costs for each plane hypothesis field.

    Returns [..., H, W, V] costs in [0, cost_max]; out-of-bounds centers and
    degenerate patches get cost_max (ACMMP.cu:368-369, 423-425).

    Backend dispatch: on TPU the fused Pallas kernel (ops/pallas_ncc.py)
    replaces the XLA-gather formulation below (~4-25x faster; identical
    semantics up to float reassociation). Controlled by params.ncc_backend.
    """
    use_pallas = params.ncc_backend == "pallas" or (
        params.ncc_backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas

        ks = coherent_hyps and params.ncc_kbatch_coherent and planes.ndim == 4
        if planes.ndim == 3:
            return multiview_zncc_pallas(
                ref_img, src_imgs, vg, planes[None], params,
                origin=origin, n_views=n_views)[0]
        return multiview_zncc_pallas(ref_img, src_imgs, vg, planes, params,
                                     origin=origin, n_views=n_views,
                                     k_shared=ks,
                                     k_groups=k_groups if ks else None)

    H, W = ref_img.shape
    x, y = geo.pixel_grid(H, W)
    if origin is not None:
        y = y + origin[0]
        x = x + origin[1]
    taps = tap_weights_spatial(params)
    tap_values = [_shift_edge(ref_img, dj, di) for di, dj, _w in taps]
    return _zncc_grids(ref_img, tap_values, x, y, src_imgs, vg, planes, params)


def multiview_zncc_packed(
    ref_img: jax.Array,      # [H, W] full-grid ref (edge-padded)
    src_imgs: jax.Array,     # [V, Hs, Ws]
    vg: ViewGeometry,
    planes: jax.Array,       # [..., H//2, W, 4] parity-packed hypotheses
    params: PatchMatchParams,
    off0: jax.Array,         # active-parity row offset of local column 0
    origin=None,             # FULL-grid (y0, x0) of ref_img's top-left
    n_views=None,            # dynamic true view count
    coherent_hyps=False,     # see multiview_zncc
    k_groups=None,           # see multiview_zncc
) -> jax.Array:
    """`multiview_zncc` on a parity row-packed half grid (ops/parity.py):
    packed (i, j) is the full-grid pixel at local row 2i + (off0+j)%2.
    Returns [..., H//2, W, V]."""
    from acmmp_tpu.ops import parity

    use_pallas = params.ncc_backend == "pallas" or (
        params.ncc_backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas

        ks = coherent_hyps and params.ncc_kbatch_coherent and planes.ndim == 4
        if planes.ndim == 3:
            return multiview_zncc_pallas(
                ref_img, src_imgs, vg, planes[None], params,
                origin=origin, row_pack_off=off0, n_views=n_views)[0]
        return multiview_zncc_pallas(ref_img, src_imgs, vg, planes, params,
                                     origin=origin, row_pack_off=off0,
                                     n_views=n_views, k_shared=ks,
                                     k_groups=k_groups if ks else None)

    H, W = ref_img.shape
    x, y = geo.pixel_grid(H, W)
    if origin is not None:
        y = y + origin[0]
        x = x + origin[1]
    taps = tap_weights_spatial(params)
    tap_values = [parity.pack_rows(_shift_edge(ref_img, dj, di), off0)
                  for di, dj, _w in taps]
    return _zncc_grids(parity.pack_rows(ref_img, off0), tap_values,
                       parity.pack_rows(x, off0), parity.pack_rows(y, off0),
                       src_imgs, vg, planes, params)


def _zncc_grids(ref_center, tap_values, x, y, src_imgs, vg, planes, params):
    """Oracle ZNCC over explicit coordinate grids. `ref_center`/`tap_values`
    and `x`/`y` share an arbitrary grid shape (full image or parity-packed
    half grid); `planes` is [..., *grid, 4]."""
    cost_max = params.cost_max

    # rank-1 homography piece per hypothesis: m = Kr^{-T} n, [..., *grid, 3]
    m = jnp.einsum("ij,...j->...i", vg.KrT, planes[..., :3],
                   precision=jax.lax.Precision.HIGHEST)
    inv_w = 1.0 / planes[..., 3]

    taps = tap_weights_spatial(params)
    inv_2sc2 = 1.0 / (2.0 * params.sigma_color ** 2)

    def one_view(src_img, A, B, sw, sh):
        # corresponding point of ref pixel q under H = A - B m^T / w:
        #   pt = (A q) - B * (m . q) / w  (homogeneous), q = (x+di, y+dj, 1)
        def warp(di, dj):
            qx = x + di
            qy = y + dj
            aq0 = A[0, 0] * qx + A[0, 1] * qy + A[0, 2]
            aq1 = A[1, 0] * qx + A[1, 1] * qy + A[1, 2]
            aq2 = A[2, 0] * qx + A[2, 1] * qy + A[2, 2]
            mq = (m[..., 0] * qx + m[..., 1] * qy + m[..., 2]) * inv_w
            px = aq0 - B[0] * mq
            py = aq1 - B[1] * mq
            pz = aq2 - B[2] * mq
            return px / pz, py / pz

        # center bounds check (ACMMP.cu:367-370): pt at the pixel itself
        cx, cy = warp(0.0, 0.0)
        in_bounds = (cx >= 0.0) & (cx < sw) & (cy >= 0.0) & (cy < sh)

        sum_ref = 0.0
        sum_ref_ref = 0.0
        sum_src = 0.0
        sum_src_src = 0.0
        sum_ref_src = 0.0
        sum_w = 0.0
        for t, (di, dj, w_spatial) in enumerate(taps):
            # ref tap: precomputed static shift with edge clamp (no gathers)
            ref_pix = tap_values[t]
            weight = w_spatial * jnp.exp(-jnp.abs(ref_pix - ref_center) * inv_2sc2)

            sx, sy = warp(float(di), float(dj))
            src_pix = geo.bilinear_sample(src_img, sx, sy, width=sw, height=sh)

            sum_ref = sum_ref + weight * ref_pix
            sum_ref_ref = sum_ref_ref + weight * ref_pix * ref_pix
            sum_src = sum_src + weight * src_pix
            sum_src_src = sum_src_src + weight * src_pix * src_pix
            sum_ref_src = sum_ref_src + weight * ref_pix * src_pix
            sum_w = sum_w + weight

        inv_sum_w = 1.0 / sum_w
        mean_ref = sum_ref * inv_sum_w
        mean_src = sum_src * inv_sum_w
        var_ref = sum_ref_ref * inv_sum_w - mean_ref * mean_ref
        var_src = sum_src_src * inv_sum_w - mean_src * mean_src
        covar = sum_ref_src * inv_sum_w - mean_ref * mean_src
        denom = jnp.sqrt(jnp.maximum(var_ref * var_src, 1e-30))
        ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
        degenerate = (var_ref < params.min_var) | (var_src < params.min_var)
        cost = jnp.where(degenerate, cost_max, ncc)
        return jnp.where(in_bounds, cost, cost_max)

    costs = jax.vmap(one_view, in_axes=(0, 0, 0, 0, 0), out_axes=-1)(
        src_imgs, vg.A, vg.B, vg.src_width, vg.src_height
    )
    return costs


# standalone-jitted variant for callers outside the solver's jit (tests,
# notebooks); inside run_patchmatch the op is traced into the solver program.
multiview_zncc_jit = jax.jit(multiview_zncc, static_argnames=("params",))


def _shift_edge(img: jax.Array, dj: int, di: int) -> jax.Array:
    """img shifted so out[y, x] = img[clamp(y+dj), clamp(x+di)] (edge clamp),
    using static pad+slice (no gathers)."""
    H, W = img.shape
    pj, pi = abs(dj), abs(di)
    padded = jnp.pad(img, ((pj, pj), (pi, pi)), mode="edge")
    return jax.lax.dynamic_slice(padded, (pj + dj, pi + di), (H, W))


def initial_cost_and_views(
    costs: jax.Array,        # [H, W, V] per-view NCC of the init hypothesis
    view_mask: jax.Array,    # [V] bool: true for real (non-padded) views
    params: PatchMatchParams,
):
    """Top-k averaging + selected-view mask
    (ComputeMultiViewInitialCostandSelectedViews, ACMMP.cu:434-471).

    Returns (cost [H, W], selected [H, W, V] bool).
    """
    big = jnp.float32(1e9)
    masked = jnp.where(view_mask, costs, big)
    valid = masked < params.cost_max
    num_valid = jnp.sum(valid, axis=-1)                    # [H, W]
    sorted_costs = jnp.sort(masked, axis=-1)               # ascending
    top_k = jnp.minimum(num_valid, params.top_k)           # [H, W]
    V = costs.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_costs.shape, 2)
    take = idx < top_k[..., None]
    cost_sum = jnp.sum(jnp.where(take, sorted_costs, 0.0), axis=-1)
    cost = jnp.where(top_k > 0, cost_sum / jnp.maximum(top_k, 1), params.cost_max)
    # threshold = k-th smallest cost; views at or below it are selected
    kth = jnp.take_along_axis(
        sorted_costs, jnp.maximum(top_k - 1, 0)[..., None], axis=-1
    )[..., 0]
    selected = (masked <= kth[..., None]) & (top_k[..., None] > 0) & view_mask
    return cost, selected
