"""The per-view PatchMatch solver: one jit-compiled functional program.

Reference call stack being re-designed (not ported): ACMMP::RunPatchMatch
(src/ACMMP.cu:1378-1456) — RandomInitialization, max_iterations x
(BlackPixelUpdate; RedPixelUpdate), GetDepthandNormal, Black/RedPixelFilter.

TPU-first design decisions:
  * the red/black checkerboard is two masked whole-image vector updates per
    iteration — the checkerboard guarantees each parity only reads the
    opposite parity, so the masked functional update is *exactly* the
    reference's in-place semantics, with no races possible;
  * every per-pixel scalar loop of the CUDA kernels (8-region adaptive
    sampling, view re-sampling, 5-candidate refinement) becomes a small
    static stack of vector ops over [H, W] grids (see ops/);
  * all randomness is counter-based via jax.random (reproducible; the
    reference seeds curand with the wall clock, ACMMP.cu:624);
  * hypotheses are evaluated in batched NCC calls ([9,H,W,V] for
    propagation, [5,H,W,V] for refinement) that keep the VPU busy.

Known reference bugs NOT reproduced (each documented in DEVIATIONS.md):
uninitialized plane_hypotheses_now when nothing improves (ACMMP.cu:1149),
garbage pre_costs in hierarchy mode (ACMMP.cu:680-681, ACMMP.cpp:764-765),
the world/cam normal-frame mixup in the planar-prior re-init else-branch
(ACMMP.cu:655-659), and the zero-cost border hijack (ACMMP.cu:805).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops import ncc as ncc_ops
from acmmp_tpu.ops import parity as parity_ops
from acmmp_tpu.ops import pixel_rng as prng
from acmmp_tpu.ops import propagation as prop_ops
from acmmp_tpu.ops import sampling as samp_ops
from acmmp_tpu.ops.geom import geom_consistency_cost
from acmmp_tpu.ops.median import checkerboard_median


@dataclasses.dataclass(frozen=True)
class Mode:
    """Static solver mode flags (PatchMatchParams bools, src/ACMMP.h:50-55)."""

    geom_consistency: bool = False
    planar_prior: bool = False
    hierarchy: bool = False
    seeded: bool = False


class SolverInputs(NamedTuple):
    """Dynamic inputs of one (view, scale, mode) solve. Optional fields are
    None unless the mode requires them; shapes are padded static shapes with
    true bounds carried in the cameras."""

    ref_img: jax.Array                 # [H, W] grayscale, edge-padded
    src_imgs: jax.Array                # [V, Hs, Ws]
    ref_cam: geo.Camera                # scalar camera
    src_cams: geo.Camera               # stacked [V]
    view_mask: jax.Array               # [V] bool
    depth_min: jax.Array               # scalar, relaxed range
    depth_max: jax.Array               # scalar
    src_depths: Optional[jax.Array] = None       # [V, Hs, Ws] (geom mode)
    init_depth: Optional[jax.Array] = None       # [H, W] re-entry depth
    init_normal_world: Optional[jax.Array] = None  # [H, W, 3] re-entry normal
    init_cost: Optional[jax.Array] = None        # [H, W] re-entry costs
    prior_planes: Optional[jax.Array] = None     # [H, W, 4] planar-prior planes
    prior_mask: Optional[jax.Array] = None       # [H, W] bool
    seed_planes: Optional[jax.Array] = None      # [H, W, 4] seeded init
    pre_costs: Optional[jax.Array] = None        # [H, W] hierarchy gate costs


class SolverState(NamedTuple):
    planes: jax.Array        # [H, W, 4] camera-frame plane hypotheses
    costs: jax.Array         # [H, W]
    selected: jax.Array      # [H, W, V] bool
    pre_costs: jax.Array     # [H, W] (hierarchy acceptance gate)
    # Per-view costs of the CURRENT plane field, carried across sweeps so
    # the 9th propagation hypothesis (the current plane, ACMMP.cu:1060-1062)
    # needs no re-evaluation: NCC (and geom cost) of a fixed plane at a
    # fixed pixel are deterministic, so the carried values are bitwise what
    # re-evaluation would produce. ~1/14th of the sweep's kernel work.
    ncc_pv: jax.Array        # [H, W, V]
    geom_pv: Optional[jax.Array] = None   # [H, W, V] (geom mode only)


class SolverOutputs(NamedTuple):
    depth: jax.Array         # [H, W]
    normal_world: jax.Array  # [H, W, 3]
    cost: jax.Array          # [H, W]
    pre_costs: jax.Array     # [H, W] (to thread into a follow-up prior run)


# ---------------------------------------------------------------------------
# initialization (RandomInitialization, ACMMP.cu:609-705)
# ---------------------------------------------------------------------------

def _init_state(inputs: SolverInputs, params: PatchMatchParams, mode: Mode,
                key: jax.Array) -> SolverState:
    H, W = inputs.ref_img.shape
    params = effective_params(params, H, W)
    x, y = geo.pixel_grid(H, W)
    cam = inputs.ref_cam
    vg = ncc_ops.make_view_geometry(cam, inputs.src_cams)

    if mode.seeded:
        planes = inputs.seed_planes
    elif mode.planar_prior:
        # re-entry after a converged photometric pass: keep the previous
        # hypothesis, but perturb around the triangulated prior plane where
        # a prior exists and the fit is still poor (ACMMP.cu:640-661)
        n_cam = geo.normal_world_to_cam(cam, inputs.init_normal_world)
        keep = geo.plane_from_depth_normal(cam, x, y, inputs.init_depth, n_cam)
        kd, kn = jax.random.split(key)
        p3 = 3.0 * params.prior_init_perturbation
        # NB: the reference perturbs the plane *offset* w by +-3*2% (it names
        # the variable depth_perturbed but reads/writes plane.w,
        # ACMMP.cu:645-650); we match that behavior.
        w0 = inputs.prior_planes[..., 3]
        u = prng.uniform(kd, y, x, 0) * 2.0 - 1.0
        w_pert = w0 * (1.0 + p3 * u)
        n_pert = samp_ops.perturbed_normal(
            kn, cam, x, y, inputs.prior_planes[..., :3], p3 * jnp.pi
        )
        pert = jnp.concatenate([n_pert, w_pert[..., None]], axis=-1)
        use_prior = inputs.prior_mask & (inputs.init_cost >= 0.1)
        planes = jnp.where(use_prior[..., None], pert, keep)
    elif mode.geom_consistency or mode.hierarchy:
        # re-enter from the previous pass/scale's (world normal, depth)
        n_cam = geo.normal_world_to_cam(cam, inputs.init_normal_world)
        planes = geo.plane_from_depth_normal(cam, x, y, inputs.init_depth, n_cam)
    else:
        planes = samp_ops.random_plane(
            key, cam, x, y, inputs.depth_min, inputs.depth_max,
            tile_window=params.rand_depth_tile_window,
            min_cos=params.rand_normal_min_cos,
        )

    per_view = ncc_ops.multiview_zncc(
        inputs.ref_img, inputs.src_imgs, vg, planes, params,
        n_views=jnp.sum(inputs.view_mask),
    )
    costs, selected = ncc_ops.initial_cost_and_views(
        per_view, inputs.view_mask, params
    )
    geom_pv = None
    if mode.geom_consistency:
        geom_pv = geom_consistency_cost(
            cam, inputs.src_cams, inputs.src_depths, planes[None], x, y,
            params)[0]
    pre_costs = costs if inputs.pre_costs is None else inputs.pre_costs
    return SolverState(planes=planes, costs=costs, selected=selected,
                       pre_costs=pre_costs, ncc_pv=per_view, geom_pv=geom_pv)


# ---------------------------------------------------------------------------
# one checkerboard half-sweep
# ---------------------------------------------------------------------------

def _aggregate(costs_pv, geom_pv, weights, weight_norm, params, geom: bool):
    """Weighted multiview aggregation: sum_j w_j (ncc_j + 0.2 geom_j) / norm.
    costs_pv: [..., H, W, V]."""
    c = costs_pv
    if geom:
        c = c + params.geom_weight * geom_pv
    total = jnp.sum(weights * c, axis=-1)
    return total / jnp.maximum(weight_norm, 1.0)


def _restricted_score(cost, depth, normal, prior_planes, prior_depth, dmin, dmax,
                      params):
    """Planar-prior restricted score (bigger is better; ACMMP.cu:1105-1124)."""
    depth_sigma = (dmax - dmin) / params.prior_depth_sigma_div
    two_ds2 = 2.0 * depth_sigma * depth_sigma
    two_as2 = 2.0 * params.prior_angle_sigma ** 2
    dd = depth - prior_depth
    cosang = jnp.sum(prior_planes[..., :3] * normal, axis=-1)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    prior = params.prior_gamma + jnp.exp(-dd * dd / two_ds2) * jnp.exp(
        -ang * ang / two_as2
    )
    return jnp.exp(-cost * cost / params.prior_beta) * prior


def effective_params(params: PatchMatchParams, H: int,
                     W: int) -> PatchMatchParams:
    """Resolve shape-dependent parameter gates for a FULL padded image of
    (H, W): the windowed random-depth deviation (DEVIATIONS.md #18) needs
    at least `rand_window_min_tiles` (16, 128) window tiles for
    exploration diversity, so small grids fall back to the exact
    full-range draw. Called with the full image shape by every solver
    entry point (fused, staged, batched, tile-sharded) so all layouts
    resolve identically — the tile solver's bitwise-equality contract
    depends on that."""
    if not params.rand_depth_tile_window:
        return params
    from acmmp_tpu.ops.sampling import WINDOW_TILE_COLS, WINDOW_TILE_ROWS

    tiles = (-(-H // WINDOW_TILE_ROWS)) * (-(-W // WINDOW_TILE_COLS))
    if tiles >= params.rand_window_min_tiles:
        return params
    return dataclasses.replace(params, rand_depth_tile_window=0.0)


def _random_init_mode(mode: Mode) -> bool:
    """True when initialization is per-pixel random planes (the photometric
    first pass) — the one case where sweep 0's propagation candidates can
    be mutually incoherent (see first_sweep_coherent)."""
    return not (mode.geom_consistency or mode.hierarchy or mode.seeded
                or mode.planar_prior)


def first_sweep_coherent(params: PatchMatchParams, mode: Mode) -> bool:
    """Whether sweep 0's propagation NCC uses the K-shared kernel.

    After a RANDOM init the 8 propagation candidates are neighbors'
    random planes; with FULL-RANGE random depths their union scan window
    widens to the whole image and K-sharing measured 1.4x SLOWER — the
    historical per-k exception. With the windowed draw active
    (rand_depth_tile_window > 0, the shipping default) candidate depths
    are tile-local and K-sharing measured 10% FASTER on the real post-
    init field at 1600x1184x8 (2260 vs 2486 ms) — and dropping the
    exception removes one compiled sweep program per (mode, shape).
    `params` must be the EFFECTIVE params (effective_params), since the
    window auto-disables on small grids. Results are bitwise identical
    either way (K-shared == per-k, test_k_shared_matches_per_k)."""
    return not (_random_init_mode(mode)
                and not params.rand_depth_tile_window)


def _sweep(state: SolverState, inputs: SolverInputs, vg, x, y, parity_mask,
           iteration, key: jax.Array, params: PatchMatchParams,
           mode: Mode, prop_coherent: bool = True) -> SolverState:
    cam = inputs.ref_cam
    H, W = inputs.ref_img.shape
    dmin, dmax = inputs.depth_min, inputs.depth_max
    wt, ht = cam.width, cam.height
    k_view, k_refine = jax.random.split(key)

    # tile shards pass global-coordinate grids; the NCC rebuilds its own
    # grids internally, so hand it the tile origin
    origin = (y[0, 0], x[0, 0])

    # ---- adaptive checkerboard sampling: 8 candidate planes (full grid:
    # reads opposite-parity neighbor costs/planes) ----
    cand_planes, flags = prop_ops.best_neighbor_planes(
        state.costs, state.planes, x, y, wt, ht, params
    )
    # ---- view-selection spatial prior (full grid: 4-neighbor reads) ----
    prior = prop_ops.view_prior(state.selected, x, y, wt, ht, params)

    # ---- parity row packing: the rest of the sweep only matters at the
    # active parity's pixels, so evaluate the 14 hypothesis cost fields on
    # a half grid (ops/parity.py; 2x less work in the hot op) ----
    packed = params.parity_packed and (H % 16 == 0)
    if packed:
        off0 = parity_ops.row_pack_offset(parity_mask)
        pk = lambda a: parity_ops.pack_rows(a, off0)           # noqa: E731
        pkc = lambda a: parity_ops.pack_rows_c(a, off0)        # noqa: E731
    else:
        off0 = None
        pk = pkc = lambda a: a                                 # noqa: E731
    x, y = pk(x), pk(y)
    planes_cur = pkc(state.planes)
    sel_prev = pkc(state.selected)
    pre_costs_cur = pk(state.pre_costs)
    pv_cur = pkc(state.ncc_pv)                 # carried current-hyp NCC
    geom_cur = pkc(state.geom_pv) if mode.geom_consistency else None
    cand_planes = pkc(cand_planes)
    flags = pk(flags)
    prior = pkc(prior)
    prior_planes_in = (pkc(inputs.prior_planes)
                       if inputs.prior_planes is not None else None)
    prior_mask_in = (pk(inputs.prior_mask)
                     if inputs.prior_mask is not None else None)

    n_real = jnp.sum(inputs.view_mask)

    def eval_ncc(planes_k, coherent=False, k_groups=None):
        if packed:
            return ncc_ops.multiview_zncc_packed(
                inputs.ref_img, inputs.src_imgs, vg, planes_k, params, off0,
                origin=origin, n_views=n_real, coherent_hyps=coherent,
                k_groups=k_groups)
        return ncc_ops.multiview_zncc(inputs.ref_img, inputs.src_imgs, vg,
                                      planes_k, params, origin=origin,
                                      n_views=n_real, coherent_hyps=coherent,
                                      k_groups=k_groups)

    # the 9th hypothesis (the current plane, ACMMP.cu:1060-1062) is NOT
    # re-evaluated: its per-view costs are carried in the state (bitwise
    # identical to re-evaluation — same plane, same inputs).
    # The 8 propagation candidates are neighbor pixels' planes — mutually
    # coherent warp windows — so the kernel K-batches them per tile visit
    # (measured 2.2x on the coherent stack, tools/ncc_microbench.py).
    # Exceptions stay per-k: the first half-sweep after a RANDOM init
    # (`prop_coherent=False`: candidates are random neighbors; the union
    # window widens to the whole image and k_shared measures 1.4x slower)
    # and the 5 refinement candidates (2 of 5 are per-pixel random planes).
    ncc8 = eval_ncc(cand_planes, coherent=prop_coherent,
                    k_groups=ncc_ops.resolve_prop_grouping(
                        params.ncc_prop_substacks,
                        inputs.src_imgs.shape))                # [8,*g,V]
    ncc9 = jnp.concatenate([ncc8, pv_cur[None]], axis=0)       # [9,*g,V]
    geom9 = None
    if mode.geom_consistency:
        geom8 = geom_consistency_cost(cam, inputs.src_cams, inputs.src_depths,
                                      cand_planes, x, y, params,
                                      row_pack_off=off0)
        geom9 = jnp.concatenate([geom8, geom_cur[None]], axis=0)

    # ---- multi-hypothesis joint view selection ----
    weights, weight_norm, new_selected = prop_ops.view_selection_core(
        ncc8, flags, prior, inputs.view_mask, x, y, k_view, iteration, params,
    )
    has_views = weight_norm > 0.0

    agg9 = _aggregate(ncc9, geom9, weights[None], weight_norm[None], params,
                      mode.geom_consistency)                # [9, *g]
    final_costs = jnp.where(flags, agg9[:8], prop_ops.BIG)  # invalid regions out
    cost_now = agg9[8]

    cand_depths = geo.depth_from_plane(cam, cand_planes, x, y)  # [8, *g]
    depth_ok = (cand_depths >= dmin) & (cand_depths <= dmax)
    gated = jnp.where(depth_ok, final_costs, prop_ops.BIG)

    if not mode.planar_prior:
        best = jnp.argmin(gated, axis=0)                     # [*g]
        best_cost = jnp.take_along_axis(gated, best[None], axis=0)[0]
        improve = (best_cost < cost_now) & has_views
        plane_prop = jnp.where(
            improve[..., None],
            jnp.take_along_axis(cand_planes, best[None, ..., None], axis=0)[0],
            planes_cur,
        )
        cost_prop = jnp.where(improve, best_cost, cost_now)
        sel_prop = jnp.where(improve[..., None], new_selected, sel_prev)
        take_pv = improve
        restricted_prop = jnp.zeros(x.shape, jnp.float32)
        # buffers the reference writes during propagation:
        buffer_planes = planes_cur if mode.hierarchy else plane_prop
        buffer_costs = cost_now
        prior_depth = jnp.zeros(x.shape, jnp.float32)
    else:
        prior_depth = geo.depth_from_plane(cam, prior_planes_in, x, y)
        # masked pixels: maximize the restricted score over the 8 regions
        r8 = _restricted_score(
            agg9[:8], cand_depths, cand_planes[..., :3],
            prior_planes_in[None], prior_depth[None], dmin, dmax, params,
        )
        r8 = jnp.where(flags & depth_ok, r8, -prop_ops.BIG)
        r_now = _restricted_score(
            cost_now, geo.depth_from_plane(cam, planes_cur, x, y),
            planes_cur[..., :3], prior_planes_in, prior_depth,
            dmin, dmax, params,
        )
        best_r = jnp.argmax(r8, axis=0)
        best_r_score = jnp.take_along_axis(r8, best_r[None], axis=0)[0]
        take_r = (best_r_score > r_now) & prior_mask_in & has_views
        # unmasked pixels: standard min-cost acceptance
        best_c = jnp.argmin(gated, axis=0)
        best_c_cost = jnp.take_along_axis(gated, best_c[None], axis=0)[0]
        take_c = (best_c_cost < cost_now) & (~prior_mask_in) & has_views

        best = jnp.where(prior_mask_in, best_r, best_c)
        chosen_plane = jnp.take_along_axis(
            cand_planes, best[None, ..., None], axis=0
        )[0]
        chosen_cost = jnp.take_along_axis(agg9[:8], best[None], axis=0)[0]
        take = take_r | take_c
        plane_prop = jnp.where(take[..., None], chosen_plane, planes_cur)
        cost_prop = jnp.where(take, chosen_cost, cost_now)
        take_pv = take
        restricted_prop = jnp.where(take_r, best_r_score, r_now)
        sel_prop = jnp.where(take_r[..., None], new_selected, sel_prev)
        # hierarchy fallback must be the PRE-sweep plane: the reference's
        # propagation/refinement only update locals, and the gate skips the
        # global write-back entirely on failure (ACMMP.cu:1163-1169) — in
        # planar mode too. This also keeps the carried ncc_pv/geom_pv
        # consistent with the stored plane on gate-failed pixels.
        buffer_planes = planes_cur if mode.hierarchy else plane_prop
        buffer_costs = cost_now if mode.hierarchy else cost_prop

    # carry the adopted hypothesis's per-view costs forward
    best_pv = jnp.take_along_axis(ncc8, best[None, ..., None], axis=0)[0]
    pv_prop = jnp.where(take_pv[..., None], best_pv, pv_cur)
    geom_prop = None
    if mode.geom_consistency:
        best_gpv = jnp.take_along_axis(geom9[:8], best[None, ..., None],
                                       axis=0)[0]
        geom_prop = jnp.where(take_pv[..., None], best_gpv, geom_cur)

    # ---- plane refinement: 5 candidates (PlaneHypothesisRefinement) ----
    depth_now = geo.depth_from_plane(cam, plane_prop, x, y)
    normal_now = plane_prop[..., :3]
    kd_r, kn_r, kd_p, kn_p = jax.random.split(k_refine, 4)

    if mode.planar_prior:
        depth_sigma = (dmax - dmin) / params.prior_depth_sigma_div
        u = prng.uniform(kd_r, y, x, 16)
        d_rand_prior = u * 6.0 * depth_sigma + (prior_depth - 3.0 * depth_sigma)
        n_rand_prior = samp_ops.perturbed_normal(
            kn_r, cam, x, y, prior_planes_in[..., :3], params.prior_angle_sigma
        )
        d_rand_std = samp_ops.random_depth(
            kd_r, dmin, dmax, y, x,
            tile_window=params.rand_depth_tile_window)
        n_rand_std = samp_ops.random_unit_normal(
            kn_r, cam, x, y, depth_now,
            min_cos=params.rand_normal_min_cos)
        pm = prior_mask_in
        depth_rand = jnp.where(pm, d_rand_prior, d_rand_std)
        normal_rand = jnp.where(pm[..., None], n_rand_prior, n_rand_std)
    else:
        depth_rand = samp_ops.random_depth(
            kd_r, dmin, dmax, y, x,
            tile_window=params.rand_depth_tile_window)
        normal_rand = samp_ops.random_unit_normal(
            kn_r, cam, x, y, depth_now,
            min_cos=params.rand_normal_min_cos)

    pert = params.refine_perturbation
    u = prng.uniform(kd_p, y, x, 0)
    depth_pert = depth_now * (1.0 - pert) + u * (2.0 * pert * depth_now)
    normal_pert = samp_ops.perturbed_normal(kn_p, cam, x, y, normal_now,
                                            pert * jnp.pi)

    cand_d = jnp.stack([depth_rand, depth_now, depth_rand, depth_now, depth_pert])
    cand_n = jnp.stack([normal_now, normal_rand, normal_rand, normal_pert,
                        normal_now])
    planes5 = geo.plane_from_depth_normal(cam, x, y, cand_d, cand_n)
    if params.ncc_kbatch_refine:
        # two internally-coherent stacks (see config.ncc_kbatch_refine):
        # candidates {1,3,4} share the incumbent depth, {0,2} share the
        # same per-pixel random depth — identical center warps within each
        # stack, so the K-shared union window is ~each member's own.
        # Same candidate planes, same per-candidate costs (the K-shared
        # kernel is bitwise-equal to per-k, test_k_shared_matches_per_k).
        ncc_now = eval_ncc(jnp.stack([planes5[1], planes5[3], planes5[4]]),
                           coherent=True)
        ncc_rand = eval_ncc(jnp.stack([planes5[0], planes5[2]]),
                            coherent=True)
        ncc5 = jnp.stack([ncc_rand[0], ncc_now[0], ncc_rand[1], ncc_now[1],
                          ncc_now[2]])
    else:
        ncc5 = eval_ncc(planes5)
    geom5 = None
    if mode.geom_consistency:
        geom5 = geom_consistency_cost(cam, inputs.src_cams, inputs.src_depths,
                                      planes5, x, y, params, row_pack_off=off0)
    cost5 = _aggregate(ncc5, geom5, weights[None], weight_norm[None], params,
                       mode.geom_consistency)               # [5, *g]
    d_ok5 = (cand_d >= dmin) & (cand_d <= dmax)

    if not mode.planar_prior:
        g5 = jnp.where(d_ok5, cost5, prop_ops.BIG)
        bi = jnp.argmin(g5, axis=0)
        bc = jnp.take_along_axis(g5, bi[None], axis=0)[0]
        imp = (bc < cost_prop) & has_views
        plane_ref = jnp.where(
            imp[..., None],
            jnp.take_along_axis(planes5, bi[None, ..., None], axis=0)[0],
            plane_prop,
        )
        cost_ref = jnp.where(imp, bc, cost_prop)
    else:
        r5 = _restricted_score(cost5, cand_d, cand_n, prior_planes_in[None],
                               prior_depth[None], dmin, dmax, params)
        r5 = jnp.where(d_ok5, r5, -prop_ops.BIG)
        bi_r = jnp.argmax(r5, axis=0)
        br = jnp.take_along_axis(r5, bi_r[None], axis=0)[0]
        imp_r = (br > restricted_prop) & prior_mask_in & has_views
        g5 = jnp.where(d_ok5, cost5, prop_ops.BIG)
        bi_c = jnp.argmin(g5, axis=0)
        bcc = jnp.take_along_axis(g5, bi_c[None], axis=0)[0]
        imp_c = (bcc < cost_prop) & (~prior_mask_in) & has_views
        bi = jnp.where(prior_mask_in, bi_r, bi_c)
        chosen = jnp.take_along_axis(planes5, bi[None, ..., None], axis=0)[0]
        chosen_cost = jnp.take_along_axis(cost5, bi[None], axis=0)[0]
        imp = imp_r | imp_c
        plane_ref = jnp.where(imp[..., None], chosen, plane_prop)
        cost_ref = jnp.where(imp, chosen_cost, cost_prop)

    pv5 = jnp.take_along_axis(ncc5, bi[None, ..., None], axis=0)[0]
    pv_ref = jnp.where(imp[..., None], pv5, pv_prop)
    geom_ref = None
    if mode.geom_consistency:
        gpv5 = jnp.take_along_axis(geom5, bi[None, ..., None], axis=0)[0]
        geom_ref = jnp.where(imp[..., None], gpv5, geom_prop)

    # ---- hierarchy acceptance gate (ACMMP.cu:1163-1172) ----
    if mode.hierarchy:
        gate = cost_ref < pre_costs_cur - params.hierarchy_accept_margin
        new_planes = jnp.where(gate[..., None], plane_ref, buffer_planes)
        new_costs = jnp.where(gate, cost_ref, buffer_costs)
        # buffer fallback is (planes_cur, cost_now) -> carried pv_cur
        new_pv = jnp.where(gate[..., None], pv_ref, pv_cur)
        new_gpv = (jnp.where(gate[..., None], geom_ref, geom_cur)
                   if mode.geom_consistency else None)
    else:
        new_planes = plane_ref
        new_costs = cost_ref
        new_pv = pv_ref
        new_gpv = geom_ref

    # ---- masked parity write; pixels whose view re-sampling selected no
    # view at all keep their previous state (the reference would write NaN
    # costs there via a 0/0 — see DEVIATIONS.md). In packed mode the
    # half-grid results scatter back through a row-pair duplication gated
    # by the parity mask. ----
    if packed:
        unp, unpc = parity_ops.unpack_rows, parity_ops.unpack_rows_c
    else:
        unp = unpc = lambda a: a                               # noqa: E731
    upd = parity_mask & unp(has_views)
    upd3 = upd[..., None]
    return SolverState(
        planes=jnp.where(upd3, unpc(new_planes), state.planes),
        costs=jnp.where(upd, unp(new_costs), state.costs),
        selected=jnp.where(upd3, unpc(sel_prop), state.selected),
        pre_costs=state.pre_costs,
        ncc_pv=jnp.where(upd3, unpc(new_pv), state.ncc_pv),
        geom_pv=(jnp.where(upd3, unpc(new_gpv), state.geom_pv)
                 if mode.geom_consistency else state.geom_pv),
    )


# ---------------------------------------------------------------------------
# full solve
# ---------------------------------------------------------------------------

def init_state(inputs: SolverInputs, key: jax.Array,
               params: PatchMatchParams, mode: Mode) -> SolverState:
    """Stage 1 of the staged solve: initialization (jittable)."""
    return _init_state(inputs, params, mode, key)


def sweep_once(state: SolverState, inputs: SolverInputs, sweep_idx: int,
               key: jax.Array, params: PatchMatchParams,
               mode: Mode) -> SolverState:
    """Stage 2 (called 2*max_iterations times): one red/black half-sweep.
    `sweep_idx` is static: even = black parity, odd = red
    (BlackPixelUpdate/RedPixelUpdate, ACMMP.cu:1175-1197)."""
    eff = effective_params(params, *inputs.ref_img.shape)
    coh = sweep_idx != 0 or first_sweep_coherent(eff, mode)
    return sweep_once_dyn(state, inputs, jnp.float32(sweep_idx // 2),
                          jnp.int32(sweep_idx % 2), key, params, mode,
                          coherent=coh)


def sweep_once_dyn(state: SolverState, inputs: SolverInputs, iteration,
                   parity_odd, key: jax.Array, params: PatchMatchParams,
                   mode: Mode, coherent: bool = True) -> SolverState:
    """`sweep_once` with TRACED iteration/parity: one compiled program
    covers every coherent half-sweep of a (params, mode, shape), instead
    of one program per static sweep index — the staged production path
    compiles 2 sweep programs (incoherent first sweep + the rest) rather
    than 2*max_iterations. `coherent` stays static (it changes the NCC
    kernel's K-batching layout, see _sweep)."""
    H, W = inputs.ref_img.shape
    params = effective_params(params, H, W)
    x, y = geo.pixel_grid(H, W)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    black = (x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0
    parity = jnp.where(jnp.asarray(parity_odd) == 0, black, ~black)
    return _sweep(state, inputs, vg, x, y, parity,
                  jnp.asarray(iteration, jnp.float32), key, params, mode,
                  prop_coherent=coherent)


def finalize(state: SolverState, inputs: SolverInputs,
             params: PatchMatchParams) -> SolverOutputs:
    """Stage 3: plane -> (depth, world normal) + checkerboard median
    (GetDepthandNormal + Black/RedPixelFilter, ACMMP.cu:1199-1212, 1445-1447)."""
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    cam = inputs.ref_cam
    black = (x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0
    depth = geo.depth_from_plane(cam, state.planes, x, y)
    normal_world = geo.normal_cam_to_world(cam, state.planes[..., :3])
    depth = checkerboard_median(depth, state.costs, x, y, cam.width, cam.height,
                                black, params)
    depth = checkerboard_median(depth, state.costs, x, y, cam.width, cam.height,
                                ~black, params)
    return SolverOutputs(depth=depth, normal_world=normal_world,
                         cost=state.costs, pre_costs=state.pre_costs)


def run_patchmatch(inputs: SolverInputs, key: jax.Array,
                   params: PatchMatchParams, mode: Mode) -> SolverOutputs:
    """One full PatchMatch solve for one reference view as a single traced
    program (jit-compatible; `params` and `mode` static).

    NB: on TPU at large image sizes, prefer `run_patchmatch_staged` — XLA's
    TPU backend miscompiles the fused multi-sweep program at very large
    sizes. Measured with the packed-gather kernel (2026-08, v5e,
    tools/fused_fault_repro.py): correct through 1280x960 (1.23 Mpx),
    deterministic garbage at 1600x1184 (1.9 Mpx) regardless of loop style
    (lax.scan or unrolled python loop), while the same sweeps staged as
    separate programs are correct — so the trigger is whole-program
    scheduling, not the scan. The scheduler ships staged everywhere: the
    fused path saves only ~12% at small sizes and staged is also the
    multi-chip stage structure."""
    H, W = inputs.ref_img.shape
    params = effective_params(params, H, W)
    x, y = geo.pixel_grid(H, W)
    cam = inputs.ref_cam
    vg = ncc_ops.make_view_geometry(cam, inputs.src_cams)

    k_init, k_sweeps = jax.random.split(key)
    state = _init_state(inputs, params, mode, k_init)

    black = (x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0
    # scan over the 2*max_iterations half-sweeps so the (large) sweep body
    # is traced and compiled once. After a RANDOM init the first half-sweep
    # is split out of the scan to run with prop_coherent=False (random
    # candidates: the K-batched kernel's union window degrades, see _sweep)
    # — the scan then covers the remaining coherent sweeps.
    n_sweeps = 2 * params.max_iterations
    start = 0
    if not first_sweep_coherent(params, mode) and n_sweeps > 0:
        state = _sweep(state, inputs, vg, x, y, black, jnp.float32(0.0),
                       jax.random.fold_in(k_sweeps, 0), params, mode,
                       prop_coherent=False)
        start = 1
    sweeps = list(range(start, n_sweeps))
    if sweeps:
        iters = jnp.asarray([s // 2 for s in sweeps], jnp.float32)
        parities = jnp.asarray([s % 2 for s in sweeps], jnp.int32)
        keys = jax.vmap(lambda s: jax.random.fold_in(k_sweeps, s))(
            jnp.asarray(sweeps))

        def body(st, xs):
            it, par, k = xs
            parity = jnp.where(par == 0, black, ~black)
            return _sweep(st, inputs, vg, x, y, parity, it, k, params,
                          mode), None

        state, _ = jax.lax.scan(body, state, (iters, parities, keys))
    return finalize(state, inputs, params)


# The fused single-program solve is verified correct on XLA:TPU through
# 1280x960 (1.23 Mpx) and produces deterministic garbage at 1600x1184
# (tools/fused_fault_repro.py, 2026-08 v5e). The production dispatcher uses
# fused at or below this bound (saves the ~12% staged per-stage dispatch
# tax, docs/PERF.md) and staged above it. Re-verify with the repro tool
# before raising.
FUSED_MAX_PIXELS = 1280 * 960


def run_patchmatch_auto(inputs: SolverInputs, key: jax.Array,
                        params: PatchMatchParams, mode: Mode,
                        _cache={}) -> SolverOutputs:
    """Production dispatch: the fused single-program solve when the padded
    image is within the fused path's verified-correct bound
    (FUSED_MAX_PIXELS), the staged solve above it. Results are identical up
    to XLA fusion-level float reassociation."""
    H, W = inputs.ref_img.shape
    if H * W > FUSED_MAX_PIXELS:
        return run_patchmatch_staged(inputs, key, params=params, mode=mode)
    if "fused" not in _cache:
        _cache["fused"] = jax.jit(run_patchmatch,
                                  static_argnames=("params", "mode"))
    return _cache["fused"](inputs, key, params=params, mode=mode)


def run_patchmatch_staged(inputs: SolverInputs, key: jax.Array,
                          params: PatchMatchParams, mode: Mode,
                          _cache={}) -> SolverOutputs:
    """The same solve as `run_patchmatch`, executed as a short host-driven
    sequence of jitted stages (init, 2*max_iterations half-sweeps, finalize).
    State stays on device between stages; results are identical to the
    single-program path up to XLA fusion-level float reassociation.

    Exists because XLA:TPU faults on the fused multi-sweep program at large
    image sizes (see run_patchmatch docstring); this is also the natural
    structure for sharded multi-chip execution (collectives per stage)."""
    if "fns" not in _cache:
        _cache["fns"] = (
            jax.jit(init_state, static_argnames=("params", "mode")),
            # the previous state is dead after each half-sweep: donating it
            # lets XLA write the new state in place (saves HBM traffic and
            # peak memory at DTU sizes). iteration/parity are traced, so
            # ONE compiled program serves all coherent half-sweeps.
            jax.jit(sweep_once_dyn,
                    static_argnames=("params", "mode", "coherent"),
                    donate_argnums=(0,)),
            jax.jit(finalize, static_argnames=("params",)),
        )
    f_init, f_sweep, f_fin = _cache["fns"]
    k_init, k_sweeps = jax.random.split(key)
    state = f_init(inputs, k_init, params=params, mode=mode)
    eff = effective_params(params, *inputs.ref_img.shape)
    for s in range(2 * params.max_iterations):
        k = jax.random.fold_in(k_sweeps, s)
        coh = s != 0 or first_sweep_coherent(eff, mode)
        state = f_sweep(state, inputs, jnp.float32(s // 2), jnp.int32(s % 2),
                        k, params=params, mode=mode, coherent=coh)
    return f_fin(state, inputs, params=params)
