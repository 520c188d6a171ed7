"""Adaptive checkerboard sampling and multi-hypothesis joint view selection.

The reference's per-thread scalar loops (CheckerboardPropagation,
src/ACMMP.cu:786-1173) become whole-image vector ops:

  * each of the 8 sampling regions (4 near V-shapes, 4 far strips;
    ACMMP.cu:804-992) is a small stack of statically-shifted cost maps with
    an argmin — pure VPU work, no data-dependent control flow;
  * the chosen neighbor's plane is one gather per region;
  * the per-view evidence / Monte-Carlo view re-sampling (ACMMP.cu:994-1056)
    is elementwise over [H, W, V] with a cumulative-distribution inversion.

Deviations from the reference (see DEVIATIONS.md): invalid border regions
are excluded from evidence and final argmin (the reference leaves their
cost rows zero-initialized, which both hijacks the argmin near borders and
injects phantom "perfect" view evidence); the right_far strip takes its
min-cost member unless `reproduce_right_far_quirk` is set (the reference's
comparison is reversed there, ACMMP.cu:879).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams


def direction_candidates(params: PatchMatchParams) -> List[List[Tuple[int, int]]]:
    """Candidate (dx, dy) offsets for the 8 regions, base candidate first.
    Order matches the reference's cost_array rows: 0 up_near, 1 up_far,
    2 down_near, 3 down_far, 4 left_near, 5 left_far, 6 right_near,
    7 right_far (ACMMP.cu:806)."""
    L = params.near_v_levels
    F = params.far_strip_candidates

    def near(axis_sign_x, axis_sign_y):
        # V-shaped region: base one step away, then two diagonals per level
        out = []
        if axis_sign_y != 0:
            out.append((0, axis_sign_y))
            for i in range(L):
                dy = axis_sign_y * (2 + i)
                if i == 0:
                    out.append((0, dy))
                else:
                    out.append((-i, dy))
                    out.append((i, dy))
        else:
            out.append((axis_sign_x, 0))
            for i in range(L):
                dx = axis_sign_x * (2 + i)
                if i == 0:
                    out.append((dx, 0))
                else:
                    out.append((dx, -i))
                    out.append((dx, i))
        return out

    def far(axis_sign_x, axis_sign_y):
        out = []
        for i in range(F):
            d = 3 + 2 * i
            out.append((axis_sign_x * d, axis_sign_y * d))
        return out

    return [
        near(0, -1),   # up_near
        far(0, -1),    # up_far
        near(0, 1),    # down_near
        far(0, 1),     # down_far
        near(-1, 0),   # left_near
        far(-1, 0),    # left_far
        near(1, 0),    # right_near
        far(1, 0),     # right_far
    ]


def shift_fill(arr: jax.Array, dy: int, dx: int, fill: float) -> jax.Array:
    """out[y, x] = arr[y+dy, x+dx], `fill` where out of the padded bounds.
    Static pad+slice, no gathers."""
    H, W = arr.shape[-2], arr.shape[-1]
    py, px = abs(dy), abs(dx)
    pad_width = [(0, 0)] * (arr.ndim - 2) + [(py, py), (px, px)]
    padded = jnp.pad(arr, pad_width, mode="constant", constant_values=fill)
    start = (0,) * (arr.ndim - 2) + (py + dy, px + dx)
    return jax.lax.dynamic_slice(padded, start, arr.shape)


BIG = jnp.float32(1e9)


def best_neighbor_planes(
    costs: jax.Array,     # [H, W] current aggregated costs
    planes: jax.Array,    # [H, W, 4]
    x: jax.Array,         # [H, W] pixel columns
    y: jax.Array,         # [H, W] pixel rows
    width_true: jax.Array,
    height_true: jax.Array,
    params: PatchMatchParams,
):
    """For each of the 8 regions pick the min-cost member's plane.

    Returns (cand_planes [8, H, W, 4], flags [8, H, W] bool — region valid).
    """
    H, W = costs.shape
    planes_flat = planes.reshape(H * W, 4)
    dirs = direction_candidates(params)

    cand_planes = []
    flags = []
    for d, cands in enumerate(dirs):
        shifted = []
        valids = []
        for (dx, dy) in cands:
            v = (x + dx >= 0) & (x + dx < width_true) & (y + dy >= 0) & (y + dy < height_true)
            c = shift_fill(costs, dy, dx, float(BIG))
            shifted.append(jnp.where(v, c, BIG))
            valids.append(v)
        cand_costs = jnp.stack(shifted)          # [C, H, W]
        if d == 7 and params.reproduce_right_far_quirk:
            # reference quirk: right_far keeps the base member unless a
            # *costlier* member appears (ACMMP.cu:871-887): the scan starts
            # at the base and replaces on cost > current — i.e. max over
            # the valid non-base members and the base.
            masked = jnp.where(jnp.stack(valids), cand_costs, -BIG)
            idx = jnp.argmax(masked, axis=0)
        else:
            idx = jnp.argmin(cand_costs, axis=0)  # [H, W]
        dxs = jnp.asarray([c[0] for c in cands], jnp.int32)[idx]
        dys = jnp.asarray([c[1] for c in cands], jnp.int32)[idx]
        # gather in ARRAY-LOCAL indices (x/y may carry a tile offset and are
        # only used for the true-bounds validity above)
        yl = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xl = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        gx = jnp.clip(xl + dxs, 0, W - 1)
        gy = jnp.clip(yl + dys, 0, H - 1)
        cand_planes.append(planes_flat[(gy * W + gx).reshape(-1)].reshape(H, W, 4))
        flags.append(valids[0])
    return jnp.stack(cand_planes), jnp.stack(flags)


def view_prior(
    selected: jax.Array,     # [H, W, V] bool, previous selected views
    x: jax.Array,            # [H, W] full pixel grids
    y: jax.Array,
    width_true: jax.Array,
    height_true: jax.Array,
    params: PatchMatchParams,
) -> jax.Array:
    """Per-view spatial prior from the 4 adjacent pixels' previous
    selections (ACMMP.cu:994-1008). Full-grid (reads opposite-parity
    neighbors); the rest of view selection is grid-agnostic
    (`view_selection_core`)."""
    H, W, V = selected.shape
    prior = jnp.zeros((H, W, V), jnp.float32)
    for (dx, dy) in ((0, -1), (0, 1), (-1, 0), (1, 0)):
        v = (x + dx >= 0) & (x + dx < width_true) & (y + dy >= 0) & (y + dy < height_true)
        nb_sel = shift_fill(
            selected.astype(jnp.float32).transpose(2, 0, 1), dy, dx, 0.0
        ).transpose(1, 2, 0)
        contrib = jnp.where(
            nb_sel > 0.5, params.view_prior_selected, params.view_prior_unselected
        )
        prior = prior + jnp.where(v[..., None], contrib, 0.0)
    return prior


def view_selection(
    cost_array: jax.Array,   # [8, H, W, V] per-region per-view NCC
    flags: jax.Array,        # [8, H, W]
    selected: jax.Array,     # [H, W, V] bool, previous selected views
    view_mask: jax.Array,    # [V] bool
    x: jax.Array,
    y: jax.Array,
    width_true: jax.Array,
    height_true: jax.Array,
    key: jax.Array,
    iteration: int,
    params: PatchMatchParams,
):
    """Multi-hypothesis joint view selection (ACMMP.cu:994-1056).

    Returns (view_weights [H, W, V] float — Monte-Carlo counts,
    weight_norm [H, W], new_selected [H, W, V] bool).
    """
    prior = view_prior(selected, x, y, width_true, height_true, params)
    return view_selection_core(cost_array, flags, prior, view_mask, x, y,
                               key, iteration, params)


def view_selection_core(
    cost_array: jax.Array,   # [8, *grid, V] per-region per-view NCC
    flags: jax.Array,        # [8, *grid]
    prior: jax.Array,        # [*grid, V] spatial prior (view_prior)
    view_mask: jax.Array,    # [V] bool
    x: jax.Array,            # [*grid] GLOBAL pixel coords (RNG counters)
    y: jax.Array,
    key: jax.Array,
    iteration: int,
    params: PatchMatchParams,
):
    """Evidence aggregation + Monte-Carlo view re-sampling over any grid
    (full image or parity-packed half grid). Sampling is per-pixel
    counter-based (ops/pixel_rng.py): the same (key, global pixel) draws
    the same 15 samples in any execution layout."""
    V = cost_array.shape[-1]

    # --- evidence from the 8 candidate hypotheses ---
    it = jnp.asarray(iteration, jnp.float32)
    thr = params.cost_threshold_base * jnp.exp(
        (it * it) / (-params.cost_threshold_decay)
    )
    fl = flags[..., None]  # [8, H, W, 1]
    good = (cost_array < thr) & fl
    false_ = (cost_array > params.cost_false_threshold) & fl
    tmpw = jnp.sum(
        jnp.where(good, jnp.exp(cost_array * cost_array / (-params.cost_good_beta)), 0.0),
        axis=0,
    )                                                  # [H, W, V]
    count = jnp.sum(good, axis=0).astype(jnp.float32)
    count_false = jnp.sum(false_, axis=0)
    fallback = jnp.exp(thr * thr / (-params.cost_fallback_beta))
    probs = jnp.where(
        count > params.min_good_hypotheses,
        tmpw / jnp.maximum(count, 1.0),
        fallback,
    )
    probs = jnp.where(count_false < params.max_false_hypotheses, probs, 0.0)
    probs = probs * prior * view_mask[None, None, :]

    # --- Monte-Carlo CDF inversion, 15 samples (ACMMP.cu:1034-1045) ---
    total = jnp.sum(probs, axis=-1, keepdims=True)
    cdf = jnp.cumsum(probs, axis=-1) / jnp.maximum(total, 1e-30)
    cdf = jnp.where(total > 0.0, cdf, -1.0)  # no mass -> never selected
    from acmmp_tpu.ops import pixel_rng as prng

    u = prng.uniform_n(key, y, x, 0, params.num_view_samples) - jnp.finfo(
        jnp.float32).eps
    # first index with cdf > u == number of cdf entries <= u
    idx = jnp.sum(cdf[None] <= u[..., None], axis=-1)       # [S, H, W]
    weights = jnp.sum(
        jax.nn.one_hot(idx, V + 1, dtype=jnp.float32)[..., :V], axis=0
    )                                                        # [H, W, V]
    weight_norm = jnp.sum(weights, axis=-1)
    new_selected = weights > 0.0
    return weights, weight_norm, new_selected
