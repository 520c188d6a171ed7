"""Image-domain (tile) sharding with halo exchange — for single views too
large for one chip's step budget.

The reference's CUDA grid is a per-pixel map with a bounded stencil: the
adaptive checkerboard propagation reads at most 23 rows/cols away (far
strips reach 3 + 2*10, src/ACMMP.cu:819-827), joint view selection reads
the 4-adjacent pixels' selections, and the median filter reads a 5-px
cross. Sharding the image rows across chips therefore needs a 23-row halo
of (planes, costs, selected) refreshed before every half-sweep — the MVS
analog of sequence parallelism (SURVEY.md §2.3). Halos move with
`lax.ppermute` over the mesh axis (nearest ICI neighbors); source images
are replicated (read-only texture state).

Covers every solver mode: the mode-specific inputs (init depth/normal/
cost re-entry fields, triangulated prior planes + mask, seeded planes,
hierarchy pre-costs) are all per-pixel ROW fields — they shard with the
image rows, and the sweep reads them only at the pixel itself (neighbor
reads come solely from planes/costs/selected, which get halos), so zero
halos are correct for them. Host-side work (triangulation, prior PNG
decode) stays per-view in the scheduler and feeds the sharded solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from acmmp_tpu.parallel.shmap import shard_map

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.patchmatch import (
    Mode, SolverInputs, SolverOutputs, SolverState, _sweep,
)
from acmmp_tpu.ops import ncc as ncc_ops
from acmmp_tpu.ops.median import checkerboard_median

TILE_AXIS = "tile"
HALO = 24  # >= 23-px stencil reach, rounded to a multiple of 8


def make_tile_mesh(n_devices=None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def _exchange_halos(arr: jax.Array, n: int, edge_replicate: bool = False):
    """(top_halo, bot_halo) for this shard: the last HALO rows of the upper
    neighbor and the first HALO rows of the lower neighbor. Edge shards get
    zero halos (their pixels fail the true-bounds checks downstream) —
    except with `edge_replicate`, which fills them by replicating the
    shard's own first/last row: the REF-IMAGE halos must reproduce the
    untiled solver's edge-clamped taps (DEVIATIONS.md #12 — out-of-image
    ref taps clamp to the border row), or edge-shard border pixels see
    zeros where the untiled solve sees the border row (measured: ~9% of
    pixels diverged, all within ~30 rows of the image top/bottom; interior
    shards agree BITWISE)."""
    idx = jax.lax.axis_index(TILE_AXIS)
    down = [(i, (i + 1) % n) for i in range(n)]   # my rows -> next shard
    up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(arr[-HALO:], TILE_AXIS, down)
    from_below = jax.lax.ppermute(arr[:HALO], TILE_AXIS, up)
    shape1 = (1,) * from_above.ndim
    if edge_replicate:
        top_fill = jnp.broadcast_to(arr[:1], from_above.shape)
        bot_fill = jnp.broadcast_to(arr[-1:], from_below.shape)
    else:
        top_fill = bot_fill = jnp.zeros_like(from_above)
    top = jnp.where((idx > 0).reshape(shape1), from_above, top_fill)
    bot = jnp.where((idx < n - 1).reshape(shape1), from_below, bot_fill)
    return top.astype(arr.dtype), bot.astype(arr.dtype)


def _ext(local, top, bot):
    return jnp.concatenate([top, local, bot], axis=0)


@partial(jax.jit, static_argnames=("params", "mode", "mesh"))
def _tile_solve_impl(inputs: SolverInputs, key, params, mode, mesh):
    H, W = inputs.ref_img.shape
    Pn = mesh.devices.size

    # per-pixel ROW fields shard with the image rows; everything else
    # (source images/cams/depths, scalars) is replicated read-only state
    row_field_names = ("ref_img", "init_depth", "init_normal_world",
                       "init_cost", "prior_planes", "prior_mask",
                       "seed_planes", "pre_costs")
    rows_in = SolverInputs(**{
        f: (getattr(inputs, f) if f in row_field_names else None)
        for f in SolverInputs._fields})
    repl = inputs._replace(**{f: None for f in row_field_names})

    def local_solve(repl, rows_in, key):
        ref_rows = rows_in.ref_img
        rows = ref_rows.shape[0]
        idx = jax.lax.axis_index(TILE_AXIS)
        y0 = (idx * rows).astype(jnp.float32)
        y_l = jax.lax.broadcasted_iota(jnp.float32, (rows, W), 0) + y0
        x_l = jax.lax.broadcasted_iota(jnp.float32, (rows, W), 1)
        cam = repl.ref_cam
        vg = ncc_ops.make_view_geometry(cam, repl.src_cams)

        # ---- init on local rows (the four branches of _init_state,
        # engine/patchmatch.py, with tile-origin pixel grids) ----
        from acmmp_tpu.ops import sampling as samp_ops

        # NO per-shard key folding: every random draw is per-pixel
        # counter-based on GLOBAL coordinates (ops/pixel_rng.py), so
        # sharing the key across shards reproduces the untiled solver's
        # stream exactly — halo rows draw their owner shard's values.
        k_init, k_sweeps = jax.random.split(key)
        if mode.seeded:
            planes0 = rows_in.seed_planes
        elif mode.planar_prior:
            # perturb around the triangulated prior where one exists and
            # the converged fit is still poor (ACMMP.cu:640-661)
            n_cam = geo.normal_world_to_cam(cam, rows_in.init_normal_world)
            keep = geo.plane_from_depth_normal(cam, x_l, y_l,
                                               rows_in.init_depth, n_cam)
            kd, kn = jax.random.split(k_init)
            p3 = 3.0 * params.prior_init_perturbation
            w0 = rows_in.prior_planes[..., 3]
            from acmmp_tpu.ops import pixel_rng as prng

            u = prng.uniform(kd, y_l, x_l, 0) * 2.0 - 1.0
            w_pert = w0 * (1.0 + p3 * u)
            n_pert = samp_ops.perturbed_normal(
                kn, cam, x_l, y_l, rows_in.prior_planes[..., :3],
                p3 * jnp.pi)
            pert = jnp.concatenate([n_pert, w_pert[..., None]], axis=-1)
            use_prior = rows_in.prior_mask & (rows_in.init_cost >= 0.1)
            planes0 = jnp.where(use_prior[..., None], pert, keep)
        elif mode.geom_consistency or mode.hierarchy:
            n_cam = geo.normal_world_to_cam(cam, rows_in.init_normal_world)
            planes0 = geo.plane_from_depth_normal(
                cam, x_l, y_l, rows_in.init_depth, n_cam)
        else:
            planes0 = samp_ops.random_plane(
                k_init, cam, x_l, y_l, repl.depth_min, repl.depth_max,
                tile_window=params.rand_depth_tile_window,
                min_cos=params.rand_normal_min_cos)
        # init NCC on the halo-extended ref rows so the +-patch_radius ref
        # taps of boundary pixels read TRUE neighbor rows instead of
        # clamping at the shard seam (the NCC at pixel p only reads the
        # plane AT p, so the halo plane rows can be anything — zeros here —
        # and their outputs are sliced away)
        rt0, rb0 = _exchange_halos(ref_rows, Pn, edge_replicate=True)
        ref_e0 = _ext(ref_rows, rt0, rb0)
        planes0_e = jnp.concatenate(
            [jnp.zeros((HALO, W, 4), planes0.dtype), planes0,
             jnp.zeros((HALO, W, 4), planes0.dtype)], axis=0)
        per_view = ncc_ops.multiview_zncc(
            ref_e0, repl.src_imgs, vg, planes0_e, params,
            origin=(y_l[0, 0] - HALO, x_l[0, 0]),
            n_views=jnp.sum(repl.view_mask))[HALO:HALO + rows]
        costs0, selected0 = ncc_ops.initial_cost_and_views(
            per_view, repl.view_mask, params)
        geom_pv0 = None
        if mode.geom_consistency:
            from acmmp_tpu.ops.geom import geom_consistency_cost

            geom_pv0 = geom_consistency_cost(
                cam, repl.src_cams, repl.src_depths, planes0[None], x_l, y_l,
                params)[0]
        pre0 = (costs0 if rows_in.pre_costs is None
                else rows_in.pre_costs)
        state = SolverState(planes=planes0, costs=costs0, selected=selected0,
                            pre_costs=pre0, ncc_pv=per_view,
                            geom_pv=geom_pv0)

        # ---- sweeps on the halo-extended tile ----
        x_e = jax.lax.broadcasted_iota(jnp.float32, (rows + 2 * HALO, W), 1)
        y_e = (jax.lax.broadcasted_iota(jnp.float32, (rows + 2 * HALO, W), 0)
               + y0 - HALO)
        black_e = (x_e.astype(jnp.int32) + y_e.astype(jnp.int32)) % 2 == 0
        # prior fields are read only at the pixel itself inside the sweep
        # (the restricted score / refinement sampling), so zero halos are
        # correct — halo-row outputs are sliced away below
        def _zext(a, fill):
            if a is None:
                return None
            halo = jnp.full((HALO,) + a.shape[1:], fill, a.dtype)
            return jnp.concatenate([halo, a, halo], axis=0)

        ext_inputs = repl._replace(
            ref_img=ref_e0,
            prior_planes=_zext(rows_in.prior_planes, 0),
            prior_mask=_zext(rows_in.prior_mask, False))

        for s in range(2 * params.max_iterations):
            pt, pb = _exchange_halos(state.planes, Pn)
            ct, cb = _exchange_halos(state.costs, Pn)
            st, sb = _exchange_halos(state.selected, Pn)
            vt, vb = _exchange_halos(state.ncc_pv, Pn)
            if mode.geom_consistency:
                gt, gb = _exchange_halos(state.geom_pv, Pn)
            ext_state = SolverState(
                planes=_ext(state.planes, pt, pb),
                costs=_ext(state.costs, ct, cb),
                selected=_ext(state.selected, st, sb),
                pre_costs=_ext(state.pre_costs, ct, cb),
                ncc_pv=_ext(state.ncc_pv, vt, vb),
                geom_pv=(_ext(state.geom_pv, gt, gb)
                         if mode.geom_consistency else None),
            )
            parity = black_e if s % 2 == 0 else ~black_e
            k = jax.random.fold_in(k_sweeps, s)
            from acmmp_tpu.engine.patchmatch import first_sweep_coherent

            # params here are already EFFECTIVE (resolved from the full
            # image shape in tile_sharded_patchmatch)
            coh = s != 0 or first_sweep_coherent(params, mode)
            new_ext = _sweep(ext_state, ext_inputs, vg, x_e, y_e, parity,
                             jnp.float32(s // 2), k, params, mode,
                             prop_coherent=coh)
            state = SolverState(
                planes=new_ext.planes[HALO:HALO + rows],
                costs=new_ext.costs[HALO:HALO + rows],
                selected=new_ext.selected[HALO:HALO + rows],
                pre_costs=state.pre_costs,
                ncc_pv=new_ext.ncc_pv[HALO:HALO + rows],
                geom_pv=(new_ext.geom_pv[HALO:HALO + rows]
                         if mode.geom_consistency else None),
            )

        # ---- finalize with depth halos for the median stencil ----
        depth = geo.depth_from_plane(cam, state.planes, x_l, y_l)
        normal_world = geo.normal_cam_to_world(cam, state.planes[..., :3])
        dt, db = _exchange_halos(depth, Pn)
        ct2, cb2 = _exchange_halos(state.costs, Pn)
        d_e = _ext(depth, dt, db)
        c_e = _ext(state.costs, ct2, cb2)
        d_e = checkerboard_median(d_e, c_e, x_e, y_e, cam.width, cam.height,
                                  black_e, params)
        d_e = checkerboard_median(d_e, c_e, x_e, y_e, cam.width, cam.height,
                                  ~black_e, params)
        return SolverOutputs(depth=d_e[HALO:HALO + rows],
                             normal_world=normal_world,
                             cost=state.costs, pre_costs=state.pre_costs)

    rows_spec = P(TILE_AXIS)
    repl_specs = jax.tree.map(lambda _: P(), repl)
    rows_specs = jax.tree.map(lambda _: rows_spec, rows_in)
    out_specs = SolverOutputs(depth=rows_spec, normal_world=rows_spec,
                              cost=rows_spec, pre_costs=rows_spec)
    fn = shard_map(
        local_solve, mesh=mesh,
        in_specs=(repl_specs, rows_specs, P()),
        out_specs=out_specs, check_rep=False)
    return fn(repl, rows_in, key)


def tile_sharded_patchmatch(
    mesh: Mesh,
    inputs: SolverInputs,
    key: jax.Array,
    params: PatchMatchParams,
    mode: Mode,
) -> SolverOutputs:
    """Full PatchMatch solve for ONE view with the image rows sharded over
    the mesh — every solver mode (photometric, geometric, hierarchy,
    planar-prior, seeded). H must be divisible by 8 * mesh size.

    BITWISE equal to run_patchmatch on the same inputs/key: random draws
    are per-pixel counter-based on global coordinates (ops/pixel_rng.py),
    halo rows draw their owner shard's values, and the outer-edge ref
    halos replicate the border row exactly as the untiled solver's
    edge-clamped taps do (pinned by tests/test_tiles.py)."""
    from acmmp_tpu.engine.patchmatch import effective_params

    H, W = inputs.ref_img.shape
    Pn = mesh.devices.size
    assert H % (8 * Pn) == 0, (H, Pn)
    assert H // Pn >= HALO, (
        f"shards must be at least {HALO} rows tall (halo reach); "
        f"got {H // Pn} rows/shard")
    # resolve shape-dependent gates from the FULL image shape (the local
    # shard shapes differ; resolving here keeps tiled == untiled bitwise)
    params = effective_params(params, H, W)
    return _tile_solve_impl(inputs, key, params, mode, mesh)
