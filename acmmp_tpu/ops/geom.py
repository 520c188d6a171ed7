"""Geometric-consistency cost: forward-backward reprojection error against
neighbor depth maps (ComputeGeomConsistencyCost, src/ACMMP.cu:518-543),
vectorized over the image grid, hypotheses and views.

On a multi-chip mesh the neighbor depth maps are the one cross-chip data
dependency; they arrive via lax.all_gather at the stage barrier (see
parallel/sharding.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo


def geom_consistency_cost(
    ref_cam: geo.Camera,
    src_cams: geo.Camera,     # stacked [V]
    src_depths: jax.Array,    # [V, Hs, Ws] depth maps (0 = invalid)
    planes: jax.Array,        # [..., H, W, 4]
    x: jax.Array,             # [H, W] pixel grids (parity-packed when
    y: jax.Array,             # [H, W]  `row_pack_off` is given)
    params: PatchMatchParams,
    row_pack_off=None,
) -> jax.Array:
    """Returns [..., H, W, V] clamped reprojection errors.

    Backend dispatch mirrors ops.ncc.multiview_zncc: on TPU the Pallas
    kernel (ops/pallas_geom.py) replaces the XLA-gather depth sampling.
    """
    use_pallas = params.ncc_backend == "pallas" or (
        params.ncc_backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas and planes.ndim == 4:
        from acmmp_tpu.ops.pallas_geom import geom_consistency_cost_pallas

        if row_pack_off is None:
            origin = (y[0, 0], x[0, 0])
        else:
            # packed grid: y[0, 0] carries the row offset of column 0
            origin = (y[0, 0] - row_pack_off, x[0, 0])
        return geom_consistency_cost_pallas(
            ref_cam, src_cams, src_depths, planes, params,
            origin=origin, row_pack_off=row_pack_off)

    max_cost = params.geom_cost_max
    depth = geo.depth_from_plane(ref_cam, planes, x, y)          # [..., H, W]
    Xw = geo.world_point(ref_cam, x, y, depth)                   # [..., H, W, 3]

    def one_view(src_cam, src_depth):
        uv, _ = geo.project(src_cam, Xw)                         # [..., H, W, 2]
        # reference samples the depth texture at truncated integer coords
        sd = geo.nearest_sample(src_depth, uv[..., 0], uv[..., 1],
                                width=src_cam.width, height=src_cam.height)
        Xs = geo.world_point(src_cam, uv[..., 0], uv[..., 1], sd)
        buv, _ = geo.project(ref_cam, Xs)
        err = jnp.sqrt(
            (x - buv[..., 0]) ** 2 + (y - buv[..., 1]) ** 2
        )
        err = jnp.minimum(max_cost, err)
        return jnp.where(sd <= 0.0, max_cost, err)

    return jax.vmap(one_view, in_axes=(0, 0), out_axes=-1)(src_cams, src_depths)
