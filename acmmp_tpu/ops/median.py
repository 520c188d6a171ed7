"""Checkerboard median depth filter (CheckerboardFilter, src/ACMMP.cu:1214-1328).

21 cross/diagonal taps around each pixel; the masked median (taps outside
the true image bounds excluded) replaces the depth unless the pixel's cost
is under `filter_cost_skip`. Runs as two masked passes (black then red) so
the red pass reads black-updated depths, exactly like the reference's
sequential kernel launches (ACMMP.cu:1445-1447)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.ops.propagation import shift_fill, BIG

# (dx, dy) taps, center first (ACMMP.cu:1227-1319)
_TAPS = (
    (0, 0),
    (0, -1), (0, -3), (0, -5),
    (0, 1), (0, 3), (0, 5),
    (-1, 0), (-3, 0), (-5, 0),
    (1, 0), (3, 0), (5, 0),
    (2, -1), (2, 1), (-2, -1), (-2, 1),
    (-1, -2), (1, -2), (-1, 2), (1, 2),
)


def checkerboard_median(
    depth: jax.Array,      # [H, W]
    costs: jax.Array,      # [H, W]
    x: jax.Array,
    y: jax.Array,
    width_true: jax.Array,
    height_true: jax.Array,
    parity_mask: jax.Array,  # [H, W] bool — pixels to update this pass
    params: PatchMatchParams,
) -> jax.Array:
    vals = []
    valid = []
    for (dx, dy) in _TAPS:
        v = (x + dx >= 0) & (x + dx < width_true) & (y + dy >= 0) & (y + dy < height_true)
        vals.append(jnp.where(v, shift_fill(depth, dy, dx, float(BIG)), BIG))
        valid.append(v)
    stack = jnp.stack(vals)                      # [T, H, W]
    n = jnp.sum(jnp.stack(valid), axis=0)        # [H, W] valid tap count (>=1)
    s = jnp.sort(stack, axis=0)                  # invalid (BIG) sort to the end
    mi = n // 2
    lo = jnp.take_along_axis(s, jnp.maximum(mi - 1, 0)[None], axis=0)[0]
    hi = jnp.take_along_axis(s, mi[None], axis=0)[0]
    med = jnp.where(n % 2 == 0, 0.5 * (lo + hi), hi)
    update = parity_mask & (costs >= params.filter_cost_skip)
    return jnp.where(update, med, depth)
