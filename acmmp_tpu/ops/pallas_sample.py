"""Pallas coherent 2D sampler — the fusion gather, TPU-native.

Row-scan nearest sampling of [V, C, Hs, Ws] maps at per-pixel integer
coordinates, same machinery as ops/pallas_geom.py: for each (view, channel,
tile) the kernel scans only the (TILE_H x TILE_W) source chunks inside the
tile's coordinate bounding box, selecting lanes with `take_along_axis` and
rows with compare-accumulate. Projected coordinate fields are coherent
(neighboring reference pixels land on neighboring source pixels), so a tile
typically touches 1-4 chunks; invalid lanes (sentinel -1, see below) never
widen the window.

Exactness: values are moved as whole f32 words — no arithmetic — so the
result is bitwise-equal to the jnp oracle (`ops/sample.py`), which the
fusion equality tests rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def gather2d_pallas(maps: jax.Array, rr: jax.Array, cc: jax.Array,
                    valid: jax.Array) -> jax.Array:
    """`maps` [V, C, Hs, Ws] f32 sampled at (`rr`, `cc`) [V, H, W] int32
    where `valid` [V, H, W] bool, zeros elsewhere. Returns [V, C, H, W].
    Valid lanes must carry in-range indices (callers clip)."""
    V, C, Hs, Ws = maps.shape
    _, H, W = rr.shape

    Hs_p, Ws_p = _round_up(Hs, TILE_H), _round_up(Ws, TILE_W)
    if (Hs_p, Ws_p) != (Hs, Ws):
        maps = jnp.pad(maps, ((0, 0), (0, 0), (0, Hs_p - Hs),
                              (0, Ws_p - Ws)))
    H_p, W_p = _round_up(H, TILE_H), _round_up(W, TILE_W)

    # fold the valid mask into the indices: sentinel -1 never matches a
    # chunk row/lane, is excluded from the window min (mapped to the padded
    # extent) and dominates neither max (real indices are >= 0; all-invalid
    # tiles get max = -1 -> zero-trip scan)
    rr_m = jnp.where(valid, rr, -1)
    cc_m = jnp.where(valid, cc, -1)
    if (H_p, W_p) != (H, W):
        pad = ((0, 0), (0, H_p - H), (0, W_p - W))
        rr_m = jnp.pad(rr_m, pad, constant_values=-1)
        cc_m = jnp.pad(cc_m, pad, constant_values=-1)

    grid = (V, C, H_p // TILE_H, W_p // TILE_W)

    def kernel(m_ref, rr_ref, cc_ref, out_ref):
        wi = rr_ref[0]
        ui = cc_ref[0]
        inval = wi < 0

        rb_lo = jnp.min(jnp.where(inval, Hs_p, wi)) // TILE_H
        n_rb = jnp.maximum(jnp.max(wi) // TILE_H + 1 - rb_lo, 0)
        col_lo = jnp.min(jnp.where(inval, Ws_p, ui)) // TILE_W
        n_cols = jnp.maximum(jnp.max(ui) // TILE_W + 1 - col_lo, 0)

        def scan_body(i, acc):
            r0 = (rb_lo + i // n_cols) * TILE_H
            c0 = (col_lo + i % n_cols) * TILE_W
            chunk = m_ref[0, 0, pl.ds(r0, TILE_H), pl.ds(c0, TILE_W)]
            xl = ui - c0
            inx = (xl >= 0) & (xl < TILE_W)
            xc = jnp.clip(xl, 0, TILE_W - 1)
            for r in range(TILE_H):
                rowv = jnp.broadcast_to(chunk[r:r + 1, :], (TILE_H, TILE_W))
                g = jnp.take_along_axis(rowv, xc, axis=1)
                acc = jnp.where((wi == r0 + r) & inx, g, acc)
            return acc

        out_ref[0, 0] = jax.lax.fori_loop(
            0, n_rb * n_cols, scan_body,
            jnp.zeros((TILE_H, TILE_W), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # one (view, channel) plane resident at a time; a full-res DTU
            # plane is ~7.9 MB — the same budget as pallas_geom's view block
            pl.BlockSpec((1, 1, Hs_p, Ws_p), lambda v, c, i, j: (v, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda v, c, i, j: (v, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda v, c, i, j: (v, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda v, c, i, j: (v, c, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C, H_p, W_p), jnp.float32),
    )(maps, rr_m, cc_m)

    return out[:, :, :H, :W]
