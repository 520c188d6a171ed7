"""Checkerboard parity row-packing.

Each red/black half-sweep only updates pixels of one parity
(BlackPixelUpdate/RedPixelUpdate, src/ACMMP.cu:1175-1197). Evaluating the
14 hypothesis cost fields over the full grid and masking half away doubles
the work of the hottest op; instead the sweep packs the active parity's
pixels into a half-height grid and evaluates there.

Packing is along rows: packed (i, j) holds the full-grid pixel at local row
``2*i + (off0 + j) % 2``, column ``j``, where ``off0`` is the active-parity
row offset of local column 0. Column count (and so lane tiling) is
unchanged, row count halves exactly — no extra lane padding, and the
Pallas kernels' tile grids simply shrink by 2x along rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_pack_offset(parity_mask: jax.Array) -> jax.Array:
    """off0 for a [H, W] bool mask of the active parity (checkerboard):
    0 if local (0, 0) is active, else 1."""
    return jnp.where(parity_mask[0, 0], 0, 1).astype(jnp.int32)


def pack_rows(arr: jax.Array, off0: jax.Array) -> jax.Array:
    """[..., H, W] -> [..., H//2, W] keeping only active-parity pixels."""
    H, W = arr.shape[-2:]
    a = arr.reshape(arr.shape[:-2] + (H // 2, 2, W))
    offj = (off0 + jnp.arange(W, dtype=jnp.int32)) % 2       # [W]
    return jnp.where(offj == 0, a[..., 0, :], a[..., 1, :])


def pack_rows_c(arr: jax.Array, off0: jax.Array) -> jax.Array:
    """[..., H, W, C] -> [..., H//2, W, C] (channel-last fields)."""
    return jnp.moveaxis(pack_rows(jnp.moveaxis(arr, -1, 0), off0), 0, -1)


def unpack_rows(packed: jax.Array) -> jax.Array:
    """[..., H2, W] -> [..., 2*H2, W] by row-pair duplication; combine with
    a parity-mask `where` to scatter back into the full grid."""
    return jnp.repeat(packed, 2, axis=-2)


def unpack_rows_c(packed: jax.Array) -> jax.Array:
    """[..., H2, W, C] -> [..., 2*H2, W, C]."""
    return jnp.repeat(packed, 2, axis=-3)
