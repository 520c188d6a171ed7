"""Joint bilateral upsampling between scales.

Two variants, both vectorized over the fine grid with a static window loop:
  * `jbu_depth` — the standalone depth upsampler (JBU_cu, src/ACMMP.cu:1458-1516;
    host driver RunJBU, src/ACMMP.cpp:1022-1087) that writes the next scale's
    depths.dmb;
  * `jbu_normal_cost` — the fused hierarchy-init upscaler for (normal, cost)
    fields (upscale_normal, src/ACMMP.cu:548-607).

Window: Imagescale = max(W/Wc, H/Hc) integer division, num_neighbors =
(Imagescale^2 + 1) / 2 (ACMMP.cu:1472-1476); sigma_d = 0.5 in coarse pixel
units, sigma_r = 25.5 grey levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops.ncc import _shift_edge as _shift_edge_clamp


def _jbu_weights_and_coords(fine_gray, coarse_shape, num_neighbors, scale,
                            params: PatchMatchParams):
    """Shared JBU machinery: per-tap (coarse iy/ix, weight) generator."""
    H, W = fine_gray.shape
    Hc, Wc = coarse_shape
    x, y = geo.pixel_grid(H, W)
    ox = x * scale
    oy = y * scale
    bx = jnp.floor(ox).astype(jnp.int32)
    by = jnp.floor(oy).astype(jnp.int32)
    inv_2sd2 = 1.0 / (2.0 * params.jbu_sigma_d ** 2)
    inv_2sr2 = 1.0 / (2.0 * params.jbu_sigma_r ** 2)

    taps = []
    for j in range(-num_neighbors, num_neighbors + 1):
        for i in range(-num_neighbors, num_neighbors + 1):
            rx = jnp.clip(bx + i, 0, Wc - 1)
            ry = jnp.clip(by + j, 0, Hc - 1)
            sdist = (ox - rx.astype(jnp.float32)) ** 2 + (oy - ry.astype(jnp.float32)) ** 2
            sgauss = jnp.exp(-sdist * inv_2sd2)
            neighbor = _shift_edge_clamp(fine_gray, j, i)
            d = jnp.abs(fine_gray - neighbor)
            rgauss = jnp.exp(-(d * d) * inv_2sr2)  # RangeGauss, ACMMP.cu:157-161
            taps.append((ry, rx, sgauss * rgauss))
    return taps


def jbu_depth(fine_gray: jax.Array, coarse_depth: jax.Array,
              params: PatchMatchParams) -> jax.Array:
    """Upsample `coarse_depth` to `fine_gray`'s grid."""
    H, W = fine_gray.shape
    Hc, Wc = coarse_depth.shape
    imagescale = max(H // Hc, W // Wc)
    num_neighbors = (imagescale * imagescale + 1) // 2
    scale = Wc / W
    cd_flat = coarse_depth.reshape(-1)
    num = jnp.zeros((H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    for ry, rx, w in _jbu_weights_and_coords(fine_gray, (Hc, Wc),
                                             num_neighbors, scale, params):
        v = cd_flat[(ry * Wc + rx).reshape(-1)].reshape(H, W)
        num = num + v * w
        den = den + w
    return num / jnp.maximum(den, 1e-30)


def jbu_normal_cost(fine_gray: jax.Array, coarse_normal: jax.Array,
                    coarse_cost: jax.Array, params: PatchMatchParams):
    """Hierarchy-init upscale of (normal, cost) (upscale_normal,
    ACMMP.cu:548-607). Returns (normal [H, W, 3] normalized, cost [H, W])."""
    H, W = fine_gray.shape
    Hc, Wc = coarse_cost.shape
    imagescale = max(H // Hc, W // Wc)
    num_neighbors = (imagescale * imagescale + 1) // 2
    scale = Wc / W
    cn_flat = coarse_normal.reshape(-1, 3)
    cc_flat = coarse_cost.reshape(-1)
    n_acc = jnp.zeros((H, W, 3), jnp.float32)
    c_acc = jnp.zeros((H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    for ry, rx, w in _jbu_weights_and_coords(fine_gray, (Hc, Wc),
                                             num_neighbors, scale, params):
        idx = (ry * Wc + rx).reshape(-1)
        n_acc = n_acc + cn_flat[idx].reshape(H, W, 3) * w[..., None]
        c_acc = c_acc + cc_flat[idx].reshape(H, W) * w
        den = den + w
    normal = n_acc / jnp.maximum(den, 1e-30)[..., None]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    return normal, c_acc / jnp.maximum(den, 1e-30)


jbu_depth_jit = jax.jit(jbu_depth, static_argnames=("params",))
