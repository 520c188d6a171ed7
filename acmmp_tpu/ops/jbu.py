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

TPU mapping: the coarse-tap reads look like gathers
(``coarse[by + j, bx + i]`` with ``bx = floor(x * scale)``), but when the
fine grid is an exact integer multiple of the coarse grid (the pipeline's
scale steps halve sizes) the access pattern is static: nearest-upsample the
coarse map once (a reshape/broadcast, no gather), and each tap becomes s*s
edge-clamped STATIC shifts selected by the pixel's residue class
(y % s, x % s). That keeps the whole op on fused XLA elementwise vector
code — no 10-20 ns/element TPU gathers, and no Pallas kernel needed. The
general (non-integer-ratio) case falls back to the gather formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops.ncc import _shift_edge as _shift_edge_clamp


def _window(fine_shape, coarse_shape):
    H, W = fine_shape
    Hc, Wc = coarse_shape
    imagescale = max(H // Hc, W // Wc)
    num_neighbors = (imagescale * imagescale + 1) // 2
    scale = Wc / W
    return num_neighbors, scale


def _weights(fine_gray, coarse_shape, num_neighbors, scale,
             params: PatchMatchParams):
    """Per-tap (coarse iy/ix arrays, weight) — the JBU weight machinery
    shared by both the gather and the static-shift sampling paths."""
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
            sdist = ((ox - rx.astype(jnp.float32)) ** 2
                     + (oy - ry.astype(jnp.float32)) ** 2)
            sgauss = jnp.exp(-sdist * inv_2sd2)
            neighbor = _shift_edge_clamp(fine_gray, j, i)
            d = jnp.abs(fine_gray - neighbor)
            rgauss = jnp.exp(-(d * d) * inv_2sr2)  # RangeGauss, ACMMP.cu:157-161
            taps.append((j, i, ry, rx, sgauss * rgauss))
    return taps


def _make_sampler(coarse: jax.Array, fine_shape):
    """Returns fn(j, i, ry, rx) -> coarse values on the fine grid.

    Integer-ratio fast path: nearest-upsampled coarse + per-residue static
    shifts (no gathers). `coarse` may carry trailing channel dims."""
    H, W = fine_shape
    Hc, Wc = coarse.shape[:2]
    channels = coarse.shape[2:]
    if H % Hc == 0 and W % Wc == 0 and (H // Hc) == (W // Wc) \
            and H // Hc >= 1:
        s = H // Hc
        up = jnp.repeat(jnp.repeat(coarse, s, axis=0), s, axis=1)
        x, y = geo.pixel_grid(H, W)
        ry_res = y.astype(jnp.int32) % s
        rx_res = x.astype(jnp.int32) % s

        def sample(j, i, ry, rx):
            # value(y, x) = coarse[clip(by + j), clip(bx + i)]; within the
            # residue class (y%s, x%s) == (ry0, rx0) that is the static
            # edge-clamped shift of `up` by (s*j - ry0, s*i - rx0): up's
            # outer s-1 rows/cols replicate the coarse border, so fine-edge
            # clamping equals coarse-index clamping
            out = jnp.zeros((H, W) + channels, coarse.dtype)
            for ry0 in range(s):
                for rx0 in range(s):
                    shifted = _shift_edge_nd(up, s * i - rx0, s * j - ry0)
                    m = (ry_res == ry0) & (rx_res == rx0)
                    if channels:
                        m = m[(...,) + (None,) * len(channels)]
                    out = jnp.where(m, shifted, out)
            return out

        return sample

    flat = coarse.reshape((-1,) + channels)

    def sample_gather(j, i, ry, rx):
        return flat[(ry * Wc + rx).reshape(-1)].reshape((H, W) + channels)

    return sample_gather


def _shift_edge_nd(img: jax.Array, di: int, dj: int) -> jax.Array:
    """Edge-clamped static shift, trailing channel dims allowed:
    out[y, x] = img[clamp(y+dj), clamp(x+di)]."""
    H, W = img.shape[:2]
    pj, pi = abs(dj), abs(di)
    pad = [(pj, pj), (pi, pi)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return jax.lax.dynamic_slice(
        padded, (pj + dj, pi + di) + (0,) * (img.ndim - 2), img.shape)


def jbu_depth(fine_gray: jax.Array, coarse_depth: jax.Array,
              params: PatchMatchParams) -> jax.Array:
    """Upsample `coarse_depth` to `fine_gray`'s grid."""
    H, W = fine_gray.shape
    nn, scale = _window((H, W), coarse_depth.shape)
    sample = _make_sampler(coarse_depth, (H, W))
    num = jnp.zeros((H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    for j, i, ry, rx, w in _weights(fine_gray, coarse_depth.shape, nn, scale,
                                    params):
        num = num + sample(j, i, ry, rx) * w
        den = den + w
    return num / jnp.maximum(den, 1e-30)


def jbu_normal_cost(fine_gray: jax.Array, coarse_normal: jax.Array,
                    coarse_cost: jax.Array, params: PatchMatchParams):
    """Hierarchy-init upscale of (normal, cost) (upscale_normal,
    ACMMP.cu:548-607). Returns (normal [H, W, 3] normalized, cost [H, W])."""
    H, W = fine_gray.shape
    nn, scale = _window((H, W), coarse_cost.shape)
    sample_n = _make_sampler(coarse_normal, (H, W))
    sample_c = _make_sampler(coarse_cost, (H, W))
    n_acc = jnp.zeros((H, W, 3), jnp.float32)
    c_acc = jnp.zeros((H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    for j, i, ry, rx, w in _weights(fine_gray, coarse_cost.shape, nn, scale,
                                    params):
        n_acc = n_acc + sample_n(j, i, ry, rx) * w[..., None]
        c_acc = c_acc + sample_c(j, i, ry, rx) * w
        den = den + w
    normal = n_acc / jnp.maximum(den, 1e-30)[..., None]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    return normal, c_acc / jnp.maximum(den, 1e-30)


jbu_depth_jit = jax.jit(jbu_depth, static_argnames=("params",))
