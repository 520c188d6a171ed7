"""Per-pixel counter-based RNG: draws keyed on GLOBAL pixel coordinates.

The reference seeds curand per thread with the wall clock
(src/ACMMP.cu:624) — non-reproducible by design. Rounds 1-3 used
jax.random shape-based draws instead (reproducible, but the value at a
pixel depended on the ARRAY shape and the pixel's local index), which
meant the tile-sharded solver (parallel/tiles.py) could not reproduce the
untiled solver's stream: a shard's local row 0 is global row r0, and
halo rows must draw exactly what their owner shard draws.

Here every draw is a pure function of (key, global_y, global_x, salt):
  * the untiled, parity-packed, and tile-sharded paths produce IDENTICAL
    random fields for the same key (tiles need no per-shard key folding);
  * halo rows draw exactly the owner shard's values;
  * the per-(16, 128)-pixel window tiles of the opt-in windowed-depth
    deviation (config.rand_depth_tile_window) are aligned in global
    coordinates, so window assignments agree across shard boundaries.

The generator is a murmur3-style 32-bit finalizer chain over
(key word 0, key word 1, y, x, salt) — ~12 integer VPU ops per draw,
noise-quality avalanche (every input bit flips each output bit with
p~0.5), far below measurement noise next to the 36-tap NCC the draws
feed. Distributions built on top (uniform, sphere, cap) match the
reference's laws exactly (GenerateRandomNormal ACMMP.cu:170-196,
GenerateRandomPlaneHypothesis ACMMP.cu:235-241).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = jnp.uint32(0x85EBCA6B)
_C2 = jnp.uint32(0xC2B2AE35)
_GOLD = jnp.uint32(0x9E3779B9)


def _fmix(h: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer (full avalanche)."""
    h = h ^ (h >> 16)
    h = h * _C1
    h = h ^ (h >> 13)
    h = h * _C2
    h = h ^ (h >> 16)
    return h


def _key_words(key: jax.Array):
    """The two raw uint32 words of a jax PRNG key.

    Accepts both key flavors (these are public sampling entry points):
    new-style typed keys (jax.random.key) and legacy raw uint32 arrays
    (jax.random.PRNGKey)."""
    if jnp.issubdtype(key.dtype, jnp.integer):   # legacy [..., 2] uint32
        data = jnp.asarray(key)
    else:
        data = jax.random.key_data(key)
    return data[..., 0].astype(jnp.uint32), data[..., 1].astype(jnp.uint32)


def bits(key: jax.Array, y: jax.Array, x: jax.Array, salt: int) -> jax.Array:
    """uint32 hash per pixel; y/x are (possibly float) GLOBAL coordinate
    grids (negative halo coordinates wrap consistently)."""
    yi = jnp.asarray(y).astype(jnp.int32).astype(jnp.uint32)
    xi = jnp.asarray(x).astype(jnp.int32).astype(jnp.uint32)
    k0, k1 = _key_words(key)
    h = _fmix(xi * _GOLD + k0)
    h = _fmix(h ^ (yi * _C1 + k1))
    h = _fmix(h ^ (jnp.uint32(salt) * _GOLD))
    return h


def uniform(key, y, x, salt: int) -> jax.Array:
    """float32 U[0, 1) per pixel (24-bit mantissa resolution)."""
    return (bits(key, y, x, salt) >> 8).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))


def uniform_n(key, y, x, salt: int, n: int) -> jax.Array:
    """[n, *grid] independent U[0, 1) fields (salt+i per sample)."""
    return jnp.stack([uniform(key, y, x, salt + i) for i in range(n)])


def sphere_direction(key, y, x, salt: int) -> jax.Array:
    """[..., 3] uniform on the unit sphere: z ~ U(-1,1), phi ~ U(0,2pi) —
    the same law as the reference's normalized-Gaussian draw
    (GenerateRandomNormal, ACMMP.cu:170-196)."""
    z = uniform(key, y, x, salt) * 2.0 - 1.0
    phi = uniform(key, y, x, salt + 1) * (2.0 * jnp.pi)
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
