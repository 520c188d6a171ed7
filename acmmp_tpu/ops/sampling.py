"""Counter-based random plane-hypothesis sampling.

The reference seeds curand with wall-clock (``curand_init(clock64(), ...)``,
src/ACMMP.cu:624) making runs non-reproducible by design; here every draw
is a pure function of (key, global pixel coordinate, salt) via
ops/pixel_rng.py — exactly reproducible, AND identical across execution
layouts: the untiled, parity-packed and tile-sharded (parallel/tiles.py)
solvers draw the same value at the same global pixel, so row-sharding a
view changes nothing but the device layout. Distributions match the
reference:
  * random unit normals are uniform on the sphere, flipped to face the
    camera (GenerateRandomNormal, ACMMP.cu:170-196 — (z, phi) inversion
    and a normalized Gaussian draw give the same law);
  * perturbed normals rotate by three independent U(-p/2, p/2) Euler angles
    and keep the original when the result faces away
    (GeneratePerturbedNormal, ACMMP.cu:198-233).

Each function takes a distinct jax key (callers split as before); `salt`
only separates draws made from the SAME key within one function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops import pixel_rng as prng


def random_unit_normal(key, cam: geo.Camera, x, y, depth,
                       min_cos: float = 0.0) -> jax.Array:
    """Uniform-on-sphere normals facing the camera; shapes follow x/y.

    With ``min_cos = c`` in (0, 1) the draw is uniform on the spherical
    cap ``dot(n, -view_dir) >= c`` instead of the full facing hemisphere
    — an OPT-IN deviation from the reference's uniform hemisphere
    (GenerateRandomNormal, ACMMP.cu:170-196; DEVIATIONS.md #19).
    Near-grazing random normals (``dot ~ 0``) make the plane-induced
    homography's Jacobian explode, and the Pallas NCC kernel's per-tap
    scan window is a per-(8,128)-tile bbox: ONE grazing normal anywhere
    in a tile forces the whole tile to scan a huge source window. On the
    reference's GPU the same normal costs nothing (texture fetches are
    O(1) per tap regardless of where they land) — this cap exists purely
    because our cost model is scan-extent-based. 0 (default) = exact
    reference law."""
    if not min_cos:
        n = prng.sphere_direction(key, y, x, 0)
        return geo.face_camera(cam, x, y, depth, n)
    c = float(min_cos)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    a = -geo.view_direction(cam, x, y, depth)          # cap axis (unit)
    # uniform on the cap: cos(theta) ~ U(c, 1), phi ~ U(0, 2pi)
    ct = c + prng.uniform(key, y, x, 0) * (1.0 - c)
    ct = jnp.broadcast_to(ct, shape)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = prng.uniform(key, y, x, 1) * (2.0 * jnp.pi)
    # orthonormal basis perpendicular to a (guard the degenerate helper)
    h = jnp.where(jnp.abs(a[..., :1]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], jnp.float32),
                  jnp.array([0.0, 1.0, 0.0], jnp.float32))
    e1 = jnp.cross(a, h)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
    e2 = jnp.cross(a, e1)
    n = (ct[..., None] * a
         + (st * jnp.cos(phi))[..., None] * e1
         + (st * jnp.sin(phi))[..., None] * e2)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


# 16 global rows x 128 cols per window tile: the parity-packed hot path
# evaluates on a half grid where one (8, 128) Pallas tile covers 16 global
# rows — the window tile is the kernel tile's global footprint, aligned in
# GLOBAL coordinates so shard origins (multiples of 8 rows) see the same
# window assignment as the untiled solve.
#
# Straddle cost on tile shards (correctness unaffected — bitwise equality
# to the untiled solve is pinned by tests/test_tiles.py): a shard whose
# row origin is an ODD multiple of 8 has its (8, 128) packed Pallas tiles
# covering global rows 16k+8..16k+23, i.e. straddling TWO depth windows —
# the per-tile scan bbox then spans up to 2f of the range instead of f,
# halving the windowed draw's scan collapse on that shard. Shard heights
# that are multiples of 16 rows avoid it entirely (the production
# tile-sharded scheduler pads to 8*n_devices, so even-height shards
# already are).
WINDOW_TILE_ROWS = 16
WINDOW_TILE_COLS = 128


def random_depth(key, depth_min, depth_max, y, x,
                 tile_window: float = 0.0) -> jax.Array:
    """Per-pixel uniform depth draw (global-coordinate keyed).

    With ``tile_window = f`` in (0, 1], each (16, 128) GLOBAL pixel tile
    draws its OWN random subrange of fraction f of [depth_min, depth_max]
    and the per-pixel uniforms land inside it. Exploration still covers
    the full range (a fresh subrange every call/sweep), but the per-tile
    depth spread — and with it the Pallas kernel's per-tap scan window,
    which is a per-tile bbox — collapses by ~1/f. This is a documented
    DEVIATION from the reference's full-range per-pixel draw
    (GenerateRandomPlaneHypothesis, ACMMP.cu:235-241): the per-pixel
    marginal becomes trapezoidal (uniform in the interior, linear ramps
    of width f·range at the two ends — depths within f of the range
    edges are explored at reduced density in any single draw, though
    fresh windows every sweep still cover them). Quality gate:
    tools/rand_window_ab.py + QUALITY.md. 0 = exact reference semantics."""
    u = prng.uniform(key, y, x, 2)
    if tile_window:
        f = float(tile_window)
        ty = jnp.floor(jnp.asarray(y) * (1.0 / WINDOW_TILE_ROWS))
        tx = jnp.floor(jnp.asarray(x) * (1.0 / WINDOW_TILE_COLS))
        w0 = prng.uniform(key, ty, tx, 3) * (1.0 - f)
        u = w0 + u * f
    return u * (depth_max - depth_min) + depth_min


def random_plane(key, cam: geo.Camera, x, y, depth_min, depth_max,
                 tile_window: float = 0.0,
                 min_cos: float = 0.0) -> jax.Array:
    """GenerateRandomPlaneHypothesis (ACMMP.cu:235-241)."""
    kd, kn = jax.random.split(key)
    depth = random_depth(kd, depth_min, depth_max, y, x, tile_window)
    n = random_unit_normal(kn, cam, x, y, depth, min_cos=min_cos)
    return geo.plane_from_depth_normal(cam, x, y, depth, n)


def _euler_rotation(a1, a2, a3):
    """Rotation matrix rows per GeneratePerturbedNormal (ACMMP.cu:213-222)."""
    s1, s2, s3 = jnp.sin(a1), jnp.sin(a2), jnp.sin(a3)
    c1, c2, c3 = jnp.cos(a1), jnp.cos(a2), jnp.cos(a3)
    r = jnp.stack(
        [
            c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2,
            c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1,
            -s2, c2 * s1, c1 * c2,
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def perturbed_normal(key, cam: geo.Camera, x, y, normal, perturbation) -> jax.Array:
    """Rotate `normal` by three small random Euler angles; keep the original
    where the perturbed normal faces away from the camera."""
    angles = (prng.uniform_n(key, y, x, 4, 3) - 0.5) * perturbation
    R = _euler_rotation(angles[0], angles[1], angles[2])
    rotated = jnp.einsum("...ij,...j->...i", R, normal)
    vd = geo.view_direction(cam, x, y, 1.0)
    bad = jnp.sum(rotated * vd, axis=-1, keepdims=True) >= 0.0
    out = jnp.where(bad, normal, rotated)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
