"""Counter-based random plane-hypothesis sampling.

The reference seeds curand with wall-clock (``curand_init(clock64(), ...)``,
src/ACMMP.cu:624) making runs non-reproducible by design; here every draw
comes from a jax.random key threaded through the solver, so runs are exactly
reproducible. Distributions match the reference:
  * random unit normals are uniform on the sphere, flipped to face the
    camera (GenerateRandomNormal, ACMMP.cu:170-196 — Marsaglia sampling and
    a normalized Gaussian draw give the same law);
  * perturbed normals rotate by three independent U(-p/2, p/2) Euler angles
    and keep the original when the result faces away
    (GeneratePerturbedNormal, ACMMP.cu:198-233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmmp_tpu.core import geometry as geo


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
    reference law (and the reference's exact RNG stream shape)."""
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    if not min_cos:
        v = jax.random.normal(key, shape + (3,), dtype=jnp.float32)
        n = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return geo.face_camera(cam, x, y, depth, n)
    c = float(min_cos)
    a = -geo.view_direction(cam, x, y, depth)          # cap axis (unit)
    ku, kphi = jax.random.split(key)
    # uniform on the cap: cos(theta) ~ U(c, 1), phi ~ U(0, 2pi)
    ct = jax.random.uniform(ku, shape, jnp.float32, c, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = jax.random.uniform(kphi, shape, jnp.float32, 0.0, 2.0 * jnp.pi)
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


def random_depth(key, depth_min, depth_max, shape,
                 tile_window: float = 0.0) -> jax.Array:
    """Per-pixel uniform depth draw.

    With ``tile_window = f`` in (0, 1], each (8, 128) grid tile draws its
    OWN random subrange of fraction f of [depth_min, depth_max] and the
    per-pixel uniforms land inside it. Exploration still covers the full
    range (a fresh subrange every call/sweep), but the per-tile depth
    spread — and with it the Pallas kernel's per-tap scan window, which
    is a per-tile bbox — collapses by ~1/f. This is a documented
    DEVIATION from the reference's full-range per-pixel draw
    (GenerateRandomPlaneHypothesis, ACMMP.cu:235-241): the per-pixel
    marginal becomes trapezoidal (uniform in the interior, linear ramps
    of width f·range at the two ends — depths within f of the range
    edges are explored at reduced density in any single draw, though
    fresh windows every sweep still cover them). Quality gate:
    tools/rand_window_ab.py. 0 (default) = exact reference semantics."""
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    if tile_window:
        f = float(tile_window)
        th = -(-shape[0] // 8)
        tw = -(-shape[1] // 128)
        w0 = jax.random.uniform(jax.random.fold_in(key, 0x7717),
                                (th, tw), dtype=jnp.float32,
                                minval=0.0, maxval=1.0 - f)
        w0 = jnp.repeat(jnp.repeat(w0, 8, axis=0), 128, axis=1)
        u = w0[:shape[0], :shape[1]] + u * f
    return u * (depth_max - depth_min) + depth_min


def random_plane(key, cam: geo.Camera, x, y, depth_min, depth_max,
                 tile_window: float = 0.0,
                 min_cos: float = 0.0) -> jax.Array:
    """GenerateRandomPlaneHypothesis (ACMMP.cu:235-241)."""
    kd, kn = jax.random.split(key)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    depth = random_depth(kd, depth_min, depth_max, shape, tile_window)
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
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    angles = (jax.random.uniform(key, shape + (3,), dtype=jnp.float32) - 0.5) * perturbation
    R = _euler_rotation(angles[..., 0], angles[..., 1], angles[..., 2])
    rotated = jnp.einsum("...ij,...j->...i", R, normal)
    vd = geo.view_direction(cam, x, y, 1.0)
    bad = jnp.sum(rotated * vd, axis=-1, keepdims=True) >= 0.0
    out = jnp.where(bad, normal, rotated)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
