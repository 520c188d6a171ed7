"""Camera geometry — the single implementation used everywhere.

The reference duplicates this math three times (host: src/ACMMP.cpp:204-262,
device: src/ACMMP.cu:86-168,262-351,480-516, pipeline:
src/acmmp_definitions.cpp:44-89); here it exists once, written as pure,
broadcastable jnp functions so it serves host code, the jitted solver and
the Pallas kernels alike.

Conventions (matching the reference's on-disk cam.txt contract):
  * ``R`` rotates world -> camera, ``t`` is the translation of that map:
    ``x_cam = R @ X_world + t``.
  * Camera center in world coordinates: ``C = -R^T t``.
  * Plane hypotheses are 4-vectors ``(nx, ny, nz, w)`` in the *reference
    camera frame* with ``n . X + w = 0`` for points X on the plane,
    i.e. ``w`` is minus the signed distance of the plane to the origin.
  * Pixel coordinates are zero-based; a float sample coordinate ``x`` maps
    to image pixels ``floor(x)..floor(x)+1`` with bilinear weights
    ``frac(x)`` (identical to CUDA ``tex2D(img, x + 0.5, y + 0.5)`` with
    unnormalized coordinates, which the reference uses throughout).
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Camera math is tiny (3x3) but precision-critical: TPU matmuls default to
# reduced precision, which costs ~0.2 px in plane-induced homographies. All
# einsums below therefore request full f32 precision explicitly.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """A pinhole camera (batchable: all fields broadcast over leading dims).

    Mirrors struct Camera (src/acmmp_definitions.h:47-55); width/height are
    carried as float arrays so a stacked, padded view batch keeps its true
    per-view bounds available inside jit.
    """

    K: jax.Array          # (..., 3, 3)
    R: jax.Array          # (..., 3, 3) world -> cam
    t: jax.Array          # (..., 3)
    width: jax.Array      # (...,) true image width in px
    height: jax.Array     # (...,) true image height in px
    depth_min: jax.Array  # (...,)
    depth_max: jax.Array  # (...,)

    @staticmethod
    def from_numpy(K, R, t, width, height, depth_min, depth_max) -> "Camera":
        f = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return Camera(f(K), f(R), f(t), f(width), f(height), f(depth_min), f(depth_max))

    def __getitem__(self, idx) -> "Camera":
        return jax.tree.map(lambda x: x[idx], self)

    def scaled(self, scale_x, scale_y, new_width, new_height) -> "Camera":
        """Rescale intrinsics for a resized image (ACMMP.cpp:592-597)."""
        K = np.array(self.K, dtype=np.float32).copy()
        K[..., 0, :] *= scale_x
        K[..., 1, :] *= scale_y
        return Camera.from_numpy(
            K, self.R, self.t, new_width, new_height, self.depth_min, self.depth_max
        )


def stack_cameras(cams) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


# ---------------------------------------------------------------------------
# basic transforms
# ---------------------------------------------------------------------------

def camera_center(cam: Camera) -> jax.Array:
    """World-space camera center C = -R^T t (ACMMP.cpp:219-222)."""
    return -_einsum("...ji,...j->...i", cam.R, cam.t)


def backproject(cam: Camera, x, y, depth):
    """Pixel (x, y) at `depth` -> point in this camera's frame
    (Get3DPoint, ACMMP.cu:123-128). Broadcasts over pixel arrays."""
    K = cam.K
    fx, cx = K[..., 0, 0], K[..., 0, 2]
    fy, cy = K[..., 1, 1], K[..., 1, 2]
    X = depth * (x - cx) / fx
    Y = depth * (y - cy) / fy
    return jnp.stack(jnp.broadcast_arrays(X, Y, depth), axis=-1)


def cam_to_world(cam: Camera, X_cam: jax.Array) -> jax.Array:
    """Camera-frame point -> world (Get3DPointonWorld_cu, ACMMP.cu:480-504)."""
    return _einsum("...ji,...j->...i", cam.R, X_cam - cam.t)


def world_point(cam: Camera, x, y, depth) -> jax.Array:
    return cam_to_world(cam, backproject(cam, x, y, depth))


def project(cam: Camera, X_world: jax.Array):
    """World point -> (pixel xy, depth) (ProjectonCamera_cu, ACMMP.cu:506-516)."""
    x_cam = _einsum("...ij,...j->...i", cam.R, X_world) + cam.t
    h = _einsum("...ij,...j->...i", cam.K, x_cam)
    depth = h[..., 2]
    return h[..., :2] / depth[..., None], depth


def view_direction(cam: Camera, x, y, depth=1.0) -> jax.Array:
    """Unit ray through pixel (GetViewDirection, ACMMP.cu:130-142)."""
    X = backproject(cam, x, y, jnp.asarray(depth, jnp.float32))
    return X / jnp.linalg.norm(X, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# plane hypotheses
# ---------------------------------------------------------------------------

def dist_to_origin(cam: Camera, x, y, depth, normal) -> jax.Array:
    """Plane offset w for a plane with `normal` through the point at (x,y,depth)
    (GetDistance2Origin, ACMMP.cu:144-149)."""
    X = backproject(cam, x, y, depth)
    return -jnp.sum(normal * X, axis=-1)


def depth_from_plane(cam: Camera, plane: jax.Array, x, y) -> jax.Array:
    """Depth of the plane at pixel (x, y)
    (ComputeDepthfromPlaneHypothesis, ACMMP.cu:163-168)."""
    K = cam.K
    fx, cx = K[..., 0, 0], K[..., 0, 2]
    fy, cy = K[..., 1, 1], K[..., 1, 2]
    denom = (
        (x - cx) * plane[..., 0]
        + (fx / fy) * (y - cy) * plane[..., 1]
        + fx * plane[..., 2]
    )
    return -plane[..., 3] * fx / denom


def plane_from_depth_normal(cam: Camera, x, y, depth, normal) -> jax.Array:
    """(depth, cam-frame normal) -> plane 4-vector."""
    w = dist_to_origin(cam, x, y, depth, normal)
    return jnp.concatenate(
        [normal, w[..., None]], axis=-1
    )


def normal_cam_to_world(cam: Camera, n: jax.Array) -> jax.Array:
    """(TransformNormal, ACMMP.cu:333-341): n_world = R^T n_cam."""
    return _einsum("...ji,...j->...i", cam.R, n)


def normal_world_to_cam(cam: Camera, n: jax.Array) -> jax.Array:
    """(TransformNormal2RefCam, ACMMP.cu:343-351): n_cam = R n_world."""
    return _einsum("...ij,...j->...i", cam.R, n)


def face_camera(cam: Camera, x, y, depth, normal) -> jax.Array:
    """Flip `normal` so it faces the camera at pixel (x,y)
    (GenerateRandomNormal tail, ACMMP.cu:187-194)."""
    vd = view_direction(cam, x, y, depth)
    dot = jnp.sum(normal * vd, axis=-1, keepdims=True)
    return jnp.where(dot > 0.0, -normal, normal)


# ---------------------------------------------------------------------------
# plane-induced homography
# ---------------------------------------------------------------------------

def homography_coeffs(ref_cam: Camera, src_cam: Camera):
    """Per view-pair constants of the plane-induced homography.

    The reference recomputes the full 3x3 homography per pixel per hypothesis
    (ComputeHomography, ACMMP.cu:262-322). We factor it: with
    ``R_rel = R_s R_r^T`` and ``t_rel = R_s (C_r - C_s)``,

        H(plane) = K_s (R_rel - t_rel n^T / w) K_r^{-1}
                 = A - outer(B, K_r^{-T} n) / w

    so per hypothesis only the rank-1 term changes. Returns
    (A (...,3,3), B (...,3), Kr_invT (...,3,3)).
    """
    R_rel = _einsum("...ij,...kj->...ik", src_cam.R, ref_cam.R)
    C_rel = camera_center(ref_cam) - camera_center(src_cam)
    t_rel = _einsum("...ij,...j->...i", src_cam.R, C_rel)
    Kr_inv = jnp.linalg.inv(ref_cam.K)
    A = _einsum("...ij,...jk,...kl->...il", src_cam.K, R_rel, Kr_inv)
    B = _einsum("...ij,...j->...i", src_cam.K, t_rel)
    Kr_invT = jnp.swapaxes(Kr_inv, -1, -2)
    return A, B, Kr_invT


def plane_homography(A, B, Kr_invT, plane):
    """Assemble H for plane hypotheses (broadcasts: plane (...,4) against
    per-pair A/B/Kr_invT)."""
    m = _einsum("...ij,...j->...i", Kr_invT, plane[..., :3])
    return A - B[..., :, None] * m[..., None, :] / plane[..., 3, None, None]


def apply_homography(H, x, y):
    """Map pixel (x, y) through H (ComputeCorrespondingPoint, ACMMP.cu:324-331).
    H: (..., 3, 3); x, y broadcastable against H's batch dims."""
    px = H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]
    py = H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]
    pz = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    return px / pz, py / pz


# ---------------------------------------------------------------------------
# image sampling
# ---------------------------------------------------------------------------

def bilinear_sample(img: jax.Array, x, y, width=None, height=None) -> jax.Array:
    """Bilinear sample `img` (H, W) at float pixel coords, clamped to the
    true bounds (the reference uses CUDA wrap addressing, but every sampled
    center is bounds-checked before use; clamping only differs on the
    out-of-window taps of border pixels — see DEVIATIONS.md)."""
    H, W = img.shape[-2], img.shape[-1]
    w_max = (width if width is not None else W) - 1.0
    h_max = (height if height is not None else H) - 1.0
    x = jnp.clip(x, 0.0, w_max)
    y = jnp.clip(y, 0.0, h_max)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, jnp.asarray(w_max, jnp.int32))
    y1 = jnp.minimum(y0 + 1, jnp.asarray(h_max, jnp.int32))
    v00 = img[..., y0, x0]
    v01 = img[..., y0, x1]
    v10 = img[..., y1, x0]
    v11 = img[..., y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def nearest_sample(img: jax.Array, x, y, width=None, height=None) -> jax.Array:
    """Truncate-to-int sample (the reference reads depth maps as
    ``tex2D(depth, (int)x + 0.5, (int)y + 0.5)``, ACMMP.cu:528)."""
    H, W = img.shape[-2], img.shape[-1]
    w_max = (width if width is not None else W) - 1
    h_max = (height if height is not None else H) - 1
    xi = jnp.clip(x.astype(jnp.int32), 0, jnp.asarray(w_max, jnp.int32))
    yi = jnp.clip(y.astype(jnp.int32), 0, jnp.asarray(h_max, jnp.int32))
    return img[..., yi, xi]


def pixel_grid(height: int, width: int):
    """Integer pixel coordinate grids (x: columns, y: rows), float32."""
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    return x, y


def angle_between(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Angle between unit vectors, NaN-safe (GetAngle, ACMMP.cpp:253-262)."""
    dot = jnp.sum(v1 * v2, axis=-1)
    ang = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    return jnp.where(jnp.isnan(ang), 0.0, ang)
