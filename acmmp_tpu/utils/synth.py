"""Synthetic scenes with known geometry — used by tests, bench.py and the
driver entry point. The analog of the reference's hand-built fixtures
(python_scripts/make_alex.py:24-74 writes a minimal 2-camera dense folder);
here the scene is generated in memory with an analytic texture so every view
is photo-consistent by construction and PatchMatch must recover the exact
plane depth."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from acmmp_tpu.io.dense_folder import NumpyCamera


def look_at_camera(eye, target, up=(0.0, 1.0, 0.0), f=120.0, width=64,
                   height=48, depth_min=1.0, depth_max=20.0) -> NumpyCamera:
    """Build a world->cam pinhole camera looking from `eye` at `target`.
    Camera convention: +z forward, +x right, +y down (image coords)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, dtype=np.float64)
    right = np.cross(fwd, upv)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ eye
    K = np.array(
        [[f, 0.0, (width - 1) / 2.0],
         [0.0, f, (height - 1) / 2.0],
         [0.0, 0.0, 1.0]]
    )
    return NumpyCamera(
        K=K.astype(np.float32), R=R.astype(np.float32), t=t.astype(np.float32),
        depth_min=depth_min, depth_max=depth_max, width=width, height=height,
    )


def textured_relief_scene(
    n_views=4, width=96, height=64, base_z=5.0, amp=0.35, seed=0, f=140.0,
    depth_min=2.0, depth_max=10.0, spread=0.22, converge=False,
):
    """A smooth textured height-field surface z(x, y) = base_z +
    amp * (sin(1.1 x) * cos(0.9 y) + 0.5 sin(2.3 x + 1)) rendered
    analytically per view (Newton iteration along each ray), plus the
    ground-truth depth map of view 0.

    Non-planar geometry exercises propagation/refinement much harder than
    the plane fixture. Returns (images, cams, gt_depth0 [H, W])."""
    rng = np.random.default_rng(seed)
    n_waves = 24
    freqs = rng.uniform(0.5, 4.5, size=(n_waves, 2))
    phases = rng.uniform(0, 2 * np.pi, size=n_waves)
    amps = rng.uniform(0.3, 1.0, size=n_waves)

    def texture(xw, yw):
        val = np.zeros_like(xw)
        for k in range(n_waves):
            val += amps[k] * np.sin(freqs[k, 0] * xw + freqs[k, 1] * yw + phases[k])
        val = val - val.min()
        return 30.0 + 200.0 * val / max(val.max(), 1e-6)

    def z_surf(xw, yw):
        return base_z + amp * (np.sin(1.1 * xw) * np.cos(0.9 * yw)
                               + 0.5 * np.sin(2.3 * xw + 1.0))

    cams = []
    images = []
    gt_depth0 = None
    # `spread` widens the camera baseline (triangulation conditioning:
    # depth precision ~ z^2 / (f * pair_baseline) per pixel of disparity
    # error — the 0.22 default at base_z=5 is a weak ~2.5deg rig, fine
    # for solver fixtures; quality evaluation should use spread >= 1 with
    # `converge=True` so the cameras verge on the surface like a DTU rig)
    offsets = np.linspace(-spread, spread, n_views)
    for i in range(n_views):
        eye = np.array([offsets[i], 0.013 * i + 0.004 * (i % 2), 0.0])
        target = (np.array([0.0, 0.0, base_z]) if converge
                  else eye + np.array([0.0, 0.0, 1.0]))
        cam = look_at_camera(eye, target, f=f,
                             width=width, height=height,
                             depth_min=depth_min, depth_max=depth_max)
        xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                             np.arange(height, dtype=np.float64))
        dirs_cam = np.stack(
            [(xs - cam.K[0, 2]) / cam.K[0, 0],
             (ys - cam.K[1, 2]) / cam.K[1, 1],
             np.ones_like(xs)], axis=-1)
        dirs_world = dirs_cam @ cam.R
        center = -cam.R.T @ cam.t
        # Newton on s: center_z + s*dz - z_surf(x(s), y(s)) = 0
        s = (base_z - center[2]) / dirs_world[..., 2]
        for _ in range(25):
            p = center[None, None, :] + s[..., None] * dirs_world
            g = p[..., 2] - z_surf(p[..., 0], p[..., 1])
            # derivative along the ray (dominated by dz; relief slope small)
            s = s - 0.8 * g / dirs_world[..., 2]
        p = center[None, None, :] + s[..., None] * dirs_world
        images.append(texture(p[..., 0], p[..., 1]).astype(np.float32))
        cams.append(cam)
        if i == 0:
            # depth = z-coordinate in the camera frame
            gt_depth0 = ((p - center) @ cam.R.T)[..., 2].astype(np.float32)
    return images, cams, gt_depth0


def relief_gt_points(cams, width, height, base_z=5.0, amp=0.35,
                     samples=(960, 1280)):
    """Dense analytic ground-truth points of the relief surface
    (textured_relief_scene's z_surf law) over every view's frustum
    footprint — the GT side of the DTU-protocol quality artifacts
    (tools/fullscale_quality.py, tests). Per-view Newton ray casts,
    concatenated; eval reduce_points dedups the overlap."""

    def z_surf(xw, yw):
        return base_z + amp * (np.sin(1.1 * xw) * np.cos(0.9 * yw)
                               + 0.5 * np.sin(2.3 * xw + 1.0))

    gt_parts = []
    for cam in cams:
        xs = np.linspace(0, width - 1, samples[1])
        ys = np.linspace(0, height - 1, samples[0])
        Xg, Yg = np.meshgrid(xs, ys)
        dirs = np.stack([(Xg - cam.K[0, 2]) / cam.K[0, 0],
                         (Yg - cam.K[1, 2]) / cam.K[1, 1],
                         np.ones_like(Xg)], axis=-1)
        dirs_w = dirs @ cam.R
        center = -cam.R.T @ cam.t
        s = (base_z - center[2]) / dirs_w[..., 2]
        for _ in range(30):
            p = center[None, None] + s[..., None] * dirs_w
            g = p[..., 2] - z_surf(p[..., 0], p[..., 1])
            s = s - 0.8 * g / dirs_w[..., 2]
        gt_parts.append(
            (center[None, None] + s[..., None] * dirs_w).reshape(-1, 3))
    return np.concatenate(gt_parts)


def textured_plane_scene(
    n_views=3, width=64, height=48, plane_z=5.0, seed=0, f=120.0,
    depth_min=2.0, depth_max=10.0,
) -> Tuple[List[np.ndarray], List[NumpyCamera], float]:
    """A fronto-parallel world plane z=plane_z with an analytic smooth random
    texture, viewed by n_views cameras near the origin looking down +z.
    Returns (images, cams, plane_z)."""
    rng = np.random.default_rng(seed)
    n_waves = 24
    freqs = rng.uniform(0.3, 3.5, size=(n_waves, 2))
    phases = rng.uniform(0, 2 * np.pi, size=n_waves)
    amps = rng.uniform(0.3, 1.0, size=n_waves)

    def texture(xw, yw):
        val = np.zeros_like(xw)
        for k in range(n_waves):
            val += amps[k] * np.sin(freqs[k, 0] * xw + freqs[k, 1] * yw + phases[k])
        val = val - val.min()
        return 30.0 + 200.0 * val / max(val.max(), 1e-6)

    cams: List[NumpyCamera] = []
    images: List[np.ndarray] = []
    offsets = np.linspace(-0.25, 0.25, n_views)
    for i in range(n_views):
        # distinct, small y offsets: no camera pair is exactly axis-aligned,
        # so no source coordinate sits on a truncation tie across the image
        eye = np.array([offsets[i], 0.013 * i + 0.004 * (i % 2), 0.0])
        cam = look_at_camera(eye, eye + np.array([0.0, 0.0, 1.0]), f=f,
                             width=width, height=height,
                             depth_min=depth_min, depth_max=depth_max)
        xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                             np.arange(height, dtype=np.float64))
        dirs_cam = np.stack(
            [(xs - cam.K[0, 2]) / cam.K[0, 0],
             (ys - cam.K[1, 2]) / cam.K[1, 1],
             np.ones_like(xs)], axis=-1)
        dirs_world = dirs_cam @ cam.R
        center = -cam.R.T @ cam.t
        s = (plane_z - center[2]) / dirs_world[..., 2]
        pw = center[None, None, :] + s[..., None] * dirs_world
        images.append(texture(pw[..., 0], pw[..., 1]).astype(np.float32))
        cams.append(cam)
    return images, cams, plane_z
