"""COLMAP ingestion: synthetic sparse model -> dense-folder contract."""

import os

import numpy as np
from PIL import Image as PILImage

from acmmp_tpu.io.colmap import convert_colmap, qvec2rotmat, rotmat2qvec
from acmmp_tpu.io.dense_folder import read_cam_txt, read_pair_txt
from tests.util import textured_plane_scene

import pytest

pytestmark = pytest.mark.fast


def test_qvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        q2 = rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-9)


def _write_colmap_model(root, images, cams, plane_z):
    """Text-format COLMAP model of the synthetic plane scene with sparse
    points sampled on the plane."""
    sparse = os.path.join(root, "sparse")
    imdir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(imdir, exist_ok=True)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1.5, 1.5, 60), rng.uniform(-1.0, 1.0, 60),
                    np.full(60, plane_z)], axis=1)

    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        for i, cam in enumerate(cams):
            f.write(f"{i + 1} PINHOLE {cam.width} {cam.height} "
                    f"{cam.K[0, 0]} {cam.K[1, 1]} {cam.K[0, 2]} {cam.K[1, 2]}\n")

    # visibility: all points in all views (valid for this rig)
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        for i, cam in enumerate(cams):
            q = rotmat2qvec(cam.R.astype(np.float64))
            t = cam.t
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {i + 1} im{i}.png\n")
            obs = " ".join(f"{p[0]} {p[1]} {k + 1}"
                           for k, p in enumerate(pts[:, :2]))
            f.write(obs + "\n")

    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        for k, p in enumerate(pts):
            track = " ".join(f"{i + 1} {k}" for i in range(len(cams)))
            f.write(f"{k + 1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 {track}\n")

    for i, img in enumerate(images):
        PILImage.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(imdir, f"im{i}.png"))
    return pts


def test_convert_colmap(tmp_path):
    images, cams, plane_z = textured_plane_scene(n_views=3)
    root = str(tmp_path / "colmap")
    save = str(tmp_path / "dense")
    _write_colmap_model(root, images, cams, plane_z)
    convert_colmap(root, save, max_d=192)

    problems = read_pair_txt(os.path.join(save, "pair.txt"))
    assert len(problems) == 3
    assert all(len(p.src_image_ids) >= 1 for p in problems)

    cam0 = read_cam_txt(os.path.join(save, "cams", "00000000_cam.txt"))
    np.testing.assert_allclose(cam0.K, cams[0].K, rtol=1e-5)
    np.testing.assert_allclose(cam0.R, cams[0].R, rtol=1e-4, atol=1e-5)
    # plane at z=5 viewed from z~0: relaxed depth range straddles it
    assert cam0.depth_min < 5.0 < cam0.depth_max
    assert os.path.exists(os.path.join(save, "images", "00000000.jpg"))


def test_convert_colmap_inverse_depth_steps(tmp_path):
    images, cams, plane_z = textured_plane_scene(n_views=3)
    root = str(tmp_path / "colmap")
    save = str(tmp_path / "dense2")
    _write_colmap_model(root, images, cams, plane_z)
    convert_colmap(root, save, max_d=0)  # derive step count from geometry
    with open(os.path.join(save, "cams", "00000000_cam.txt")) as f:
        depth_line = f.read().split("\n")[-2].split()
    assert float(depth_line[2]) > 1.0  # a sensible positive step count
