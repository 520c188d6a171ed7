"""Golden-file round-trip tests for the dense-folder I/O contract."""

import numpy as np

from acmmp_tpu.io import (
    read_dmb, write_dmb, write_ply, read_ply,
    read_cam_txt, write_cam_txt, read_pair_txt, write_pair_txt,
)
from tests.util import look_at_camera

import pytest

pytestmark = pytest.mark.fast


def test_dmb_roundtrip_depth(tmp_path):
    arr = np.random.default_rng(0).normal(size=(7, 5)).astype(np.float32)
    p = tmp_path / "d.dmb"
    write_dmb(p, arr)
    out = read_dmb(p)
    np.testing.assert_array_equal(out, arr)
    # byte-level header check against the reference layout
    raw = p.read_bytes()
    header = np.frombuffer(raw[:16], dtype="<i4")
    np.testing.assert_array_equal(header, [1, 7, 5, 1])


def test_dmb_roundtrip_normals(tmp_path):
    arr = np.random.default_rng(1).normal(size=(4, 6, 3)).astype(np.float32)
    p = tmp_path / "n.dmb"
    write_dmb(p, arr)
    np.testing.assert_array_equal(read_dmb(p), arr)


def test_ply_roundtrip(tmp_path):
    n = 13
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    col = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    write_ply(p, pts, nrm, col)
    rp, rn, rc = read_ply(p)
    np.testing.assert_array_equal(rp, pts)
    np.testing.assert_array_equal(rn, nrm)
    np.testing.assert_array_equal(rc, col)


def test_ply_zeroes_nonfinite(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [np.nan, 0.0, 1.0]], dtype=np.float32)
    nrm = np.zeros((2, 3), np.float32)
    col = np.zeros((2, 3), np.uint8)
    p = tmp_path / "c.ply"
    write_ply(p, pts, nrm, col)
    rp, _, _ = read_ply(p)
    np.testing.assert_array_equal(rp[1], [0.0, 0.0, 0.0])


def test_cam_txt_roundtrip(tmp_path):
    cam = look_at_camera([1.0, -2.0, 0.5], [0.0, 0.0, 5.0],
                         depth_min=2.25, depth_max=9.5)
    p = tmp_path / "00000000_cam.txt"
    write_cam_txt(p, cam, depth_interval=0.05, depth_num=192)
    out = read_cam_txt(p)
    np.testing.assert_allclose(out.K, cam.K, rtol=1e-6)
    np.testing.assert_allclose(out.R, cam.R, rtol=1e-6)
    np.testing.assert_allclose(out.t, cam.t, rtol=1e-6)
    assert abs(out.depth_min - 2.25) < 1e-5
    assert abs(out.depth_max - 9.5) < 1e-5


def test_cam_txt_three_token_depth(tmp_path):
    # MVSNet-style (min, interval, num) depth line
    cam = look_at_camera([0, 0, 0], [0, 0, 1])
    p = tmp_path / "c.txt"
    write_cam_txt(p, cam)
    text = p.read_text()
    lines = text.strip().split("\n")
    lines[-1] = "1.0 0.5 11"
    p.write_text("\n".join(lines) + "\n")
    out = read_cam_txt(p)
    assert abs(out.depth_min - 1.0) < 1e-6
    assert abs(out.depth_max - 6.0) < 1e-6


def test_pair_txt_roundtrip(tmp_path):
    p = tmp_path / "pair.txt"
    pairs = [
        (0, [(1, 100.0), (2, 50.0), (3, 0.0)]),   # score<=0 dropped on read
        (1, [(0, 100.0)]),
        (2, [(0, 42.0), (1, 7.0)]),
    ]
    write_pair_txt(p, pairs)
    problems = read_pair_txt(p)
    assert [pr.ref_image_id for pr in problems] == [0, 1, 2]
    assert problems[0].src_image_ids == [1, 2]
    assert problems[1].src_image_ids == [0]
    assert problems[2].src_image_ids == [0, 1]
