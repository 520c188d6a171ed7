"""Native host-runtime library: builds with g++ and matches the numpy I/O
byte-for-byte; resize matches OpenCV's convention."""

import os

import numpy as np
import pytest

from acmmp_tpu import native
from acmmp_tpu.io.dmb import read_dmb, write_dmb
from acmmp_tpu.io.ply import read_ply, write_ply

pytestmark = pytest.mark.fast

requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable (no g++?)")


@requires_native
def test_dmb_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(17, 23), (5, 7, 3)]:
        arr = rng.normal(size=shape).astype(np.float32)
        p_native = str(tmp_path / "n.dmb")
        assert native.write_dmb_native(p_native, arr)
        # python reader reads native file
        got = native.read_dmb_native(p_native)
        np.testing.assert_array_equal(got, arr)
        # byte-identical to the numpy writer
        p_py = str(tmp_path / "p.dmb")
        os.environ["ACMMP_NO_NATIVE"] = "1"
        try:
            write_dmb(p_py, arr)
        finally:
            del os.environ["ACMMP_NO_NATIVE"]
        assert open(p_native, "rb").read() == open(p_py, "rb").read()


@requires_native
def test_ply_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    n = 1000
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[5] = np.inf  # non-finite zeroing path
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    col = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    p_native = str(tmp_path / "n.ply")
    assert native.write_ply_native(p_native, pts, nrm, col)
    p_py = str(tmp_path / "p.ply")
    os.environ["ACMMP_NO_NATIVE"] = "1"
    try:
        write_ply(p_py, pts, nrm, col)
    finally:
        del os.environ["ACMMP_NO_NATIVE"]
    a, b = open(p_native, "rb").read(), open(p_py, "rb").read()
    assert a == b
    rpts, rnrm, rcol = read_ply(p_native)
    assert rpts.shape == (n, 3)
    np.testing.assert_array_equal(rcol, col)
    assert np.all(rpts[5] == 0.0)


@requires_native
def test_resize_convention():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(37, 53)).astype(np.float32)
    ours = native.resize_bilinear_native(img, 21, 29)
    ref = cv2.resize(img, (29, 21), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-3)

    rgb = rng.integers(0, 255, size=(37, 53, 3)).astype(np.uint8)
    ours = native.resize_bilinear_native(rgb, 74, 106)
    ref = cv2.resize(rgb, (106, 74), interpolation=cv2.INTER_LINEAR)
    assert (np.abs(ours.astype(int) - ref.astype(int)) <= 1).mean() > 0.99
