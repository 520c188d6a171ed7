"""Pallas coherent 2D sampler vs the jnp oracle (interpret mode on CPU).

The sampler moves whole f32 words — no arithmetic — so every test pins
EXACT equality, including the end-to-end fusion runs (the fusion kernels
are bitwise-independent of the sample backend by construction: lanes
outside `inb & rv` read zeros and every consumer gates them out).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from acmmp_tpu.ops.pallas_sample import gather2d_pallas
from acmmp_tpu.ops.sample import gather2d


def _oracle_np(maps, rr, cc, valid):
    out = np.zeros(maps.shape[:2] + rr.shape[1:], np.float32)
    V, C = maps.shape[:2]
    for v in range(V):
        ok = valid[v]
        out[v, :, ok] = maps[v, :, rr[v][ok], cc[v][ok]]
    return out


def _run(maps, rr, cc, valid):
    with pltpu.force_tpu_interpret_mode():
        got = gather2d_pallas(jnp.asarray(maps), jnp.asarray(rr),
                              jnp.asarray(cc), jnp.asarray(valid))
    return np.asarray(got)


def test_coherent_field_exact():
    rng = np.random.default_rng(0)
    V, C, Hs, Ws = 2, 3, 32, 128
    H, W = 16, 128
    maps = rng.normal(size=(V, C, Hs, Ws)).astype(np.float32)
    # coherent: a smooth affine index field, like a projected depth map
    y, x = np.mgrid[:H, :W]
    rr = np.clip((0.9 * y + 0.02 * x + 3).astype(np.int32), 0, Hs - 1)
    cc = np.clip((0.97 * x + 0.1 * y + 1).astype(np.int32), 0, Ws - 1)
    rr = np.broadcast_to(rr, (V, H, W)).copy()
    cc = np.broadcast_to(cc, (V, H, W)).copy()
    valid = np.ones((V, H, W), bool)
    got = _run(maps, rr, cc, valid)
    np.testing.assert_array_equal(got, _oracle_np(maps, rr, cc, valid))
    # the jnp oracle agrees too (the dispatcher's other backend)
    np.testing.assert_array_equal(
        np.asarray(gather2d(jnp.asarray(maps), jnp.asarray(rr),
                            jnp.asarray(cc), jnp.asarray(valid))),
        got)


def test_scattered_indices_exact():
    """Fully random indices — worst-case window, still exact."""
    rng = np.random.default_rng(1)
    V, C, Hs, Ws = 2, 2, 40, 256
    H, W = 8, 128
    maps = rng.normal(size=(V, C, Hs, Ws)).astype(np.float32)
    rr = rng.integers(0, Hs, (V, H, W)).astype(np.int32)
    cc = rng.integers(0, Ws, (V, H, W)).astype(np.int32)
    valid = np.ones((V, H, W), bool)
    got = _run(maps, rr, cc, valid)
    np.testing.assert_array_equal(got, _oracle_np(maps, rr, cc, valid))


def test_invalid_lanes_read_zero_with_garbage_indices():
    """Invalid lanes may hold garbage (e.g. NaN->int casts): they must
    return 0 and must not affect valid lanes."""
    rng = np.random.default_rng(2)
    V, C, Hs, Ws = 1, 2, 24, 128
    H, W = 8, 128
    maps = rng.normal(size=(V, C, Hs, Ws)).astype(np.float32)
    rr = np.clip(rng.integers(8, 16, (V, H, W)), 0, Hs - 1).astype(np.int32)
    cc = rng.integers(0, Ws, (V, H, W)).astype(np.int32)
    valid = rng.random((V, H, W)) < 0.7
    rr2, cc2 = rr.copy(), cc.copy()
    rr2[~valid] = np.int32(-2147483648)       # NaN cast garbage
    cc2[~valid] = np.int32(2147483647)
    got = _run(maps, rr2, cc2, valid)
    np.testing.assert_array_equal(got, _oracle_np(maps, rr, cc, valid))
    assert (got[:, :, ~valid[0]] == 0.0).all()


def test_all_invalid_tile_is_zero():
    maps = np.ones((1, 1, 16, 128), np.float32)
    rr = np.zeros((1, 8, 128), np.int32)
    cc = np.zeros((1, 8, 128), np.int32)
    valid = np.zeros((1, 8, 128), bool)
    got = _run(maps, rr, cc, valid)
    np.testing.assert_array_equal(got, 0.0)


def test_unaligned_shapes_padded():
    """Source and index grids that aren't (8,128)-aligned are padded
    internally and cropped back."""
    rng = np.random.default_rng(3)
    V, C, Hs, Ws = 2, 4, 21, 100
    H, W = 13, 77
    maps = rng.normal(size=(V, C, Hs, Ws)).astype(np.float32)
    rr = rng.integers(0, Hs, (V, H, W)).astype(np.int32)
    cc = rng.integers(0, Ws, (V, H, W)).astype(np.int32)
    valid = rng.random((V, H, W)) < 0.9
    got = _run(maps, rr, cc, valid)
    assert got.shape == (V, C, H, W)
    np.testing.assert_array_equal(
        got, _oracle_np(maps, np.where(valid, rr, 0),
                        np.where(valid, cc, 0), valid))


def _plane_views(n_views=4, w=64, h=48, second=False):
    from acmmp_tpu.engine.fusion import FusionView
    from acmmp_tpu.io.dense_folder import Problem
    from acmmp_tpu.utils.synth import textured_plane_scene

    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=w, height=h)
    views = {}
    for i in range(n_views):
        depth = np.full((h, w), plane_z, np.float32)
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = -1.0
        img = np.stack([images[i]] * 3, axis=-1).astype(np.float32)
        kw = {}
        if second:
            kw = dict(depth1=depth * 1.002, normal1=normal.copy())
        views[i] = FusionView(img, cams[i], depth, normal, **kw)
    problems = [Problem(ref_image_id=i,
                        src_image_ids=[j for j in range(n_views) if j != i])
                for i in range(n_views)]
    return views, problems, plane_z


def test_fusion_backends_bitwise_equal_plain():
    from acmmp_tpu.config import FusionParams
    from acmmp_tpu.engine.fusion import fuse_views

    views, problems, plane_z = _plane_views()
    ref = fuse_views(views, problems,
                     FusionParams(num_consistent_thresh=2,
                                  sample_backend="jnp"))
    views2, problems2, _ = _plane_views()
    with pltpu.force_tpu_interpret_mode():
        got = fuse_views(views2, problems2,
                         FusionParams(num_consistent_thresh=2,
                                      sample_backend="pallas"))
    assert len(ref[0]) > 0
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.median(np.abs(ref[0][:, 2] - plane_z)) < 0.05


def test_fusion_backends_bitwise_equal_dual():
    from acmmp_tpu.config import FusionParams
    from acmmp_tpu.engine.fusion import fuse_views

    fp = FusionParams(num_consistent_thresh=2, sample_backend="jnp")
    views, problems, _ = _plane_views(second=True)
    ref = fuse_views(views, problems, fp, prior_aware=True,
                     single_match_penalty=1)
    views2, problems2, _ = _plane_views(second=True)
    with pltpu.force_tpu_interpret_mode():
        got = fuse_views(
            views2, problems2,
            FusionParams(num_consistent_thresh=2, sample_backend="pallas"),
            prior_aware=True, single_match_penalty=1)
    assert len(ref[0]) > 0
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
