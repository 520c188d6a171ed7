"""View-parallel sharding tests on the virtual 8-device CPU mesh.

Checks (a) the sharded photometric pass matches the unsharded solve
bitwise, and (b) the geometric pass's all-gather + local index gather
builds the same src_depths a single-chip run would."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch
from acmmp_tpu.parallel import (
    make_view_mesh, pad_to_multiple, stack_solver_inputs,
    view_sharded_geometric_solve, view_sharded_solve,
)

from .util import textured_plane_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) platform")


PARAMS = PatchMatchParams(max_iterations=1)


def _make_batch(n_views=3, width=64, height=32):
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=width, height=height)
    problems, src_idx = [], []
    for i in range(n_views):
        srcs = [j for j in range(n_views) if j != i]
        problems.append(build_solver_inputs(
            images[i], [images[j] for j in srcs], cams[i],
            [cams[j] for j in srcs], PARAMS))
        src_idx.append(srcs)
    batch = stack_solver_inputs(problems)
    keys = jax.random.split(jax.random.key(7), n_views)
    return batch, keys, np.asarray(src_idx, np.int32), problems, plane_z


def test_sharded_solve_matches_single_device():
    n_dev = len(jax.devices())
    batch, keys, _, problems, _ = _make_batch()
    pbatch, pkeys, valid = pad_to_multiple(batch, keys, n_dev)
    mesh = make_view_mesh()
    out = view_sharded_solve(mesh, pbatch, pkeys, PARAMS, Mode())

    # reference: the identical vmapped program on one device. Sharding must
    # not change the algorithm; a handful of pixels may flip their discrete
    # argmin choices because XLA fuses differently at local batch 1 vs 8,
    # so assert near-equality rather than bitwise identity.
    ref = jax.jit(jax.vmap(
        lambda i, k: run_patchmatch(i, k, PARAMS, Mode())))(pbatch, pkeys)
    a, b = np.asarray(out.depth), np.asarray(ref.depth)
    mismatch = np.abs(a - b) > 1e-3 * np.abs(b)
    assert mismatch.mean() < 0.02, f"{mismatch.mean():.4f} of pixels differ"
    n = len(problems)
    assert bool(np.all(np.asarray(valid[:n])))
    assert not np.any(np.asarray(valid[n:]))


def test_sharded_geometric_matches_single_device():
    n_dev = len(jax.devices())
    mesh = make_view_mesh()
    batch, keys, src_idx, problems, _ = _make_batch()
    n = keys.shape[0]

    pbatch, pkeys, _ = pad_to_multiple(batch, keys, n_dev)
    out = view_sharded_solve(mesh, pbatch, pkeys, PARAMS, Mode())

    Hs, Ws = pbatch.src_imgs.shape[-2:]
    depth_maps = out.depth[:, :Hs, :Ws]
    geom_batch = pbatch._replace(
        init_depth=out.depth, init_normal_world=out.normal_world,
        init_cost=out.cost)
    pad = pkeys.shape[0] - n
    psrc = np.concatenate(
        [src_idx, np.broadcast_to(src_idx[-1:], (pad,) + src_idx.shape[1:])])
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(pkeys)
    out2 = view_sharded_geometric_solve(
        mesh, geom_batch, depth_maps, jnp.asarray(psrc), keys2, PARAMS,
        Mode(geom_consistency=True))

    # unsharded reference: same vmapped program with the gather done in numpy
    gb = geom_batch._replace(src_depths=jnp.asarray(
        np.asarray(depth_maps)[psrc]))
    ref = jax.jit(jax.vmap(
        lambda i, k: run_patchmatch(i, k, PARAMS,
                                    Mode(geom_consistency=True))))(gb, keys2)
    a, b = np.asarray(out2.depth), np.asarray(ref.depth)
    mismatch = np.abs(a - b) > 1e-3 * np.abs(b)
    assert mismatch.mean() < 0.02, f"{mismatch.mean():.4f} of pixels differ"
    assert np.isfinite(a).all()


def test_gather_src_depths_matches_numpy():
    """The production geometric collective: all-gather + local index gather
    must equal a plain numpy fancy-index."""
    from acmmp_tpu.parallel.sharding import gather_src_depths

    n_dev = len(jax.devices())
    mesh = make_view_mesh()
    rng = np.random.default_rng(3)
    N = 2 * n_dev
    B = n_dev
    maps = rng.uniform(1.0, 9.0, (N, 16, 128)).astype(np.float32)
    si = rng.integers(0, N, (B, 5)).astype(np.int32)
    got = np.asarray(gather_src_depths(mesh, jnp.asarray(maps),
                                       jnp.asarray(si)))
    np.testing.assert_array_equal(got, maps[si])


def test_sharded_fusion_groups_match_sequential():
    """Group-sharded fusion equals sequential fusion when the greedy
    consumption is disjoint (fusion is deterministic — no RNG — so with
    non-overlapping masks the group barrier changes nothing)."""
    from acmmp_tpu.config import FusionParams
    from acmmp_tpu.engine.fusion import FusionView, fuse_views
    from acmmp_tpu.io.dense_folder import Problem
    from acmmp_tpu.utils.synth import textured_plane_scene

    n_views = 4
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=64, height=48)
    fp = FusionParams(num_consistent_thresh=2)

    def make_views():
        views = {}
        for i in range(n_views):
            depth = np.full((48, 64), plane_z, np.float32)
            normal = np.zeros((48, 64, 3), np.float32)
            normal[..., 2] = -1.0
            img = np.stack([images[i]] * 3, axis=-1).astype(np.float32)
            views[i] = FusionView(img, cams[i], depth, normal)
        return views

    problems = [Problem(ref_image_id=i,
                        src_image_ids=[j for j in range(n_views) if j != i])
                for i in range(n_views)]

    seq = fuse_views(make_views(), problems, fp)
    mesh = make_view_mesh()
    shd = fuse_views(make_views(), problems, fp, mesh=mesh)
    # the sharded path runs the heavy per-view scoring on chips and
    # replays the sequential greedy-consumption chain on the host, so the
    # fused cloud is the sequential cloud (up to fusion-level float
    # reassociation at threshold pixels — none on this fixture)
    assert len(seq[0]) > 0
    np.testing.assert_array_equal(np.asarray(seq[0]), np.asarray(shd[0]))
    np.testing.assert_array_equal(np.asarray(seq[1]), np.asarray(shd[1]))
    assert np.median(np.abs(seq[0][:, 2] - plane_z)) < 0.05


def test_gathered_depth_bank_mixed_shapes(tmp_path):
    """Mixed-resolution scenes: the geometric collective must run for
    EVERY shape bucket (an oversized view that is no group member's
    source must not force the disk fallback), each view's depth file must
    be read at most once per pass (shared cache across buckets/batches),
    and the attached depths must equal a direct disk read."""
    import os

    from acmmp_tpu.io import write_dmb
    from acmmp_tpu.io.dense_folder import Problem, result_dir
    from acmmp_tpu.pipeline import scheduler

    mesh = make_view_mesh()
    out_folder = str(tmp_path)
    rng = np.random.default_rng(5)
    # views 0-1 small (16x24), views 2-3 large (32x40); small problems
    # source only each other, large problems source everyone
    shapes = {0: (16, 24), 1: (16, 24), 2: (32, 40), 3: (32, 40)}
    depths = {i: rng.uniform(1.0, 9.0, shapes[i]).astype(np.float32)
              for i in shapes}
    for i, d in depths.items():
        os.makedirs(result_dir(out_folder, i), exist_ok=True)
        write_dmb(os.path.join(result_dir(out_folder, i), "depths.dmb"), d)
    problems = [
        Problem(ref_image_id=0, src_image_ids=[1]),
        Problem(ref_image_id=1, src_image_ids=[0]),
        Problem(ref_image_id=2, src_image_ids=[0, 1, 3]),
        Problem(ref_image_id=3, src_image_ids=[0, 1, 2]),
    ]

    class FakeInputs:
        def __init__(self, hs, ws, v):
            self.src_imgs = np.zeros((v, hs, ws), np.float32)
            self.src_depths = None

        def _replace(self, src_depths):
            v, hs, ws = self.src_imgs.shape
            new = FakeInputs(hs, ws, v)
            new.src_imgs = self.src_imgs
            new.src_depths = src_depths
            return new

    class FakePrep:
        def __init__(self, problem, hs, ws, v_pad):
            self.problem = problem
            self.v_pad = v_pad
            self.inputs = FakeInputs(hs, ws, v_pad)

    v_pad = 3
    preps = [FakePrep(problems[0], 16, 24, v_pad),
             FakePrep(problems[1], 16, 24, v_pad),
             FakePrep(problems[2], 32, 40, v_pad),
             FakePrep(problems[3], 32, 40, v_pad)]
    groups = {(16, 24): preps[:2], (32, 40): preps[2:]}

    reads = []
    real_read = scheduler.read_dmb

    def counting_read(path):
        reads.append(path)
        return real_read(path)

    scheduler.read_dmb = counting_read
    try:
        cache = {}
        scheduler._attach_gathered_src_depths(
            groups, problems, out_folder, mesh, False, cache=cache)
        n_first = len(reads)
        # second batch in the same pass: zero new reads
        groups2 = {(16, 24): [FakePrep(problems[0], 16, 24, v_pad)]}
        scheduler._attach_gathered_src_depths(
            groups2, problems, out_folder, mesh, False, cache=cache)
        assert len(reads) == n_first, "cache must prevent re-reads"
    finally:
        scheduler.read_dmb = real_read
    # one read per view per pass, never more
    assert n_first == len(problems), reads

    def pad_to(a, h, w):
        return np.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])))

    for pp in preps:
        hs, ws = pp.inputs.src_imgs.shape[1:]
        got = np.asarray(pp.inputs.src_depths)
        assert got is not None and got.shape == (v_pad, hs, ws)
        # padding slots (j >= len(src_ids)) gather index 0 and are masked
        # out by the solver's view_mask — only real slots are asserted
        for j, s in enumerate(pp.problem.src_image_ids):
            np.testing.assert_array_equal(got[j], pad_to(depths[s], hs, ws))


def test_fusion_mixed_resolution_padding_neutral():
    """Mixed-resolution fusion: the sequential path pads each problem to
    its OWN sources' max shape, the mesh path to the scene-wide max — the
    fused cloud must be identical either way (padded pixels are masked),
    and valid (the half-res view fuses through K rescaling)."""
    from acmmp_tpu.config import FusionParams
    from acmmp_tpu.engine.fusion import FusionView, fuse_views
    from acmmp_tpu.io.dense_folder import Problem
    from acmmp_tpu.utils.synth import textured_plane_scene

    n_views = 4
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=64, height=48)
    fp = FusionParams(num_consistent_thresh=2)

    def make_views():
        views = {}
        for i in range(n_views):
            h, w = (24, 32) if i == 3 else (48, 64)
            depth = np.full((h, w), plane_z, np.float32)
            normal = np.zeros((h, w, 3), np.float32)
            normal[..., 2] = -1.0
            img = np.stack([images[i]] * 3, axis=-1).astype(np.float32)
            # FusionView rescales image+K to the depth resolution
            views[i] = FusionView(img, cams[i], depth, normal)
        return views

    problems = [Problem(ref_image_id=i,
                        src_image_ids=[j for j in range(n_views) if j != i])
                for i in range(n_views)]

    seq = fuse_views(make_views(), problems, fp)
    assert len(seq[0]) > 0
    assert np.median(np.abs(seq[0][:, 2] - plane_z)) < 0.05
    shd = fuse_views(make_views(), problems, fp, mesh=make_view_mesh())
    np.testing.assert_array_equal(np.asarray(seq[0]), np.asarray(shd[0]))
    np.testing.assert_array_equal(np.asarray(seq[1]), np.asarray(shd[1]))


def test_sharded_prior_aware_fusion_matches_sequential():
    """Dual-candidate (prior-aware) fusion through the group-sharded path
    must equal the sequential path exactly (RunPriorAwareFusion,
    acmmp_definitions.cpp:573-826, candidate axis of 2)."""
    from acmmp_tpu.config import FusionParams
    from acmmp_tpu.engine.fusion import FusionView, fuse_views
    from acmmp_tpu.io.dense_folder import Problem
    from acmmp_tpu.utils.synth import textured_plane_scene

    n_views = 4
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=64, height=48)
    fp = FusionParams(num_consistent_thresh=2)

    def make_views():
        views = {}
        for i in range(n_views):
            depth = np.full((48, 64), plane_z, np.float32)
            normal = np.zeros((48, 64, 3), np.float32)
            normal[..., 2] = -1.0
            # second candidate: consistent only in the left half
            depth1 = depth.copy()
            depth1[:, 32:] += 3.0
            img = np.stack([images[i]] * 3, axis=-1).astype(np.float32)
            views[i] = FusionView(img, cams[i], depth, normal,
                                  depth1=depth1, normal1=normal.copy())
        return views

    problems = [Problem(ref_image_id=i,
                        src_image_ids=[j for j in range(n_views) if j != i])
                for i in range(n_views)]

    seq = fuse_views(make_views(), problems, fp, prior_aware=True,
                     single_match_penalty=1)
    assert len(seq[0]) > 0
    assert np.median(np.abs(seq[0][:, 2] - plane_z)) < 0.1
    shd = fuse_views(make_views(), problems, fp, prior_aware=True,
                     single_match_penalty=1, mesh=make_view_mesh())
    np.testing.assert_array_equal(np.asarray(seq[0]), np.asarray(shd[0]))
    np.testing.assert_array_equal(np.asarray(seq[1]), np.asarray(shd[1]))
