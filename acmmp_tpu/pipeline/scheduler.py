"""Multi-scale reconstruction scheduler.

The stage graph of the reference CLI (main_ACMMP.cpp:96-196):

  scale S (coarsest) .. 0 (finest):
    S:    photometric(+seeded) pass with planar-prior second solve,
          then 2 geometric-consistency passes (2nd with multi_geometry)
    <S:   JBU-upsample previous depths -> hierarchy pass (planar-prior
          second solve, hierarchy acceptance gate), then 2 geometric passes
  finally: fusion (plain or prior-aware) -> PLY

Stage-to-stage contract is the filesystem, byte-compatible with the
reference (<out>/2333_%08d/{depths,depths_geom,normals,costs}.dmb), so runs
are resumable at stage granularity and cross-checkable against the
reference binaries."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acmmp_tpu.config import PipelineConfig, PatchMatchParams
from acmmp_tpu.engine.fusion import run_fusion, run_prior_aware_fusion
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import (
    Mode, SolverOutputs, run_patchmatch_auto,
)
from acmmp_tpu.engine.priors import build_planar_prior
from acmmp_tpu.io import read_dmb, write_dmb
from acmmp_tpu.io.dense_folder import (
    Problem, cam_path, image_path, load_image_gray, read_cam_txt,
    read_pair_txt, rescale_to_max_size, result_dir,
)
from acmmp_tpu.io.priors import load_seed_planes, priors_available
from acmmp_tpu.ops.jbu import jbu_depth_jit, jbu_normal_cost
from acmmp_tpu.parallel import tiles as tile_ops
from acmmp_tpu.utils.log import get_logger, profiled, stage_metrics

log = get_logger("scheduler")

# size-gated dispatch: the fused single-program solve at or below its
# verified-correct bound (FUSED_MAX_PIXELS, tools/fused_fault_repro.py),
# staged above; state stays on device either way
_solve = run_patchmatch_auto


def generate_sample_list(dense_folder: str) -> List[Problem]:
    return read_pair_txt(os.path.join(dense_folder, "pair.txt"))


def compute_multiscale_settings(dense_folder: str, problems: List[Problem],
                                params: PatchMatchParams,
                                image_dir: str = "images") -> int:
    """Per-problem downscale counts (ComputeMultiScaleSettings,
    acmmp_definitions.cpp:207-243)."""
    from PIL import Image as PILImage

    max_num_downscale = -1
    for p in problems:
        with PILImage.open(image_path(dense_folder, p.ref_image_id, image_dir)) as im:
            w, h = im.size
        max_size = min(max(w, h), params.max_image_size)
        p.max_image_size = max_size
        k = 0
        while max_size > params.size_bound:
            max_size //= 2
            k += 1
        p.num_downscale = k
        max_num_downscale = max(max_num_downscale, k)
    return max_num_downscale


@dataclasses.dataclass
class _ViewData:
    image: np.ndarray
    cam: object


class ViewLoader:
    """Loads and caches grayscale images + cameras, rescaled per size.

    The raw cache stores uint8 (lossless — load_image_gray yields exact
    u8 values; 4x less host memory). The per-size f32 cache is a
    byte-budgeted LRU: the schedule is mostly coarse->fine so old sizes
    age out, but views that exhaust their downscale count early are
    re-requested at the SAME size every later scale and stay warm
    (clearing at scale boundaries would re-rescale them each scale)."""

    def __init__(self, dense_folder: str, image_dir: str = "images",
                 scaled_cache_bytes: int = 1 << 30):
        from collections import OrderedDict

        self.dense = dense_folder
        self.image_dir = image_dir
        self._raw: Dict[int, _ViewData] = {}
        self._scaled: "OrderedDict[tuple, _ViewData]" = OrderedDict()
        self._scaled_bytes = 0
        self._budget = scaled_cache_bytes

    def raw(self, image_id: int) -> _ViewData:
        if image_id not in self._raw:
            img = load_image_gray(image_path(self.dense, image_id, self.image_dir))
            cam = read_cam_txt(cam_path(self.dense, image_id))
            cam.width, cam.height = img.shape[1], img.shape[0]
            self._raw[image_id] = _ViewData(img.astype(np.uint8), cam)
        return self._raw[image_id]

    def at_size(self, image_id: int, max_size: int) -> _ViewData:
        key = (image_id, max_size)
        v = self._scaled.get(key)
        if v is None:
            raw = self.raw(image_id)
            img, cam = rescale_to_max_size(
                raw.image.astype(np.float32), raw.cam, max_size)
            v = _ViewData(img, cam)
            self._scaled[key] = v
            self._scaled_bytes += img.nbytes
            while self._scaled_bytes > self._budget and len(self._scaled) > 1:
                _, old = self._scaled.popitem(last=False)
                self._scaled_bytes -= old.image.nbytes
        else:
            self._scaled.move_to_end(key)
        return v


def _mode_desc(geom: bool, hierarchy: bool, seeded: bool,
               multi_geometry: bool) -> str:
    return ("geom2" if geom and multi_geometry else "geom" if geom
            else "hierarchy" if hierarchy
            else "seeded" if seeded else "photometric")


def _pass_marker_path(output_folder: str, rid: int, tag: int) -> str:
    return os.path.join(result_dir(output_folder, rid),
                        f".pass_{tag:03d}.json")


def _pass_done(output_folder: str, rid: int, tag: int, size: int) -> bool:
    """True when the (view, pass) solve already completed in a previous run
    with the same schedule (marker written by _mark_pass_done). The size
    check invalidates markers from a run with a different multi-scale
    schedule. The reference binary always recomputes, but its harness
    resumes from outputs on disk (evaluate_dtu_structure.py:42-60); this is
    the stage-granular version SURVEY §5 commits to."""
    import json

    p = _pass_marker_path(output_folder, rid, tag)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return False
    return d.get("size") == size


def _mark_pass_done(output_folder: str, rid: int, tag: int, size: int,
                    desc: str) -> None:
    import json

    from acmmp_tpu.parallel import multihost as mh

    if not mh.is_primary():
        return
    p = _pass_marker_path(output_folder, rid, tag)
    with open(p, "w") as f:
        json.dump({"size": size, "pass": desc}, f)


def _write_outputs(rdir: str, out: SolverOutputs, h: int, w: int,
                   geom: bool) -> None:
    from acmmp_tpu.parallel import multihost as mh

    if not mh.is_primary():
        # multi-process: every process computes identical outputs (they are
        # allgathered); only one may write the shared checkpoint files
        return
    os.makedirs(rdir, exist_ok=True)
    depth = np.asarray(out.depth)[:h, :w]
    normal = np.asarray(out.normal_world)[:h, :w]
    cost = np.asarray(out.cost)[:h, :w]
    write_dmb(os.path.join(rdir, "depths_geom.dmb" if geom else "depths.dmb"), depth)
    write_dmb(os.path.join(rdir, "normals.dmb"), normal)
    write_dmb(os.path.join(rdir, "costs.dmb"), cost)


class _Prepared:
    """Host-side loaded inputs of one (view, scale, mode) solve."""

    def __init__(self, problem, ref, srcs, inputs, h, w, v_pad, src_depths,
                 tiled=False, pad_h=8):
        self.problem = problem
        self.ref = ref
        self.srcs = srcs
        self.inputs = inputs
        self.h = h
        self.w = w
        self.v_pad = v_pad
        self.src_depths = src_depths
        self.tiled = tiled        # solve with image rows sharded (tiles.py)
        self.pad_h = pad_h        # effective row padding used for inputs


def _tile_plan(cfg, h: int, w: int, tile_devices: int):
    """(tiled, pad_h) for a view of true size (h, w): rows-sharded when a
    mesh is present, the view exceeds cfg.tile_pixels, and every shard
    gets at least the 24-row halo reach (parallel/tiles.py)."""
    if tile_devices < 2 or not cfg.tile_pixels or h * w <= cfg.tile_pixels:
        return False, cfg.pad_h
    m = 8 * tile_devices
    pad_h = m * max(1, (cfg.pad_h + m - 1) // m)
    hp = ((h + pad_h - 1) // pad_h) * pad_h
    if hp // tile_devices < tile_ops.HALO:
        return False, cfg.pad_h   # shards would be thinner than the halo
    return True, pad_h


def _prepare_problem(
    dense_folder, output_folder, problems, idx, cfg, loader,
    *, geom_consistency, hierarchy, multi_geometry, seeded,
    skip_src_depth_files=False, tile_devices=0,
):
    """Disk -> SolverInputs for one problem (InputInitialization,
    src/ACMMP.cpp:525-636). Returns None for skipped (sourceless) views.

    With `skip_src_depth_files` (mesh path) the source depth maps are NOT
    read from disk — they arrive sharded via the in-program all-gather
    (parallel.sharding.gather_src_depths) and are attached by the caller."""
    params = cfg.patchmatch
    problem = problems[idx]
    rid = problem.ref_image_id
    if not problem.src_image_ids:
        log.warning("view %08d has no source views (pair.txt); skipping", rid)
        return None
    rdir = result_dir(output_folder, rid)
    os.makedirs(rdir, exist_ok=True)
    id2prob = {p.ref_image_id: p for p in problems}

    ref = loader.at_size(rid, problem.cur_image_size)
    src_ids = problem.src_image_ids
    srcs = [
        loader.at_size(s, id2prob[s].cur_image_size if s in id2prob
                       else problem.cur_image_size)
        for s in src_ids
    ]
    h, w = ref.image.shape
    v_pad = max(len(p.src_image_ids) for p in problems)
    tiled, pad_h = _tile_plan(cfg, h, w, tile_devices)

    kw = {}
    suffix = "depths_geom.dmb" if multi_geometry else "depths.dmb"
    if geom_consistency:
        if not skip_src_depth_files:
            kw["src_depths"] = [
                read_dmb(os.path.join(result_dir(output_folder, s), suffix))
                for s in src_ids
            ]
        kw["init_depth"] = read_dmb(os.path.join(rdir, suffix))
        kw["init_normal_world"] = read_dmb(os.path.join(rdir, "normals.dmb"))
        kw["init_cost"] = read_dmb(os.path.join(rdir, "costs.dmb"))
    elif hierarchy:
        # coarse hypotheses from the previous scale; fine depth from JBU
        fine_depth = read_dmb(os.path.join(rdir, "depths.dmb"))
        coarse_normal = read_dmb(os.path.join(rdir, "normals.dmb"))
        coarse_cost = read_dmb(os.path.join(rdir, "costs.dmb"))
        if coarse_normal.shape[:2] != (h, w):
            normal_up, _cost_up = jax.jit(
                jbu_normal_cost, static_argnames=("params",)
            )(jnp.asarray(ref.image), jnp.asarray(coarse_normal),
              jnp.asarray(coarse_cost), params)
            kw["init_normal_world"] = np.asarray(normal_up)
        else:
            kw["init_normal_world"] = coarse_normal
        if fine_depth.shape != (h, w):
            # JBU was skipped (equal sizes upstream); resize naively
            fine_depth = np.asarray(jbu_depth_jit(
                jnp.asarray(ref.image), jnp.asarray(fine_depth), params))
        kw["init_depth"] = fine_depth
    elif seeded:
        seed_planes = load_seed_planes(dense_folder, rid, ref.cam, h, w)
        if seed_planes is None:
            raise FileNotFoundError(f"priors for view {rid} not found")
        kw["seed_planes"] = seed_planes

    inputs = build_solver_inputs(
        ref.image, [s.image for s in srcs], ref.cam, [s.cam for s in srcs],
        params, num_views_pad=v_pad, pad_h=pad_h, pad_w=cfg.pad_w, **kw,
    )
    return _Prepared(problem, ref, srcs, inputs, h, w, v_pad,
                     kw.get("src_depths"), tiled=tiled, pad_h=pad_h)


def _prior_second_solve_inputs(prep: _Prepared, out, cfg, hierarchy,
                               rdir=None):
    """Triangulated planar-prior inputs for the second solve, or None
    (GetSupportPoints..CudaPlanarPriorInitialization,
    acmmp_definitions.cpp:306-390)."""
    params = cfg.patchmatch
    ref = prep.ref
    h, w = prep.h, prep.w
    dmin = float(ref.cam.depth_min * params.depth_min_relax)
    dmax = float(ref.cam.depth_max * params.depth_max_relax)
    # solver outputs are padded to [Hp, Wp]; triangulation runs on the
    # true image extent
    prior_planes, prior_mask = build_planar_prior(
        ref.cam, out.depth[:h, :w], out.cost[:h, :w], dmin, dmax, w, h,
    )
    from acmmp_tpu.parallel import multihost as mh

    if cfg.debug_images and rdir is not None and mh.is_primary():
        # triangulation debug image (the reference writes triangulation.png
        # per view, acmmp_definitions.cpp:329): white = pixels covered by a
        # valid triangulated prior plane
        from PIL import Image as PILImage

        mask_img = (np.zeros((h, w), np.uint8) if prior_mask is None
                    else (np.asarray(prior_mask[:h, :w]) * 255).astype(
                        np.uint8))
        PILImage.fromarray(mask_img).save(
            os.path.join(rdir, "triangulation.png"))
    if prior_planes is None:
        return None
    inputs2 = build_solver_inputs(
        ref.image, [s.image for s in prep.srcs], ref.cam,
        [s.cam for s in prep.srcs], params, num_views_pad=prep.v_pad,
        pad_h=prep.pad_h, pad_w=cfg.pad_w,
        init_depth=out.depth, init_normal_world=out.normal_world,
        init_cost=out.cost, prior_planes=prior_planes,
        prior_mask=prior_mask,
        pre_costs=out.pre_costs if hierarchy else None,
        src_depths=prep.src_depths,
    )
    if prep.src_depths is None and prep.inputs.src_depths is not None:
        # mesh/collective path: the first solve's source depths arrived via
        # the in-program all-gather (already padded [Vp, Hs, Ws]); reuse
        # the same device array instead of re-reading from disk
        inputs2 = inputs2._replace(src_depths=prep.inputs.src_depths)
    return inputs2


def _problem_key(cfg, rid, pass_tag):
    return jax.random.fold_in(jax.random.key(cfg.seed), rid * 131 + pass_tag)


def _prior_size_skip(cfg, prep) -> bool:
    """True when cfg.planar_prior_max_pixels bounds the planar-prior
    second solve away from this (large) view."""
    return (cfg.planar_prior_max_pixels > 0
            and prep.h * prep.w > cfg.planar_prior_max_pixels)


def process_problem(
    dense_folder: str,
    output_folder: str,
    problems: Sequence[Problem],
    idx: int,
    cfg: PipelineConfig,
    loader: ViewLoader,
    *,
    geom_consistency: bool,
    planar_prior: bool,
    hierarchy: bool,
    multi_geometry: bool = False,
    seeded: bool = False,
    pass_tag: int = 0,
) -> None:
    """One (view, scale, mode) solve + optional planar-prior second solve
    (ProcessProblem, acmmp_definitions.cpp:245-403)."""
    params = cfg.patchmatch
    if cfg.resume and _pass_done(output_folder,
                                 problems[idx].ref_image_id, pass_tag,
                                 problems[idx].cur_image_size):
        log.info("resume: view %08d pass %d already done; skipping",
                 problems[idx].ref_image_id, pass_tag)
        return
    prep = _prepare_problem(
        dense_folder, output_folder, problems, idx, cfg, loader,
        geom_consistency=geom_consistency, hierarchy=hierarchy,
        multi_geometry=multi_geometry, seeded=seeded)
    if prep is None:
        return
    rid = prep.problem.ref_image_id
    rdir = result_dir(output_folder, rid)
    mode = Mode(geom_consistency=geom_consistency, hierarchy=hierarchy,
                seeded=seeded)
    key = _problem_key(cfg, rid, pass_tag)
    out = jax.tree.map(np.asarray,
                       _solve(prep.inputs, key, params=params, mode=mode))

    if planar_prior and not _prior_size_skip(cfg, prep):
        inputs2 = _prior_second_solve_inputs(prep, out, cfg, hierarchy,
                                             rdir=rdir)
        if inputs2 is not None:
            mode2 = Mode(geom_consistency=geom_consistency,
                         planar_prior=True, hierarchy=hierarchy)
            out = jax.tree.map(np.asarray, _solve(
                inputs2, jax.random.fold_in(key, 1), params=params,
                mode=mode2))

    rdir = result_dir(output_folder, rid)
    _write_outputs(rdir, out, prep.h, prep.w, geom_consistency)
    _mark_pass_done(output_folder, rid, pass_tag,
                    prep.problem.cur_image_size,
                    _mode_desc(geom_consistency, hierarchy, seeded,
                               multi_geometry))
    stage_metrics(log, f"view {rid:08d}", out.depth[:prep.h, :prep.w],
                  out.cost[:prep.h, :prep.w])


def process_batch(
    dense_folder: str,
    output_folder: str,
    problems: Sequence[Problem],
    indices: Sequence[int],
    cfg: PipelineConfig,
    loader: ViewLoader,
    solver,                      # pipeline.batched.BatchedSolver
    *,
    geom_consistency: bool,
    planar_prior: bool,
    hierarchy: bool,
    multi_geometry: bool = False,
    seeded: bool = False,
    pass_tag: int = 0,
    depth_cache: Optional[dict] = None,
) -> None:
    """Batched equivalent of process_problem: many views per dispatch,
    grouped by static shape. The planar-prior second solve batches the
    subset of views whose triangulation produced priors (the reference
    skips the second solve for the rest, acmmp_definitions.cpp:318-330).

    On a mesh, the geometric pass's source depth maps move via the
    in-program all-gather (parallel.sharding.gather_src_depths) instead of
    per-problem disk reloads — the reference's filesystem round-trip
    (src/ACMMP.cpp:608-635) becomes one ICI collective. Pass one
    `depth_cache` dict across all batches of a geometric pass so the
    depth bank is read and device_put once per pass."""
    params = cfg.patchmatch
    collective = solver.mesh is not None and geom_consistency
    tile_devices = (solver.mesh.devices.size if solver.mesh is not None
                    else 0)
    if cfg.resume:
        indices = [i for i in indices
                   if not _pass_done(output_folder,
                                     problems[i].ref_image_id, pass_tag,
                                     problems[i].cur_image_size)]
    preps = []
    for i in indices:
        p = _prepare_problem(
            dense_folder, output_folder, problems, i, cfg, loader,
            geom_consistency=geom_consistency, hierarchy=hierarchy,
            multi_geometry=multi_geometry, seeded=seeded,
            skip_src_depth_files=collective, tile_devices=tile_devices)
        if p is not None:
            preps.append(p)
    if not preps:
        return
    mode = Mode(geom_consistency=geom_consistency, hierarchy=hierarchy,
                seeded=seeded)

    # group by static shape bucket so each group stacks cleanly; tiled
    # views (rows sharded over the mesh, parallel/tiles.py) group apart
    def bucket(pp):
        return (pp.inputs.ref_img.shape, pp.inputs.src_imgs.shape, pp.tiled)

    groups: Dict[tuple, list] = {}
    for pp in preps:
        groups.setdefault(bucket(pp), []).append(pp)

    if collective:
        _attach_gathered_src_depths(
            groups, problems, output_folder, solver.mesh, multi_geometry,
            cache=depth_cache)

    tile_mesh = None

    def solve_group(group_inputs, keys, m):
        nonlocal tile_mesh
        if not group_inputs[0][1]:          # not tiled: view-parallel batch
            return solver.solve_batch([gi for gi, _ in group_inputs], keys,
                                      m)
        # tiled: each view's rows sharded over every mesh device, views
        # solved sequentially (one big view IS the whole step's work)
        if tile_mesh is None:
            tile_mesh = tile_ops.make_tile_mesh(
                devices=list(solver.mesh.devices.flat))
        return [tile_ops.tile_sharded_patchmatch(tile_mesh, gi, k, params, m)
                for (gi, _), k in zip(group_inputs, keys)]

    for group in groups.values():
        keys = [_problem_key(cfg, pp.problem.ref_image_id, pass_tag)
                for pp in group]
        outs = solve_group([(pp.inputs, pp.tiled) for pp in group], keys,
                           mode)
        outs = [jax.tree.map(np.asarray, o) for o in outs]

        if planar_prior:
            second = []
            for j, (pp, out) in enumerate(zip(group, outs)):
                if _prior_size_skip(cfg, pp):
                    continue
                inputs2 = _prior_second_solve_inputs(
                    pp, out, cfg, hierarchy,
                    rdir=result_dir(output_folder, pp.problem.ref_image_id))
                if inputs2 is not None:
                    second.append((j, inputs2))
            if second:
                mode2 = Mode(geom_consistency=geom_consistency,
                             planar_prior=True, hierarchy=hierarchy)
                outs2 = solve_group(
                    [(inp, group[j].tiled) for j, inp in second],
                    [jax.random.fold_in(keys[j], 1) for j, _ in second],
                    mode2)
                for (j, _), o2 in zip(second, outs2):
                    outs[j] = jax.tree.map(np.asarray, o2)

        for pp, out in zip(group, outs):
            rid = pp.problem.ref_image_id
            _write_outputs(result_dir(output_folder, rid), out, pp.h, pp.w,
                           geom_consistency)
            _mark_pass_done(output_folder, rid, pass_tag,
                            pp.problem.cur_image_size,
                            _mode_desc(geom_consistency, hierarchy, seeded,
                                       multi_geometry))
            stage_metrics(log, f"view {rid:08d}", out.depth[:pp.h, :pp.w],
                          out.cost[:pp.h, :pp.w])


def _attach_gathered_src_depths(groups, problems, output_folder, mesh,
                                multi_geometry, cache=None) -> None:
    """Attach each prepared problem's source depth maps via the mesh
    collective: every view's OWN current depth map is loaded locally (one
    read per view per pass — the multi-host analog: each host reads only
    its own views' checkpoints), then one `lax.all_gather` over ICI
    distributes them and a local gather picks each problem's sources.

    `cache` (a dict owned by the caller, one per geometric pass) holds the
    raw per-view maps and the sharded per-bucket banks so neither is
    rebuilt across shape buckets or view batches — depth files don't
    change within a pass. Falls back to direct disk reads for problems
    whose sources are outside the view set."""
    from jax.sharding import PartitionSpec as P

    from acmmp_tpu.parallel import multihost as mh
    from acmmp_tpu.parallel.sharding import VIEW_AXIS, gather_src_depths

    suffix = "depths_geom.dmb" if multi_geometry else "depths.dmb"
    id2idx = {p.ref_image_id: k for k, p in enumerate(problems)}
    n_mesh = mesh.devices.size
    if cache is None:
        cache = {}

    def raw_map(rid):
        key = ("raw", rid)
        if key not in cache:
            try:
                cache[key] = read_dmb(os.path.join(
                    result_dir(output_folder, rid), suffix))
            except FileNotFoundError:
                # a view that never solved (e.g. sourceless) can still be
                # listed as someone's source; a zero map marks its depths
                # invalid (sd <= 0 -> geom_cost_max, ops/geom.py)
                cache[key] = None
        return cache[key]

    def bank_for(hs, ws):
        # one bank of every view's own current depth map at this bucket's
        # padded shape. A view bigger than the bucket is zeroed rather
        # than banned: a problem's bucket shape is >= every one of its
        # sources' true sizes (src_imgs are padded to their max), so an
        # oversized view's slot can never be gathered by this bucket.
        key = ("bank", hs, ws)
        if key not in cache:
            maps = []
            for p in problems:
                d = raw_map(p.ref_image_id)
                if d is None or d.shape[0] > hs or d.shape[1] > ws:
                    maps.append(np.zeros((hs, ws), np.float32))
                else:
                    maps.append(_pad_to(d, hs, ws))
            n_pad = ((len(maps) + n_mesh - 1) // n_mesh) * n_mesh
            maps += [np.zeros((hs, ws), np.float32)] * (n_pad - len(maps))
            # multi-process safe: each process contributes only its
            # addressable shards of the view-sharded bank
            cache[key] = mh.host_to_global(mesh, P(VIEW_AXIS),
                                           np.stack(maps))
        return cache[key]

    def disk_fallback(pp, hs, ws):
        depths = np.stack([
            _pad_to(read_dmb(os.path.join(
                result_dir(output_folder, s), suffix)), hs, ws)
            for s in pp.problem.src_image_ids] + [
            np.zeros((hs, ws), np.float32)] * (
                pp.v_pad - len(pp.problem.src_image_ids)))
        pp.inputs = pp.inputs._replace(src_depths=jnp.asarray(depths))

    for group in groups.values():
        hs, ws = group[0].inputs.src_imgs.shape[-2:]
        group_ok = all(
            all(s in id2idx for s in pp.problem.src_image_ids)
            for pp in group)
        if not group_ok:
            log.info("geom collective unavailable for a %dx%d group; "
                     "reading source depths from disk", hs, ws)
            for pp in group:
                disk_fallback(pp, hs, ws)
            continue
        bank = bank_for(hs, ws)

        b = len(group)
        b_pad = ((b + n_mesh - 1) // n_mesh) * n_mesh
        si = np.zeros((b_pad, group[0].v_pad), np.int32)
        for j, pp in enumerate(group):
            ids = [id2idx[s] for s in pp.problem.src_image_ids]
            si[j, :len(ids)] = ids
        gathered = gather_src_depths(
            mesh, bank, mh.host_to_global(mesh, P(VIEW_AXIS), si))
        if mh.is_multiprocess():
            # per-problem slices of a partially-addressable array can't be
            # taken directly; land the gathered bank on every host once
            # (the batched executor re-places each problem view-sharded)
            gathered = mh.global_to_host(gathered)
        for j, pp in enumerate(group):
            pp.inputs = pp.inputs._replace(src_depths=gathered[j])


def _pad_to(a: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(np.asarray(a, np.float32),
                  ((0, h - a.shape[0]), (0, w - a.shape[1])))


def joint_bilateral_upsampling(dense_folder: str, output_folder: str,
                               problem: Problem, acmmp_size: int,
                               cfg: PipelineConfig,
                               loader: ViewLoader) -> None:
    """Upsample depths_geom.dmb to the next scale via JBU and store it as
    the next scale's depths.dmb (JointBilateralUpsampling,
    acmmp_definitions.cpp:405-440)."""
    from acmmp_tpu.parallel import multihost as mh

    rid = problem.ref_image_id
    rdir = result_dir(output_folder, rid)
    coarse = read_dmb(os.path.join(rdir, "depths_geom.dmb"))
    fine = loader.at_size(rid, acmmp_size)
    if max(fine.image.shape[0] // coarse.shape[0],
           fine.image.shape[1] // coarse.shape[1]) <= 1:
        return  # RunJBU: "Image.rows = Depthmap.rows" early-out
    if not mh.is_primary():
        return
    up = jbu_depth_jit(jnp.asarray(fine.image), jnp.asarray(coarse),
                       cfg.patchmatch)
    write_dmb(os.path.join(rdir, "depths.dmb"), np.asarray(up))


def run_pipeline(dense_folder: str, cfg: PipelineConfig, mesh=None) -> str:
    """Full reconstruction: the reference CLI main (main_ACMMP.cpp:9-198).
    Returns the written PLY path. Set ACMMP_TPU_PROFILE=<dir> for a
    jax.profiler trace of the whole run.

    With cfg.view_batch > 1 (or a mesh), views are solved in batches per
    dispatch; a mesh shards each batch over its "view" axis with the
    geometric pass's depth maps staying the filesystem contract."""
    import time as _time

    from acmmp_tpu.parallel import multihost as mh

    t_start = _time.time()
    n_solves = 0
    problems = generate_sample_list(dense_folder)

    solver = None
    if mesh is not None or cfg.view_batch > 1:
        from acmmp_tpu.pipeline.batched import BatchedSolver

        solver = BatchedSolver(cfg.patchmatch, mesh)

    def run_views(**mode_kw):
        if solver is None:
            for i in range(len(problems)):
                process_problem(dense_folder, output_folder, problems, i,
                                cfg, loader, **mode_kw)
        else:
            b = max(cfg.view_batch, 1)
            if mesh is not None:
                b = max(b, mesh.devices.size)
            # one depth-bank cache per pass: the bank is identical across
            # batches (depth files don't change within a pass)
            depth_cache: dict = {}
            for start in range(0, len(problems), b):
                process_batch(dense_folder, output_folder, problems,
                              list(range(start, min(start + b,
                                                    len(problems)))),
                              cfg, loader, solver, depth_cache=depth_cache,
                              **mode_kw)
        # multi-process: the NEXT pass reads this pass's checkpoint files
        # (written by process 0 only); everyone waits for them to land
        mh.barrier(f"pass_{mode_kw.get('pass_tag', 0)}")
    log.info("There are %d problems to process", len(problems))
    max_num_downscale = compute_multiscale_settings(
        dense_folder, problems, cfg.patchmatch, cfg.image_dir)

    prior = cfg.use_prior
    if prior and not priors_available(dense_folder, len(problems)):
        raise FileNotFoundError(
            "seeded init requested (--prior) but priors/ not found")

    out_name = cfg.output_dir
    if prior and cfg.output_dir == "ACMMP":
        out_name = "ACMMP_PRIOR"
    output_folder = os.path.join(dense_folder, out_name)
    os.makedirs(output_folder, exist_ok=True)
    loader = ViewLoader(dense_folder, cfg.image_dir)

    tag = 0
    first_scale = True
    scale = max_num_downscale
    while scale >= 0:
        log.info("Scale: %d", scale)
        for p in problems:
            if p.num_downscale >= 0:
                p.cur_image_size = p.max_image_size // (2 ** p.num_downscale)
                p.num_downscale -= 1

        if first_scale:
            first_scale = False
            with profiled(f"photometric_s{scale}"):
                run_views(geom_consistency=False,
                          planar_prior=cfg.planar_prior,
                          hierarchy=False, seeded=prior, pass_tag=tag)
            n_solves += len(problems)
            tag += 1
        else:
            log.info("Starting JBU")
            for p in problems:
                # on resume, a completed hierarchy solve (next pass, tag)
                # must not have its depths.dmb re-clobbered by JBU of the
                # coarse depths_geom.dmb — skip JBU for those views
                if cfg.resume and _pass_done(output_folder, p.ref_image_id,
                                             tag, p.cur_image_size):
                    continue
                joint_bilateral_upsampling(
                    dense_folder, output_folder, p, p.cur_image_size, cfg,
                    loader)
            mh.barrier(f"jbu_s{scale}")
            with profiled(f"hierarchy_s{scale}"):
                run_views(geom_consistency=False,
                          planar_prior=cfg.planar_prior,
                          hierarchy=True, pass_tag=tag)
            n_solves += len(problems)
            tag += 1
        for geom_iter in range(cfg.geom_iterations):
            with profiled(f"geometric_s{scale}_i{geom_iter}"):
                run_views(geom_consistency=True, planar_prior=False,
                          hierarchy=False, multi_geometry=geom_iter > 0,
                          pass_tag=tag)
            n_solves += len(problems)
            tag += 1
        scale -= 1

    fusion_folder = os.path.join(dense_folder, cfg.fusion_dir)
    fusion_counts: Dict[int, int] = {}

    def fusion_progress(rid, n_accepted):
        fusion_counts[rid] = n_accepted
        log.info("fusion view %08d: %d points accepted", rid, n_accepted)

    debug_dir = output_folder if cfg.debug_images else None
    with profiled("fusion"):
        if (prior and cfg.multi_fusion) or cfg.force_fusion:
            ply = run_prior_aware_fusion(
                dense_folder, output_folder, fusion_folder, problems,
                geom_consistency=True, fp=cfg.fusion,
                single_match_penalty=cfg.fusion.single_match_penalty,
                mask_dir=cfg.mask_dir, progress=fusion_progress, mesh=mesh,
                debug_dir=debug_dir, view_cache=cfg.fusion_view_cache,
            )
        else:
            ply = run_fusion(
                dense_folder, output_folder, problems, geom_consistency=True,
                fp=cfg.fusion, image_dir=cfg.image_dir, mask_dir=cfg.mask_dir,
                progress=fusion_progress, mesh=mesh, debug_dir=debug_dir,
                view_cache=cfg.fusion_view_cache,
            )
    if fusion_counts:
        total = sum(fusion_counts.values())
        log.info("fusion: %d points from %d views (min %d / median %d / "
                 "max %d per view)", total, len(fusion_counts),
                 min(fusion_counts.values()),
                 int(np.median(list(fusion_counts.values()))),
                 max(fusion_counts.values()))
    elapsed = _time.time() - t_start
    log.info("wrote %s", ply)
    # the BASELINE throughput metric: depth-map solves per second
    log.info("pipeline: %d solves in %.1fs (%.3f depth-maps/s)",
             n_solves, elapsed, n_solves / max(elapsed, 1e-9))
    return ply
