"""Consistency-based depth/normal fusion into a colored point cloud.

Re-designs RunFusion (src/acmmp_definitions.cpp:828-1043) and the
prior-aware dual-hypothesis variant RunPriorAwareFusion (:573-826).

The reference is a sequential per-pixel host loop whose only cross-pixel
coupling is the greedy consumption masks (accepted points mark their
supporting source pixels as used). TPU-first design: the per-reference-view
work (project every pixel into every source view, gather, threshold, score)
is one jitted vector program; the greedy masks are updated *between*
reference views, keeping the reference's sequential-over-views semantics
while vectorizing within a view. Within one reference view, pixels are
scored against the masks as they stood when the view started (the reference
also lets earlier pixels of the same view consume source pixels used by
later ones; metric impact is negligible and the deviation is recorded in
DEVIATIONS.md). On a pod, reference views shard across chips in groups:
each chip computes its view's consistency parts, and the cheap greedy
acceptance chain is replayed on the host in sequential order — sharded
fusion output is identical to the single-chip output.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acmmp_tpu.config import FusionParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops import sample as sample_ops
from acmmp_tpu.io import read_dmb, write_ply
from acmmp_tpu.io.dense_folder import (
    NumpyCamera, Problem, cam_path, image_path, load_image_color,
    read_cam_txt, resize_image, result_dir,
)


# ---------------------------------------------------------------------------
# jitted per-reference-view kernels
# ---------------------------------------------------------------------------

def _per_view_consistency(ref_cam, src_cams, recons, src_masks, Xw,
                          ref_depth, ref_normal, x, y, rv, fp: FusionParams):
    """Project ref pixels into each source view and score consistency.

    `recons` is a sequence of (src_depths [V,Hs,Ws], src_normals [V,Hs,Ws,3])
    reconstructions scored against the SAME projection (the dual-candidate
    fusion scores each candidate against both recons); `rv` is the ref-side
    candidate validity. The source-map reads are one fused coherent gather
    (ops/sample.py — Pallas row-scan on TPU instead of XLA's slow 2D
    gather); masks fold into the depth channel (`~smask & sdepth>0` ==
    `depth_eff>0`), and lanes outside `inb & rv` read zeros — every
    consumer gates those lanes out, so results are bitwise-unchanged.

    Returns ([(consistent [V,H,W], dyn [V,H,W])] per recon, src_r, src_c)."""
    Hs, Ws = recons[0][0].shape[1:]

    def proj(src_cam):
        uv, _ = geo.project(src_cam, Xw)
        src_c = jnp.floor(uv[..., 0] + 0.5).astype(jnp.int32)
        src_r = jnp.floor(uv[..., 1] + 0.5).astype(jnp.int32)
        inb = (
            (src_c >= 0) & (src_c < src_cam.width.astype(jnp.int32))
            & (src_r >= 0) & (src_r < src_cam.height.astype(jnp.int32))
        )
        return jnp.clip(src_c, 0, Ws - 1), jnp.clip(src_r, 0, Hs - 1), inb

    cc, rr, inb = jax.vmap(proj)(src_cams)
    maps = jnp.concatenate([
        jnp.concatenate([jnp.where(src_masks, 0.0, sd)[:, None],
                         jnp.transpose(sn, (0, 3, 1, 2))], axis=1)
        for sd, sn in recons], axis=1)              # [V, 4*n_recons, Hs, Ws]
    smp = sample_ops.gather2d_sample(maps, rr, cc, inb & rv[None],
                                     backend=fp.sample_backend)

    def score(src_cam, sdepth, snormal, rr_v, cc_v, inb_v):
        Xs = geo.world_point(src_cam, cc_v.astype(jnp.float32),
                             rr_v.astype(jnp.float32), sdepth)
        buv, proj_depth = geo.project(ref_cam, Xs)
        err = jnp.sqrt((x - buv[..., 0]) ** 2 + (y - buv[..., 1]) ** 2)
        rdd = jnp.abs(proj_depth - ref_depth) / jnp.maximum(ref_depth, 1e-12)
        ang = geo.angle_between(ref_normal, snormal)
        ok = (
            inb_v & (sdepth > 0.0)
            & (err < fp.max_reproj_error)
            & (rdd < fp.max_relative_depth_diff)
            & (ang < fp.max_normal_angle)
        )
        dyn = jnp.exp(-(err + fp.depth_diff_weight * rdd + fp.angle_weight * ang))
        return ok, jnp.where(ok, dyn, 0.0)

    outs = []
    for k in range(len(recons)):
        sdepth = smp[:, 4 * k]
        snormal = jnp.transpose(smp[:, 4 * k + 1:4 * k + 4], (0, 2, 3, 1))
        outs.append(jax.vmap(score)(src_cams, sdepth, snormal, rr, cc, inb))
    return outs, rr, cc


def _fuse_view_plain_parts(ref_depth, ref_normal, ref_mask, ref_cam,
                           src_cams, src_depths, src_normals, src_masks,
                           view_mask, fp: FusionParams):
    """The expensive per-view work of plain fusion WITHOUT the greedy
    acceptance: per-view consistency flags/scores and source coordinates.
    The sharded path replays the sequential greedy chain on the host from
    exactly these parts (bitwise-equal to the sequential fusion)."""
    H, W = ref_depth.shape
    x, y = geo.pixel_grid(H, W)
    valid = (~ref_mask) & (ref_depth > 0.0) & (ref_depth < ref_cam.depth_max)
    Xw = geo.world_point(ref_cam, x, y, ref_depth)
    [(ok, dyn)], rr, cc = _per_view_consistency(
        ref_cam, src_cams, [(src_depths, src_normals)], src_masks, Xw,
        ref_depth, ref_normal, x, y, valid, fp,
    )
    ok = ok & view_mask[:, None, None]
    return valid, Xw, ok, dyn, rr, cc


def _fuse_view_plain(ref_depth, ref_normal, ref_mask, ref_cam, src_cams,
                     src_depths, src_normals, src_masks, view_mask,
                     fp: FusionParams):
    valid, Xw, ok, dyn, rr, cc = _fuse_view_plain_parts(
        ref_depth, ref_normal, ref_mask, ref_cam, src_cams, src_depths,
        src_normals, src_masks, view_mask, fp)
    n_cons = jnp.sum(ok, axis=0)
    d_cons = jnp.sum(jnp.where(ok, dyn, 0.0), axis=0)
    accept = valid & (n_cons >= fp.num_consistent_thresh) & (
        d_cons > fp.consistency_scalar * n_cons
    )

    # consumed source pixels: scatter accepted & consistent into each view
    def consume(ok_v, rr_v, cc_v, sm):
        flat = jnp.zeros(sm.shape, jnp.bool_).reshape(-1)
        idx = rr_v * sm.shape[1] + cc_v
        vals = accept & ok_v
        return flat.at[idx.reshape(-1)].max(vals.reshape(-1)).reshape(sm.shape)

    consumed = jax.vmap(consume)(ok, rr, cc, src_masks)
    return accept, Xw, consumed


def _fuse_view_dual_parts(ref_depth0, ref_normal0, ref_depth1, ref_normal1,
                          ref_mask, ref_cam, src_cams,
                          src_depths0, src_normals0, src_depths1,
                          src_normals1, src_masks, view_mask,
                          fp: FusionParams):
    """Per-candidate consistency parts of dual fusion (greedy acceptance
    replayed on the host by the sharded path, as in the plain variant)."""
    H, W = ref_depth0.shape
    x, y = geo.pixel_grid(H, W)
    v0 = (~ref_mask) & (ref_depth0 > 0.0)
    v1 = (~ref_mask) & (ref_depth1 > 0.0)

    def score(ref_depth, ref_normal, rv):
        Xw = geo.world_point(ref_cam, x, y, ref_depth)
        [(ok0, dyn0), (ok1, dyn1)], rr, cc = _per_view_consistency(
            ref_cam, src_cams,
            [(src_depths0, src_normals0), (src_depths1, src_normals1)],
            src_masks, Xw, ref_depth, ref_normal, x, y, rv, fp)
        ok = (ok0 | ok1) & view_mask[:, None, None]
        dyn = jnp.where(ok0 & ok1, jnp.maximum(dyn0, dyn1),
                        jnp.where(ok0, dyn0, dyn1))
        dyn = jnp.where(ok, dyn, 0.0)
        return Xw, ok, dyn, rr, cc

    return v0, v1, score(ref_depth0, ref_normal0, v0), \
        score(ref_depth1, ref_normal1, v1)


def _fuse_view_dual(ref_depth0, ref_normal0, ref_depth1, ref_normal1,
                    ref_mask, ref_cam, src_cams,
                    src_depths0, src_normals0, src_depths1, src_normals1,
                    src_masks, view_mask, single_match_penalty,
                    fp: FusionParams):
    """Dual-hypothesis prior-aware fusion: candidate 0 = base recon,
    candidate 1 = second recon; each candidate is scored against BOTH source
    recons per view taking the better (get_consistency_metrics,
    acmmp_definitions.cpp:454-518)."""
    v0, v1, p0, p1 = _fuse_view_dual_parts(
        ref_depth0, ref_normal0, ref_depth1, ref_normal1, ref_mask,
        ref_cam, src_cams, src_depths0, src_normals0, src_depths1,
        src_normals1, src_masks, view_mask, fp)
    Xw0, ok_v0, dyn_v0, rr, cc = p0
    Xw1, ok_v1, dyn_v1, rr1, cc1 = p1
    n0 = jnp.sum(ok_v0, axis=0)
    n1 = jnp.sum(ok_v1, axis=0)
    d0 = jnp.sum(dyn_v0, axis=0)
    d1 = jnp.sum(dyn_v1, axis=0)
    pass0 = (n0 >= fp.num_consistent_thresh) & (
        d0 > fp.consistency_scalar * n0) & v0
    pass1 = (n1 >= fp.num_consistent_thresh) & (
        d1 > fp.consistency_scalar * n1) & v1

    both = pass0 & pass1
    use1 = jnp.where(both, n1 >= n0, pass1)
    harsh = fp.num_consistent_thresh + single_match_penalty
    single_ok = jnp.where(use1, n1 >= harsh, n0 >= harsh)
    accept = jnp.where(both, True, (pass0 | pass1) & single_ok)
    accept = accept & (v0 | v1)

    Xw = jnp.where(use1[..., None], Xw1, Xw0)
    normal = jnp.where(use1[..., None], ref_normal1, ref_normal0)
    ok = jnp.where(use1[None, ...], ok_v1, ok_v0)
    crr = jnp.where(use1[None, ...], rr1, rr)
    ccc = jnp.where(use1[None, ...], cc1, cc)

    def consume(ok_v, rr_v, cc_v, sm):
        flat = jnp.zeros(sm.shape, jnp.bool_).reshape(-1)
        idx = rr_v * sm.shape[1] + cc_v
        vals = accept & ok_v
        return flat.at[idx.reshape(-1)].max(vals.reshape(-1)).reshape(sm.shape)

    consumed = jax.vmap(consume)(ok, crr, ccc, src_masks)
    return accept, Xw, normal, consumed


_fuse_view_plain_jit = jax.jit(_fuse_view_plain, static_argnames=("fp",))
_fuse_view_dual_jit = jax.jit(_fuse_view_dual,
                              static_argnames=("single_match_penalty", "fp"))


# ---------------------------------------------------------------------------
# host orchestration over reference views
# ---------------------------------------------------------------------------

class FusionView:
    """Loaded per-view fusion inputs (image rescaled to depth resolution,
    camera intrinsics rescaled accordingly — RescaleImageAndCamera,
    src/ACMMP.cpp:181-202)."""

    def __init__(self, image_rgb, cam: NumpyCamera, depth, normal,
                 mask=None, depth1=None, normal1=None):
        h, w = depth.shape
        if image_rgb.shape[:2] != (h, w):
            sx, sy = w / image_rgb.shape[1], h / image_rgb.shape[0]
            image_rgb = resize_image(image_rgb, w, h)
            K = cam.K.copy()
            K[0, :] *= sx
            K[1, :] *= sy
            cam = NumpyCamera(K=K, R=cam.R, t=cam.t, depth_min=cam.depth_min,
                              depth_max=cam.depth_max, width=w, height=h)
        else:
            cam = NumpyCamera(K=cam.K, R=cam.R, t=cam.t,
                              depth_min=cam.depth_min, depth_max=cam.depth_max,
                              width=w, height=h)
        self.image = image_rgb
        self.cam = cam
        self.depth = np.asarray(depth, np.float32)
        self.normal = np.asarray(normal, np.float32)
        self.depth1 = None if depth1 is None else np.asarray(depth1, np.float32)
        self.normal1 = None if normal1 is None else np.asarray(normal1, np.float32)
        self.mask = (np.zeros((h, w), bool) if mask is None
                     else np.asarray(mask, bool))


def _assemble_problem(prob, views, v_max, sh, sw, prior_aware):
    """Per-reference-view fusion arrays at the (sh, sw) padded source shape
    (pass v_max=None to pad to this problem's OWN sources — the sequential
    path; the mesh path passes the scene-wide stack shape). Masks are read
    HERE — the greedy consumption a problem sees is the mask state at
    assembly time."""
    i = prob.ref_image_id
    rv = views[i]
    src_ids = [s for s in prob.src_image_ids if s in views]
    if not src_ids:
        return None
    # fetch each view object ONCE (the stack passes and the pad-shape scan
    # below would otherwise cyclically thrash a LazyFusionViews LRU smaller
    # than the problem's view set); local strong refs bound peak memory at
    # exactly this problem's working set
    held = {s: views[s] for s in src_ids}
    if v_max is None:
        v_max = len(src_ids)
        sh = max(v.depth.shape[0] for v in held.values())
        sw = max(v.depth.shape[1] for v in held.values())
    pad_ids = src_ids + [src_ids[0]] * (v_max - len(src_ids))

    def stack(get, fill=0.0):
        out = []
        for s in pad_ids:
            a = get(held[s])
            pad = [(0, sh - a.shape[0]), (0, sw - a.shape[1])]
            if a.ndim == 3:
                pad.append((0, 0))
            out.append(np.pad(a, pad, constant_values=fill))
        return np.stack(out)

    arrays = dict(
        ref_mask=np.asarray(rv.mask),
        src_masks=stack(lambda v: v.mask, fill=True),
        view_mask=np.asarray(
            [True] * len(src_ids) + [False] * (v_max - len(src_ids))),
    )
    if prior_aware:
        arrays.update(
            ref_depth0=rv.depth, ref_normal0=rv.normal,
            ref_depth1=rv.depth1, ref_normal1=rv.normal1,
            src_depths0=stack(lambda v: v.depth),
            src_normals0=stack(lambda v: v.normal),
            src_depths1=stack(lambda v: v.depth1),
            src_normals1=stack(lambda v: v.normal1),
        )
    else:
        arrays.update(
            ref_depth=rv.depth, ref_normal=rv.normal,
            src_depths=stack(lambda v: v.depth),
            src_normals=stack(lambda v: v.normal),
        )
    cams = dict(ref_cam=rv.cam.to_jax(),
                src_cams=geo.stack_cameras(
                    [held[s].cam.to_jax() for s in pad_ids]))
    return i, rv, src_ids, arrays, cams


def _collect_accepted(i, rv, src_ids, views, accept, Xw, normal, consumed,
                      sinks, progress, debug_dir):
    """Apply one fused view's results: collect points, consume source
    pixels, report acceptance, optionally write the approved-pixel debug
    image (the reference writes approved_pixels_cam_N.png,
    acmmp_definitions.cpp:1035-1038)."""
    pts_out, nrm_out, col_out = sinks
    h, w = rv.depth.shape
    accept = np.asarray(accept)[:h, :w]
    Xw = np.asarray(Xw)[:h, :w]
    normal = np.asarray(normal)[:h, :w]
    consumed = np.asarray(consumed)
    pts_out.append(Xw[accept])
    nrm_out.append(normal[accept])
    col_out.append(rv.image[accept])
    mask_of = getattr(views, "mask_of", None)
    for j, s in enumerate(src_ids):
        # LazyFusionViews holds the pinned masks directly — don't reload a
        # whole evicted view's arrays just to OR its consumption mask
        m = mask_of(s) if mask_of is not None else views[s].mask
        m |= consumed[j][:m.shape[0], :m.shape[1]]
    from acmmp_tpu.parallel import multihost as mh

    if progress is not None:
        progress(i, int(np.sum(accept)))
    if debug_dir is not None and mh.is_primary():
        from PIL import Image as PILImage

        os.makedirs(debug_dir, exist_ok=True)
        PILImage.fromarray((accept * 255).astype(np.uint8)).save(
            os.path.join(debug_dir, f"approved_pixels_cam_{i}.png"))


def fuse_views(views: Dict[int, FusionView], problems: Sequence[Problem],
               fp: FusionParams, prior_aware: bool = False,
               single_match_penalty: int = 0, progress=None, mesh=None,
               debug_dir: Optional[str] = None):
    """Fuse all reference views into (points, normals, colors) numpy arrays.

    `views` maps image id -> FusionView; masks mutate greedily between
    reference views exactly like the reference's outer loop
    (acmmp_definitions.cpp:920-1031). With a mesh, the heavy per-view
    scoring (project/gather/threshold) runs in parallel groups of mesh
    size (shard_map over the "view" axis) and the sequential greedy
    consumption is replayed on the host from the returned per-view parts —
    the fused cloud equals the sequential one (test_parallel pins exact
    equality)."""
    sinks = ([], [], [])
    probs = [p for p in problems
             if [s for s in p.src_image_ids if s in views]]
    # scene-wide padded shape: needed only on the mesh path, where a group
    # of views must stack into one shard_map program. The sequential path
    # pads each problem to its OWN sources' max so a single large view
    # doesn't inflate every other view's kernel (compiles cache by shape).
    if mesh is not None:
        v_max = max(
            (len([s for s in p.src_image_ids if s in views]) for p in probs),
            default=0,
        )
        all_ids = {p.ref_image_id for p in probs} | {
            s for p in probs for s in p.src_image_ids if s in views}
        sh = max((views[i].depth.shape[0] for i in all_ids), default=1)
        sw = max((views[i].depth.shape[1] for i in all_ids), default=1)

    def run_one(arrays, cams):
        kw = {k: jnp.asarray(v) for k, v in arrays.items()}
        kw.update(cams)
        if prior_aware:
            accept, Xw, normal, consumed = _fuse_view_dual_jit(
                single_match_penalty=single_match_penalty, fp=fp, **kw)
            return accept, Xw, normal, consumed
        accept, Xw, consumed = _fuse_view_plain_jit(fp=fp, **kw)
        return accept, Xw, None, consumed

    group_size = 1 if mesh is None else int(mesh.devices.size)
    for g0 in range(0, len(probs), group_size):
        group = probs[g0:g0 + group_size]
        if mesh is None:
            asm = [a for a in
                   (_assemble_problem(p, views, None, None, None, prior_aware)
                    for p in group) if a is not None]
        else:
            asm = [a for a in
                   (_assemble_problem(p, views, v_max, sh, sw, prior_aware)
                    for p in group) if a is not None]
        if not asm:
            continue
        if mesh is None or len(asm) == 1:
            results = []
            for i, rv, src_ids, arrays, cams in asm:
                results.append(run_one(arrays, cams))
        else:
            results = _fuse_group_sharded(mesh, asm, prior_aware,
                                          single_match_penalty, fp)
        for (i, rv, src_ids, _a, _c), (accept, Xw, normal, consumed) \
                in zip(asm, results):
            if normal is None:
                normal = rv.normal
            _collect_accepted(i, rv, src_ids, views, accept, Xw, normal,
                              consumed, sinks, progress, debug_dir)
    pts_out, nrm_out, col_out = sinks
    if not pts_out:
        z = np.zeros((0, 3), np.float32)
        return z, z.copy(), np.zeros((0, 3), np.uint8)
    return (np.concatenate(pts_out), np.concatenate(nrm_out),
            np.concatenate(col_out).astype(np.uint8))


@functools.lru_cache(maxsize=None)
def _group_parts_fn(mesh, prior_aware, fp):
    """Cached jitted shard_map program: the per-view consistency PARTS of
    one fusion kernel per chip over a stacked group of reference views
    (greedy acceptance happens on the host, see _fuse_group_sharded)."""
    from jax.sharding import PartitionSpec as P

    from acmmp_tpu.parallel.shmap import shard_map

    from acmmp_tpu.parallel.sharding import VIEW_AXIS

    spec = P(VIEW_AXIS)

    def fn(stacked, cam_stack):
        def local(arrs, cams):
            def one(x):
                a, c = x
                if prior_aware:
                    return _fuse_view_dual_parts(
                        fp=fp, ref_cam=c["ref_cam"],
                        src_cams=c["src_cams"], **a)
                return _fuse_view_plain_parts(
                    fp=fp, ref_cam=c["ref_cam"], src_cams=c["src_cams"], **a)
            return jax.lax.map(one, (arrs, cams))

        in_specs = (jax.tree.map(lambda _: spec, stacked),
                    jax.tree.map(lambda _: spec, cam_stack))
        out_sd = jax.eval_shape(local, stacked, cam_stack)
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=jax.tree.map(lambda _: spec, out_sd),
                         check_rep=False)(stacked, cam_stack)

    return jax.jit(fn)


def _fuse_group_sharded(mesh, asm, prior_aware, single_match_penalty, fp):
    """Fuse one group of reference views with the expensive per-view work
    (project/gather/threshold/score) parallel over the mesh, then replay
    the reference's sequential greedy-consumption chain on the host from
    the returned parts — results are IDENTICAL to the sequential fusion
    (same traversal order, same mask state per member); only the heavy
    arithmetic is sharded. Returns per-member
    (accept, Xw, normal|None, consumed)."""
    g = len(asm)
    n = int(mesh.devices.size)
    g_pad = ((g + n - 1) // n) * n
    rh = max(a[1].depth.shape[0] for a in asm)
    rw = max(a[1].depth.shape[1] for a in asm)
    sh, sw = asm[0][3]["src_masks"].shape[1:3]

    def padref(x):
        x = np.asarray(x)
        if x.shape[:2] == (rh, rw):
            return x
        pad = [(0, rh - x.shape[0]), (0, rw - x.shape[1])]
        pad += [(0, 0)] * (x.ndim - 2)
        return np.pad(x, pad)

    stacked = {}
    for k in asm[0][3]:
        arrs = []
        for a in asm:
            x = np.asarray(a[3][k])
            if k.startswith(("ref_depth", "ref_normal", "ref_mask")):
                x = padref(x)
            arrs.append(x)
        arrs += [arrs[-1]] * (g_pad - g)
        stacked[k] = np.stack(arrs)
    cam_stack = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]
                             + [np.asarray(xs[-1])] * (g_pad - g)),
        *[a[4] for a in asm])

    # multi-process safe placement + fetch: the stacked group is sharded
    # over the view axis from each process's host copy, and the parts come
    # back to every host (each process replays the same greedy chain and
    # collects identical points; file writes are process-0-gated)
    from jax.sharding import PartitionSpec as P

    from acmmp_tpu.parallel import multihost as mh
    from acmmp_tpu.parallel.sharding import VIEW_AXIS

    place = lambda x: mh.host_to_global(mesh, P(VIEW_AXIS), x)  # noqa: E731
    res = jax.tree.map(mh.global_to_host,
                       _group_parts_fn(mesh, prior_aware, fp)(
                           jax.tree.map(place, stacked),
                           jax.tree.map(place, cam_stack)))

    # host-side greedy chain: delta[s] = source pixels consumed by EARLIER
    # members of this group (pre-group consumption is already in the masks
    # the kernel sampled), so the chain reproduces the sequential loop's
    # mask state for every member exactly
    delta = {}
    thr = fp.num_consistent_thresh
    cs = fp.consistency_scalar

    def masked_ok(ok, rr, cc, src_ids):
        ok = ok.copy()
        for j, s in enumerate(src_ids):
            dm = delta.get(s)
            if dm is not None:
                ok[j] &= ~dm[rr[j], cc[j]]
        return ok

    def ref_delta(i, valid):
        dm = delta.get(i)
        if dm is None:
            return valid
        crop = np.zeros((rh, rw), bool)
        hh, ww = min(rh, dm.shape[0]), min(rw, dm.shape[1])
        crop[:hh, :ww] = dm[:hh, :ww]
        return valid & ~crop

    def consume(accept, ok, rr, cc, src_ids):
        consumed = np.zeros((len(ok), sh, sw), bool)
        for j, s in enumerate(src_ids):
            sel = accept & ok[j]
            consumed[j, rr[j][sel], cc[j][sel]] = True
            dm = delta.setdefault(s, np.zeros((sh, sw), bool))
            dm |= consumed[j]
        return consumed

    out = []
    for k, (i, rv, src_ids, _a, _c) in enumerate(asm):
        if prior_aware:
            v0, v1 = res[0][k], res[1][k]
            Xw0, ok0, dyn0, rr0, cc0 = (q[k] for q in res[2])
            Xw1, ok1, dyn1, rr1, cc1 = (q[k] for q in res[3])
            ok0 = masked_ok(ok0, rr0, cc0, src_ids)
            ok1 = masked_ok(ok1, rr1, cc1, src_ids)
            v0 = ref_delta(i, v0)
            v1 = ref_delta(i, v1)
            n0, n1 = ok0.sum(0), ok1.sum(0)
            d0 = (dyn0 * ok0).sum(0)
            d1 = (dyn1 * ok1).sum(0)
            pass0 = (n0 >= thr) & (d0 > cs * n0) & v0
            pass1 = (n1 >= thr) & (d1 > cs * n1) & v1
            both = pass0 & pass1
            use1 = np.where(both, n1 >= n0, pass1)
            harsh = thr + single_match_penalty
            single_ok = np.where(use1, n1 >= harsh, n0 >= harsh)
            accept = np.where(both, True, (pass0 | pass1) & single_ok)
            accept = accept & (v0 | v1)
            Xw = np.where(use1[..., None], Xw1, Xw0)
            normal = np.where(use1[..., None], padref(rv.normal1),
                              padref(rv.normal))
            ok = np.where(use1[None, ...], ok1, ok0)
            rr = np.where(use1[None, ...], rr1, rr0)
            cc = np.where(use1[None, ...], cc1, cc0)
            consumed = consume(accept, ok, rr, cc, src_ids)
            out.append((accept, Xw, normal, consumed))
        else:
            valid, Xw, ok, dyn, rr, cc = (q[k] for q in res)
            ok = masked_ok(ok, rr, cc, src_ids)
            valid = ref_delta(i, valid)
            nc = ok.sum(0)
            dc = (dyn * ok).sum(0)
            accept = valid & (nc >= thr) & (dc > cs * nc)
            consumed = consume(accept, ok, rr, cc, src_ids)
            out.append((accept, Xw, None, consumed))
    return out


class LazyFusionViews(Mapping):
    """Memory-bounded fusion view set: loads each view's heavy arrays
    (image/depth/normal) on demand and keeps at most `max_cached` views
    resident (LRU), while the greedy-consumption masks are pinned for the
    whole fusion — evict/reload preserves the exact sequential mask state
    (checkpoint arrays on disk are immutable during fusion; only masks
    mutate). The reference loads every view up front
    (acmmp_definitions.cpp:852-914): ~150 MB/view at DTU full resolution,
    ~9 GB host for a 64-view scan — this keeps fusion O(cache) instead."""

    def __init__(self, ids, load_one, max_cached: int):
        from collections import OrderedDict

        self._ids = list(ids)
        self._idset = set(ids)
        self._load_one = load_one
        # a problem touches itself + its sources each step; anything
        # smaller than 2 would thrash within a single assembly
        self._cap = max(int(max_cached), 2)
        self._masks: Dict[int, np.ndarray] = {}
        self._cache = OrderedDict()

    def __getitem__(self, i):
        if i not in self._idset:
            raise KeyError(i)
        fv = self._cache.get(i)
        if fv is None:
            fv = self._load_one(i)
            # pin the mask: first load donates its (mask_dir-initialized)
            # mask; reloads adopt the accumulated one
            fv.mask = self._masks.setdefault(i, fv.mask)
            self._cache[i] = fv
            while len(self._cache) > self._cap:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(i)
        return fv

    def mask_of(self, i) -> np.ndarray:
        """The pinned consumption mask for view `i`, WITHOUT keeping the
        view's heavy arrays resident (first access loads once to pick up
        the mask_dir initialization)."""
        m = self._masks.get(i)
        if m is None:
            m = self[i].mask
        return m

    def __iter__(self):
        return iter(self._ids)

    def __len__(self):
        return len(self._ids)

    def __contains__(self, i):
        return i in self._idset


def load_fusion_views(dense_folder: str, out_folder: str,
                      problems: Sequence[Problem], geom_consistency: bool,
                      image_dir: str = "images",
                      mask_dir: Optional[str] = None,
                      second_folder: Optional[str] = None,
                      max_cached: int = 0) -> Mapping:
    """Load depth/normal checkpoints + images for fusion (RunFusion's loader,
    acmmp_definitions.cpp:852-914). If `second_folder` is given, also load
    the dual-hypothesis recon from it (prior-aware fusion). With
    `max_cached > 0`, views are loaded lazily with an LRU cap instead of
    all up front (LazyFusionViews)."""
    from PIL import Image as PILImage

    suffix = "depths_geom.dmb" if geom_consistency else "depths.dmb"

    def load_one(i: int) -> FusionView:
        rdir = result_dir(out_folder, i)
        depth = read_dmb(os.path.join(rdir, suffix))
        normal = read_dmb(os.path.join(rdir, "normals.dmb"))
        img = load_image_color(image_path(dense_folder, i, image_dir))
        cam = read_cam_txt(cam_path(dense_folder, i))
        mask = None
        if mask_dir:
            mpath = os.path.join(dense_folder, mask_dir, f"{i:08d}.png")
            if os.path.exists(mpath):
                m = np.asarray(PILImage.open(mpath).convert("L"))
                m = resize_image(m, depth.shape[1], depth.shape[0])
                mask = m < 128
        d1 = n1 = None
        if second_folder is not None:
            rdir1 = result_dir(second_folder, i)
            d1 = read_dmb(os.path.join(rdir1, suffix))
            n1 = read_dmb(os.path.join(rdir1, "normals.dmb"))
        return FusionView(img, cam, depth, normal, mask=mask,
                          depth1=d1, normal1=n1)

    ids = [p.ref_image_id for p in problems]
    if max_cached > 0:
        return LazyFusionViews(ids, load_one, max_cached)
    return {i: load_one(i) for i in ids}


def run_fusion(dense_folder: str, out_folder: str, problems: Sequence[Problem],
               geom_consistency: bool, fp: FusionParams,
               image_dir: str = "images", mask_dir: Optional[str] = None,
               ply_name: str = "ACMMP_model.ply", progress=None,
               mesh=None, debug_dir: Optional[str] = None,
               view_cache: int = 0) -> str:
    views = load_fusion_views(dense_folder, out_folder, problems,
                              geom_consistency, image_dir, mask_dir,
                              max_cached=view_cache)
    pts, nrm, col = fuse_views(views, problems, fp, progress=progress,
                               mesh=mesh, debug_dir=debug_dir)
    ply_path = os.path.join(out_folder, ply_name)
    _write_ply_primary(ply_path, pts, nrm, col)
    return ply_path


def _write_ply_primary(ply_path, pts, nrm, col):
    """Multi-process: every process holds identical fused points (the parts
    are allgathered); exactly one writes the shared PLY, everyone waits."""
    from acmmp_tpu.parallel import multihost as mh

    if mh.is_primary():
        write_ply(ply_path, pts, nrm, col)
    mh.barrier("fusion_ply")


def run_prior_aware_fusion(dense_folder: str, out_folder: str,
                           fusion_folder: str, problems: Sequence[Problem],
                           geom_consistency: bool, fp: FusionParams,
                           single_match_penalty: int = 0,
                           mask_dir: Optional[str] = None,
                           ply_name: str = "ACMMP_prior_model.ply",
                           progress=None, mesh=None,
                           debug_dir: Optional[str] = None,
                           view_cache: int = 0) -> str:
    """Dual-hypothesis fusion: candidate 0 from `fusion_folder`, candidate 1
    from `out_folder` (RunPriorAwareFusion, acmmp_definitions.cpp:573-826)."""
    views = load_fusion_views(dense_folder, fusion_folder, problems,
                              geom_consistency, mask_dir=mask_dir,
                              second_folder=out_folder,
                              max_cached=view_cache)
    pts, nrm, col = fuse_views(views, problems, fp, prior_aware=True,
                               single_match_penalty=single_match_penalty,
                               progress=progress, mesh=mesh,
                               debug_dir=debug_dir)
    ply_path = os.path.join(out_folder, ply_name)
    _write_ply_primary(ply_path, pts, nrm, col)
    return ply_path
