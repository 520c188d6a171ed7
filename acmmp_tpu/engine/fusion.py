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
DEVIATIONS.md). On a pod, reference views shard across chips and the masks
become a ragged all-reduce at view-group barriers.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acmmp_tpu.config import FusionParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.io import read_dmb, write_ply
from acmmp_tpu.io.dense_folder import (
    NumpyCamera, Problem, cam_path, image_path, load_image_color,
    read_cam_txt, resize_image, result_dir,
)


# ---------------------------------------------------------------------------
# jitted per-reference-view kernels
# ---------------------------------------------------------------------------

def _per_view_consistency(ref_cam, src_cams, src_depths, src_normals,
                          src_masks, Xw, ref_depth, ref_normal, x, y,
                          fp: FusionParams):
    """Project ref pixels into each source view and score consistency.

    Returns per-view (consistent [V,H,W], dyn [V,H,W], src_r, src_c)."""

    def one(src_cam, sd, sn, sm):
        uv, _ = geo.project(src_cam, Xw)
        src_c = jnp.floor(uv[..., 0] + 0.5).astype(jnp.int32)
        src_r = jnp.floor(uv[..., 1] + 0.5).astype(jnp.int32)
        inb = (
            (src_c >= 0) & (src_c < src_cam.width.astype(jnp.int32))
            & (src_r >= 0) & (src_r < src_cam.height.astype(jnp.int32))
        )
        cc = jnp.clip(src_c, 0, sd.shape[1] - 1)
        rr = jnp.clip(src_r, 0, sd.shape[0] - 1)
        sdepth = sd[rr, cc]
        snormal = sn[rr, cc]
        smask = sm[rr, cc]
        Xs = geo.world_point(src_cam, cc.astype(jnp.float32),
                             rr.astype(jnp.float32), sdepth)
        buv, proj_depth = geo.project(ref_cam, Xs)
        err = jnp.sqrt((x - buv[..., 0]) ** 2 + (y - buv[..., 1]) ** 2)
        rdd = jnp.abs(proj_depth - ref_depth) / jnp.maximum(ref_depth, 1e-12)
        ang = geo.angle_between(ref_normal, snormal)
        ok = (
            inb & ~smask & (sdepth > 0.0)
            & (err < fp.max_reproj_error)
            & (rdd < fp.max_relative_depth_diff)
            & (ang < fp.max_normal_angle)
        )
        dyn = jnp.exp(-(err + fp.depth_diff_weight * rdd + fp.angle_weight * ang))
        return ok, jnp.where(ok, dyn, 0.0), rr, cc

    return jax.vmap(one)(src_cams, src_depths, src_normals, src_masks)


def _fuse_view_plain(ref_depth, ref_normal, ref_mask, ref_cam, src_cams,
                     src_depths, src_normals, src_masks, view_mask,
                     fp: FusionParams):
    H, W = ref_depth.shape
    x, y = geo.pixel_grid(H, W)
    valid = (~ref_mask) & (ref_depth > 0.0) & (ref_depth < ref_cam.depth_max)
    Xw = geo.world_point(ref_cam, x, y, ref_depth)
    ok, dyn, rr, cc = _per_view_consistency(
        ref_cam, src_cams, src_depths, src_normals, src_masks, Xw,
        ref_depth, ref_normal, x, y, fp,
    )
    ok = ok & view_mask[:, None, None]
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


def _fuse_view_dual(ref_depth0, ref_normal0, ref_depth1, ref_normal1,
                    ref_mask, ref_cam, src_cams,
                    src_depths0, src_normals0, src_depths1, src_normals1,
                    src_masks, view_mask, single_match_penalty,
                    fp: FusionParams):
    """Dual-hypothesis prior-aware fusion: candidate 0 = base recon,
    candidate 1 = second recon; each candidate is scored against BOTH source
    recons per view taking the better (get_consistency_metrics,
    acmmp_definitions.cpp:454-518)."""
    H, W = ref_depth0.shape
    x, y = geo.pixel_grid(H, W)

    def score(ref_depth, ref_normal):
        Xw = geo.world_point(ref_cam, x, y, ref_depth)
        ok0, dyn0, rr, cc = _per_view_consistency(
            ref_cam, src_cams, src_depths0, src_normals0, src_masks, Xw,
            ref_depth, ref_normal, x, y, fp)
        ok1, dyn1, _, _ = _per_view_consistency(
            ref_cam, src_cams, src_depths1, src_normals1, src_masks, Xw,
            ref_depth, ref_normal, x, y, fp)
        ok = (ok0 | ok1) & view_mask[:, None, None]
        dyn = jnp.where(ok0 & ok1, jnp.maximum(dyn0, dyn1),
                        jnp.where(ok0, dyn0, dyn1))
        dyn = jnp.where(ok, dyn, 0.0)
        n = jnp.sum(ok, axis=0)
        d = jnp.sum(dyn, axis=0)
        passing = (n >= fp.num_consistent_thresh) & (
            d > fp.consistency_scalar * n)
        return Xw, ok, rr, cc, n, passing

    v0 = (~ref_mask) & (ref_depth0 > 0.0)
    v1 = (~ref_mask) & (ref_depth1 > 0.0)
    Xw0, ok_v0, rr, cc, n0, pass0 = score(ref_depth0, ref_normal0)
    Xw1, ok_v1, rr1, cc1, n1, pass1 = score(ref_depth1, ref_normal1)
    pass0, pass1 = pass0 & v0, pass1 & v1

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


def fuse_views(views: Dict[int, FusionView], problems: Sequence[Problem],
               fp: FusionParams, prior_aware: bool = False,
               single_match_penalty: int = 0, progress=None):
    """Fuse all reference views into (points, normals, colors) numpy arrays.

    `views` maps image id -> FusionView; masks mutate greedily between
    reference views exactly like the reference's outer loop."""
    pts_out, nrm_out, col_out = [], [], []
    v_max = max(
        (len([s for s in p.src_image_ids if s in views]) for p in problems),
        default=0,
    )
    for prob in problems:
        i = prob.ref_image_id
        rv = views[i]
        src_ids = [s for s in prob.src_image_ids if s in views]
        if not src_ids:
            continue
        # pad source stacks (views and pixels) to static shapes so the jitted
        # kernel compiles once per shape bucket
        sh = max(views[s].depth.shape[0] for s in src_ids)
        sw = max(views[s].depth.shape[1] for s in src_ids)
        pad_ids = src_ids + [src_ids[0]] * (v_max - len(src_ids))

        def stack(get, fill=0.0):
            out = []
            for s in pad_ids:
                a = get(views[s])
                pad = [(0, sh - a.shape[0]), (0, sw - a.shape[1])]
                if a.ndim == 3:
                    pad.append((0, 0))
                out.append(np.pad(a, pad, constant_values=fill))
            return jnp.asarray(np.stack(out))

        src_cams = geo.stack_cameras([views[s].cam.to_jax() for s in pad_ids])
        view_mask = jnp.asarray(
            [True] * len(src_ids) + [False] * (v_max - len(src_ids))
        )
        common = dict(
            ref_mask=jnp.asarray(rv.mask),
            ref_cam=rv.cam.to_jax(),
            src_cams=src_cams,
            src_masks=stack(lambda v: v.mask, fill=True),
            view_mask=view_mask,
            fp=fp,
        )
        if prior_aware:
            accept, Xw, normal, consumed = _fuse_view_dual_jit(
                ref_depth0=jnp.asarray(rv.depth),
                ref_normal0=jnp.asarray(rv.normal),
                ref_depth1=jnp.asarray(rv.depth1),
                ref_normal1=jnp.asarray(rv.normal1),
                src_depths0=stack(lambda v: v.depth),
                src_normals0=stack(lambda v: v.normal),
                src_depths1=stack(lambda v: v.depth1),
                src_normals1=stack(lambda v: v.normal1),
                single_match_penalty=single_match_penalty,
                **common,
            )
            normal = np.asarray(normal)
        else:
            accept, Xw, consumed = _fuse_view_plain_jit(
                ref_depth=jnp.asarray(rv.depth),
                ref_normal=jnp.asarray(rv.normal),
                src_depths=stack(lambda v: v.depth),
                src_normals=stack(lambda v: v.normal),
                **common,
            )
            normal = rv.normal
        accept = np.asarray(accept)
        Xw = np.asarray(Xw)
        consumed = np.asarray(consumed)
        pts_out.append(Xw[accept])
        nrm_out.append(np.asarray(normal)[accept])
        col_out.append(rv.image[accept])
        for j, s in enumerate(src_ids):
            h, w = views[s].mask.shape
            views[s].mask |= consumed[j][:h, :w]
        if progress is not None:
            progress(i, int(accept.sum()))
    if not pts_out:
        z = np.zeros((0, 3), np.float32)
        return z, z.copy(), np.zeros((0, 3), np.uint8)
    return (np.concatenate(pts_out), np.concatenate(nrm_out),
            np.concatenate(col_out).astype(np.uint8))


def load_fusion_views(dense_folder: str, out_folder: str,
                      problems: Sequence[Problem], geom_consistency: bool,
                      image_dir: str = "images",
                      mask_dir: Optional[str] = None,
                      second_folder: Optional[str] = None) -> Dict[int, FusionView]:
    """Load depth/normal checkpoints + images for fusion (RunFusion's loader,
    acmmp_definitions.cpp:852-914). If `second_folder` is given, also load
    the dual-hypothesis recon from it (prior-aware fusion)."""
    from PIL import Image as PILImage

    views: Dict[int, FusionView] = {}
    suffix = "depths_geom.dmb" if geom_consistency else "depths.dmb"
    for prob in problems:
        i = prob.ref_image_id
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
        views[i] = FusionView(img, cam, depth, normal, mask=mask,
                              depth1=d1, normal1=n1)
    return views


def run_fusion(dense_folder: str, out_folder: str, problems: Sequence[Problem],
               geom_consistency: bool, fp: FusionParams,
               image_dir: str = "images", mask_dir: Optional[str] = None,
               ply_name: str = "ACMMP_model.ply", progress=None) -> str:
    views = load_fusion_views(dense_folder, out_folder, problems,
                              geom_consistency, image_dir, mask_dir)
    pts, nrm, col = fuse_views(views, problems, fp, progress=progress)
    ply_path = os.path.join(out_folder, ply_name)
    write_ply(ply_path, pts, nrm, col)
    return ply_path


def run_prior_aware_fusion(dense_folder: str, out_folder: str,
                           fusion_folder: str, problems: Sequence[Problem],
                           geom_consistency: bool, fp: FusionParams,
                           single_match_penalty: int = 0,
                           mask_dir: Optional[str] = None,
                           ply_name: str = "ACMMP_prior_model.ply",
                           progress=None) -> str:
    """Dual-hypothesis fusion: candidate 0 from `fusion_folder`, candidate 1
    from `out_folder` (RunPriorAwareFusion, acmmp_definitions.cpp:573-826)."""
    views = load_fusion_views(dense_folder, fusion_folder, problems,
                              geom_consistency, mask_dir=mask_dir,
                              second_folder=out_folder)
    pts, nrm, col = fuse_views(views, problems, fp, prior_aware=True,
                               single_match_penalty=single_match_penalty,
                               progress=progress)
    ply_path = os.path.join(out_folder, ply_name)
    write_ply(ply_path, pts, nrm, col)
    return ply_path
