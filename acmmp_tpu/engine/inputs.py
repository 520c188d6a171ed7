"""Host-side assembly of SolverInputs: padding to static shapes, view-axis
padding/masking, relaxed depth ranges (InputInitialization,
src/ACMMP.cpp:525-636 — without the disk round-trips)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core.geometry import Camera, stack_cameras
from acmmp_tpu.engine.patchmatch import SolverInputs
from acmmp_tpu.io.dense_folder import NumpyCamera


def round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def pad_image_edge(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad bottom/right to (ph, pw) with edge replication so static-shift
    NCC taps see clamped values."""
    h, w = img.shape[:2]
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="edge")


def build_solver_inputs(
    ref_img: np.ndarray,
    src_imgs: Sequence[np.ndarray],
    ref_cam: NumpyCamera,
    src_cams: Sequence[NumpyCamera],
    params: PatchMatchParams,
    *,
    num_views_pad: Optional[int] = None,
    pad_h: int = 8,
    pad_w: int = 128,
    src_depths: Optional[Sequence[np.ndarray]] = None,
    init_depth: Optional[np.ndarray] = None,
    init_normal_world: Optional[np.ndarray] = None,
    init_cost: Optional[np.ndarray] = None,
    prior_planes: Optional[np.ndarray] = None,
    prior_mask: Optional[np.ndarray] = None,
    seed_planes: Optional[np.ndarray] = None,
    pre_costs: Optional[np.ndarray] = None,
) -> SolverInputs:
    V = len(src_imgs)
    Vp = num_views_pad or V
    assert Vp >= V

    H, W = ref_img.shape
    Hp, Wp = round_up(H, pad_h), round_up(W, pad_w)
    # sources may have different sizes; pad to a common static shape
    sh = max(max(s.shape[0] for s in src_imgs), 1)
    sw = max(max(s.shape[1] for s in src_imgs), 1)
    Hs, Ws = round_up(sh, pad_h), round_up(sw, pad_w)

    def _as_gray(img):
        img = np.asarray(img, np.float32)
        if params.ncc_src_u8:
            # 8-bit image contract (reference parity: ACMMP samples uint8
            # CUDA textures) — lets the Pallas NCC kernel pack 4 rows per
            # 32-bit gather word with no further precision loss
            img = np.rint(np.clip(img, 0.0, 255.0))
        return img

    ref_p = pad_image_edge(_as_gray(ref_img), Hp, Wp)
    srcs = [pad_image_edge(_as_gray(s), Hs, Ws) for s in src_imgs]
    while len(srcs) < Vp:
        srcs.append(np.zeros((Hs, Ws), np.float32))
    cams: List[NumpyCamera] = list(src_cams)
    while len(cams) < Vp:
        cams.append(src_cams[0] if src_cams else ref_cam)

    view_mask = np.zeros((Vp,), bool)
    view_mask[:V] = True

    depths = None
    if src_depths is not None:
        dl = [
            pad_image_edge(np.asarray(d, np.float32), Hs, Ws) for d in src_depths
        ]
        while len(dl) < Vp:
            dl.append(np.zeros((Hs, Ws), np.float32))
        depths = jnp.asarray(np.stack(dl))

    def _pad_hw(a, fill=0.0):
        if a is None:
            return None
        a = np.asarray(a, np.float32)
        pad = [(0, Hp - a.shape[0]), (0, Wp - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.asarray(np.pad(a, pad, mode="constant", constant_values=fill))

    pm = None
    if prior_mask is not None:
        m = np.zeros((Hp, Wp), bool)
        m[:H, :W] = np.asarray(prior_mask, bool)
        pm = jnp.asarray(m)

    return SolverInputs(
        ref_img=jnp.asarray(ref_p),
        src_imgs=jnp.asarray(np.stack(srcs)),
        ref_cam=ref_cam.to_jax(),
        src_cams=stack_cameras([c.to_jax() for c in cams]),
        view_mask=jnp.asarray(view_mask),
        depth_min=jnp.float32(ref_cam.depth_min * params.depth_min_relax),
        depth_max=jnp.float32(ref_cam.depth_max * params.depth_max_relax),
        src_depths=depths,
        init_depth=_pad_hw(init_depth),
        init_normal_world=_pad_hw(init_normal_world),
        init_cost=_pad_hw(init_cost),
        prior_planes=_pad_hw(prior_planes),
        prior_mask=pm,
        seed_planes=_pad_hw(seed_planes),
        pre_costs=_pad_hw(pre_costs),
    )
