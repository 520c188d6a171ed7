"""Host-side analysis: distribution of per-tap chunk-scan iteration counts
(n_rb * n_cols) the Pallas NCC kernel would execute, per workload."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.ops import ncc as ncc_ops
from acmmp_tpu.ops import parity
from acmmp_tpu.ops import sampling as samp_ops
from acmmp_tpu.utils.synth import textured_plane_scene

TILE_H, TILE_W = 8, 128
params = PatchMatchParams()
H0, W0, V = 240, 320, 4
images, cams, plane_z = textured_plane_scene(
    n_views=V + 1, width=W0, height=H0, f=600.0, plane_z=5.0)
inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:], params)
vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
H, W = inputs.ref_img.shape
x, y = geo.pixel_grid(H, W)
n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
depth = jnp.full(x.shape, plane_z)

pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
off0 = parity.row_pack_offset(pm)

Hs, Ws = inputs.src_imgs.shape[1:]
Hs_p = ((Hs + 15) // 16) * 16
Ws_p = ((Ws + 127) // 128) * 128

taps = ncc_ops.tap_weights_spatial(params)


def field(kind, key):
    if kind == "true":
        return geo.plane_from_depth_normal(inputs.ref_cam, x, y, depth, n_cam)
    if kind == "jitter2pct":
        dj = 1.0 + 0.02 * jax.random.normal(key, x.shape)
        return geo.plane_from_depth_normal(inputs.ref_cam, x, y, depth * dj,
                                           n_cam)
    return samp_ops.random_plane(key, inputs.ref_cam, x, y,
                                 inputs.depth_min, inputs.depth_max)


def chunk_iters(planes):
    planes_p = parity.pack_rows_c(planes, off0)[None]  # [1,Hg,W,4]
    m = jnp.einsum("ij,khwj->khwi", vg.KrT, planes_p[..., :3])
    inv_w = 1.0 / planes_p[..., 3]
    Hg = planes_p.shape[1]
    totals = np.zeros((V,), np.int64)
    row_spans = []
    ii = np.arange(Hg)[:, None] * np.ones((1, W), int)
    jj = np.ones((Hg, 1), int) * np.arange(W)[None, :]
    rr = 2 * ii + (int(off0) + jj) % 2
    yy = rr.astype(np.float32)
    xx = jj.astype(np.float32)
    mf = np.asarray(m[0])
    iw = np.asarray(inv_w[0])
    A = np.asarray(vg.A)
    B = np.asarray(vg.B)
    for v in range(V):
        per_tile = np.zeros((Hg // TILE_H, W // TILE_W), np.int64)
        for di, dj, _w in taps:
            qx = xx + di
            qy = yy + dj
            mq = (mf[..., 0] * qx + mf[..., 1] * qy + mf[..., 2]) * iw
            px = A[v, 0, 0] * qx + A[v, 0, 1] * qy + A[v, 0, 2] - B[v, 0] * mq
            py = A[v, 1, 0] * qx + A[v, 1, 1] * qy + A[v, 1, 2] - B[v, 1] * mq
            pz = A[v, 2, 0] * qx + A[v, 2, 1] * qy + A[v, 2, 2] - B[v, 2] * mq
            sx = np.clip(np.nan_to_num(px / pz), 0.0, Ws_p - 1.0)
            sy = np.clip(np.nan_to_num(py / pz), 0.0, Hs_p - 1.0)
            xi = np.floor(sx).astype(int)
            yi = np.floor(sy).astype(int)
            for ti in range(Hg // TILE_H):
                for tj in range(W // TILE_W):
                    ys = yi[ti * 8:(ti + 1) * 8, tj * 128:(tj + 1) * 128]
                    xs = xi[ti * 8:(ti + 1) * 8, tj * 128:(tj + 1) * 128]
                    rb_lo = ys.min() // TILE_H
                    rb_hi = min(ys.max() + 1, Hs_p - 1) // TILE_H
                    n_rb = rb_hi + 1 - rb_lo
                    col_lo = xs.min() // TILE_W
                    col_hi = min((xs.max() + 1) // TILE_W, Ws_p // TILE_W - 1)
                    n_cols = col_hi + 1 - col_lo
                    per_tile[ti, tj] += n_rb * n_cols
                    if v == 0:
                        row_spans.append(ys.max() - ys.min() + 1)
        totals[v] = per_tile.sum()
    return totals, np.asarray(row_spans)


for kind in ["true", "jitter2pct", "random"]:
    t, spans = chunk_iters(field(kind, jax.random.key(0)))
    n_tiles = (H // 2 // TILE_H) * (W // TILE_W)
    print(f"{kind:10s}: chunk-iters/view {t} "
          f"mean/tile/tap {t[0] / n_tiles / len(taps):6.2f} "
          f"row-span p50/p90/max {np.percentile(spans, 50):.0f}/"
          f"{np.percentile(spans, 90):.0f}/{spans.max()}")
