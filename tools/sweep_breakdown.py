"""Per-call breakdown of one half-sweep's NCC work on the real TPU.

A mid-sweep half-sweep issues three kernel calls (engine/patchmatch.py):
  * prop   — K=8 checkerboard-propagation candidates, K-shared
             (coherent: neighbor pixels' planes);
  * now    — K=3 refinement candidates sharing the incumbent depth,
             K-shared (coherent);
  * rand   — K=2 refinement candidates sharing one per-pixel random
             depth, K-shared (identical centers, but the tile scan
             window is the FULL epipolar range — the scale-dependent
             cost at the DTU operating point).

Also times `rand` with the depth drawn from a per-(8,128)-tile random
subrange (window fraction --window), previewing the ceiling of
tile-windowed random search (docs/PERF.md "candidate not yet taken")
WITHOUT changing the engine.

Usage: python tools/sweep_breakdown.py --height 1184 --width 1600 --views 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1184)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--window", type=float, default=0.125)
    ap.add_argument("--min_cos", type=float, default=0.25)
    args = ap.parse_args()

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.ops import parity
    from acmmp_tpu.ops import sampling as samp_ops
    from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas
    from acmmp_tpu.utils.synth import textured_plane_scene

    params = PatchMatchParams()
    images, cams, plane_z = textured_plane_scene(
        n_views=args.views + 1, width=args.width, height=args.height,
        f=600.0 * args.width / 320.0, plane_z=5.0)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    cam = inputs.ref_cam
    dmin, dmax = float(inputs.depth_min), float(inputs.depth_max)

    black = (x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0
    off0 = parity.row_pack_offset(black)
    xp, yp = parity.pack_rows(x, off0), parity.pack_rows(y, off0)
    g = xp.shape
    nv = jnp.sum(inputs.view_mask)

    k0 = jax.random.key(11)

    def near_true_depth(k, scale=0.02):
        n = jax.random.normal(k, g, jnp.float32) * scale * plane_z
        return jnp.clip(plane_z + n, dmin, dmax)

    def planes_from(k, depth, min_cos=0.0):
        n = samp_ops.random_unit_normal(k, cam, xp, yp, depth,
                                        min_cos=min_cos)
        return geo.plane_from_depth_normal(cam, xp, yp, depth, n)

    def stack(kk, depths, min_cos=0.0):
        return jnp.stack([planes_from(jax.random.fold_in(kk, i), d, min_cos)
                          for i, d in enumerate(depths)])

    # prop: 8 near-identical near-true fields (neighbor planes)
    prop = stack(jax.random.fold_in(k0, 0),
                 [near_true_depth(jax.random.fold_in(k0, 10 + i))
                  for i in range(8)])
    # now: 3 candidates sharing one near-true depth field
    d_now = near_true_depth(jax.random.fold_in(k0, 1))
    now3 = stack(jax.random.fold_in(k0, 2), [d_now, d_now, d_now])
    # rand: 2 candidates sharing one full-range random depth field
    d_rand = jax.random.uniform(jax.random.fold_in(k0, 3), g, jnp.float32,
                                dmin, dmax)
    rand2 = stack(jax.random.fold_in(k0, 4), [d_rand, d_rand])
    # rand, tile-windowed: same per-pixel uniform u, but mapped into a
    # per-(8,128)-tile random subrange of fraction f
    f = args.window
    th, tw = g[0] // 8, g[1] // 128
    w0 = jax.random.uniform(jax.random.fold_in(k0, 5), (th, tw), jnp.float32,
                            0.0, 1.0 - f)
    w0 = jnp.repeat(jnp.repeat(w0, 8, axis=0), 128, axis=1)
    u = (d_rand - dmin) / (dmax - dmin)
    d_win = dmin + (w0 + u * f) * (dmax - dmin)
    rand2w = stack(jax.random.fold_in(k0, 4), [d_win, d_win])

    def timed(name, planes, k_shared=True):
        @jax.jit
        def run(p):
            out = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, p, params,
                row_pack_off=off0, n_views=nv, k_shared=k_shared)
            return jnp.sum(out)

        float(run(planes))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(run(planes))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name:22s}: {dt:9.2f} ms/call")
        return dt

    t_prop = timed(f"prop   K=8 coherent", prop)
    t_now = timed(f"now    K=3 coherent", now3)
    t_rand = timed(f"rand   K=2 shared-d", rand2)
    t_wind = timed(f"rand   K=2 tile-win", rand2w)
    total = t_prop + t_now + t_rand
    print(f"{'sweep NCC total':22s}: {total:9.2f} ms "
          f"(rand = {100 * t_rand / total:.0f}%)")
    print(f"tile-window ceiling   : sweep NCC -> "
          f"{t_prop + t_now + t_wind:9.2f} ms at f={f}")

    # --- the normal-obliquity axis: same depth structures, normals drawn
    # on the spherical cap dot(n, -view_dir) >= min_cos (DEVIATIONS #19).
    # Tests whether the per-tile scan blowup is driven by grazing normals
    # rather than (only) by depth spread. Fronto (cos=1-) is the floor.
    mc = args.min_cos
    now3c = stack(jax.random.fold_in(k0, 2), [d_now, d_now, d_now],
                  min_cos=mc)
    rand2c = stack(jax.random.fold_in(k0, 4), [d_rand, d_rand], min_cos=mc)
    rand2wc = stack(jax.random.fold_in(k0, 4), [d_win, d_win], min_cos=mc)
    now3f = stack(jax.random.fold_in(k0, 2), [d_now, d_now, d_now],
                  min_cos=0.995)
    t_nowc = timed(f"now    K=3 cap{mc:.2f}", now3c)
    t_randc = timed(f"rand   K=2 cap{mc:.2f}", rand2c)
    t_wandc = timed(f"randwin2 cap{mc:.2f}", rand2wc)
    t_nowf = timed(f"now    K=3 fronto", now3f)
    print(f"cap ceiling           : sweep NCC -> "
          f"{t_prop + t_nowc + t_randc:9.2f} ms at cap={mc}; "
          f"win+cap -> {t_prop + t_nowc + t_wandc:9.2f} ms")


if __name__ == "__main__":
    main()
