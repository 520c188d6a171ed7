"""Measure the early tile-skip lever's ceiling (VERDICT r3 item 6).

A (view, tile) visit of the K-batched propagation NCC can be skipped with
EXACT semantics when every propagation candidate plane equals the
incumbent plane at every pixel of the (8, 128) tile (converged planar
regions: PatchMatch propagation copies plane params bitwise, and the
incumbent's per-view costs are already carried in state.ncc_pv, which is
bitwise what re-evaluation would produce). This tool measures, per
half-sweep, the fraction of packed-grid tiles that satisfy the predicate
— the upper bound on propagation-NCC work the skip could remove.

Usage: python tools/converged_tiles.py [--scene relief|plane]
       [--height 240 --width 320 --views 4] [--iters 3] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="relief", choices=["plane", "relief"])
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.engine.patchmatch import (
        Mode, init_state, sweep_once,
    )
    from acmmp_tpu.ops import propagation as prop_ops
    from acmmp_tpu.utils.synth import (
        textured_plane_scene, textured_relief_scene,
    )

    params = PatchMatchParams(max_iterations=args.iters)
    if args.scene == "plane":
        images, cams, _ = textured_plane_scene(
            n_views=args.views + 1, width=args.width, height=args.height,
            f=600.0 * args.width / 320.0)
    else:
        images, cams, _ = textured_relief_scene(
            n_views=args.views + 1, width=args.width, height=args.height,
            f=140.0 * args.width / 96.0)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)

    @jax.jit
    def tile_converged_frac(costs, planes):
        cand, _flags = prop_ops.best_neighbor_planes(
            costs, planes, x, y, inputs.ref_cam.width,
            inputs.ref_cam.height, params)
        eq = jnp.all(cand == planes[None], axis=(0, -1))       # [H, W]
        th, tw = H // 8, W // 128
        tiles = eq[:th * 8, :tw * 128].reshape(th, 8, tw, 128)
        return jnp.mean(jnp.all(tiles, axis=(1, 3)))

    key = jax.random.key(0)
    k_init, k_sweeps = jax.random.split(key)
    state = jax.jit(init_state, static_argnames=("params", "mode"))(
        inputs, k_init, params=params, mode=Mode())
    for s in range(2 * params.max_iterations):
        frac = float(tile_converged_frac(state.costs, state.planes))
        print(f"before half-sweep {s}: converged-tile fraction "
              f"{frac:.3f}", flush=True)
        state = sweep_once(state, inputs, s,
                           jax.random.fold_in(k_sweeps, s), params, Mode())
    frac = float(tile_converged_frac(state.costs, state.planes))
    print(f"after final half-sweep: converged-tile fraction {frac:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
