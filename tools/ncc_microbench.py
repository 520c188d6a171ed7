"""Microbenchmark of the Pallas warped-ZNCC kernel on the real TPU.

Times `multiview_zncc_pallas` in isolation at the bench shape (320x240,
4 source views, parity-packed K=9 hypothesis stacks) with an in-program
repetition loop over distinct plane fields and a forced host transfer
(per CLAUDE.md timing rules). Two workloads:

  * coherent — near-true plane field with small per-pixel noise: the
    propagation-sweep common case (tight per-tap row bboxes);
  * random — per-pixel random hypotheses: the exploration worst case.

Usage: python tools/ncc_microbench.py [--height 240] [--width 320]
"""

import argparse
import functools
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
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--packed", type=int, default=1)
    ap.add_argument("--k_shared", type=int, default=0,
                    help="K-batched tile visits (union scan window)")
    ap.add_argument("--workload", default="both",
                    choices=["coherent", "random", "both"])
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
        f=600.0, plane_z=5.0)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)

    # coherent base field: the true plane
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    depth = jnp.full(x.shape, plane_z)
    true_planes = geo.plane_from_depth_normal(inputs.ref_cam, x, y, depth,
                                              n_cam)

    if args.packed:
        pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
        off0 = parity.row_pack_offset(pm)
    else:
        off0 = None

    def make_stack(key, kind):
        ks = jax.random.split(key, args.k)
        fields = []
        for i in range(args.k):
            if kind == "coherent":
                # neighbor-plane candidates: true plane + small depth jitter
                dj = 1.0 + 0.02 * jax.random.normal(ks[i], x.shape)
                f = geo.plane_from_depth_normal(inputs.ref_cam, x, y,
                                                depth * dj, n_cam)
            else:
                f = samp_ops.random_plane(ks[i], inputs.ref_cam, x, y,
                                          inputs.depth_min, inputs.depth_max)
            if args.packed:
                f = parity.pack_rows_c(f, off0)
            fields.append(f)
        return jnp.stack(fields)

    @functools.partial(jax.jit, static_argnames=())
    def many(planes_stack):
        def body(c, p):
            out = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, p, params,
                row_pack_off=off0, k_shared=bool(args.k_shared))
            return c + jnp.mean(out), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), planes_stack)
        return tot

    kinds = (["coherent", "random"] if args.workload == "both"
             else [args.workload])
    for kind in kinds:
        keys = jax.random.split(jax.random.key(hash(kind) % 2**31), args.reps)
        stack = jnp.stack([make_stack(k, kind) for k in keys])
        float(many(stack))  # warmup/compile at the timed shape
        t0 = time.perf_counter()
        v = float(many(stack))
        dt = time.perf_counter() - t0
        per_call = dt / args.reps
        Hg = H // 2 if args.packed else H
        cells = args.k * args.views * (Hg // 8) * (W // 128)
        print(f"{kind:9s}: {per_call * 1e3:8.2f} ms/call "
              f"({args.k} hyp x {args.views} views, {Hg}x{W}) "
              f"{per_call / cells * 1e6:7.2f} us/grid-step  [sum={v:.3f}]")


if __name__ == "__main__":
    main()
