"""Minimal repro/bisect harness for the XLA:TPU fused multi-sweep fault.

Round-1 finding: the single-program multi-sweep solve (run_patchmatch:
lax.scan over 4 half-sweeps) hits "TPU device error" above ~0.3 Mpx while
individual sweeps (run_patchmatch_staged) are fine. This script probes the
fused path at a given size with optional variations:

  --sweeps N       scan length (0 = init+finalize only)
  --unroll N       lax.scan unroll factor
  --donate         donate the state buffers through the scan (jit donation)
  --python_loop    unrolled python loop instead of lax.scan

Usage: python tools/fused_fault_repro.py --width 640 --height 480 [...]
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
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--python_loop", action="store_true")
    args = ap.parse_args()

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine import patchmatch as pm
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.utils.synth import textured_plane_scene

    params = PatchMatchParams()
    images, cams, _ = textured_plane_scene(
        n_views=args.views + 1, width=args.width, height=args.height,
        f=600.0 * args.width / 320.0, plane_z=5.0)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    mode = pm.Mode()
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    black = (x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0

    def solve(inputs, key):
        k_init, k_sweeps = jax.random.split(key)
        state = pm._init_state(inputs, params, mode, k_init)
        n = args.sweeps
        if args.python_loop:
            for s in range(n):
                parity = black if s % 2 == 0 else ~black
                state = pm._sweep(state, inputs, vg, x, y, parity,
                                  jnp.float32(s // 2),
                                  jax.random.fold_in(k_sweeps, s), params,
                                  mode)
        elif n > 0:
            iters = jnp.asarray([s // 2 for s in range(n)], jnp.float32)
            pars = jnp.asarray([s % 2 for s in range(n)], jnp.int32)
            keys = jax.vmap(lambda s: jax.random.fold_in(k_sweeps, s))(
                jnp.arange(n))

            def body(st, xs):
                it, par, k = xs
                parity = jnp.where(par == 0, black, ~black)
                return pm._sweep(st, inputs, vg, x, y, parity, it, k,
                                 params, mode), None

            state, _ = jax.lax.scan(body, state, (iters, pars, keys),
                                    unroll=args.unroll)
        return pm.finalize(state, inputs, params)

    jit_kw = {}
    if args.donate:
        jit_kw["donate_argnums"] = (0,)
    fn = jax.jit(solve, **jit_kw)
    t0 = time.perf_counter()
    try:
        out = fn(inputs, jax.random.key(0))
        d = jax.block_until_ready(out.depth)
        dt = time.perf_counter() - t0
        print(f"OK {args.width}x{args.height} sweeps={args.sweeps} "
              f"unroll={args.unroll} donate={args.donate} "
              f"py={args.python_loop}: {dt:.1f}s (incl compile), "
              f"depth mean {float(d.mean()):.3f}")
    except Exception as e:
        print(f"FAULT {args.width}x{args.height} sweeps={args.sweeps} "
              f"unroll={args.unroll} donate={args.donate} "
              f"py={args.python_loop}: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
