"""Stage-level profile of the PatchMatch solve on the real TPU.

Times (a) the fused single-program solve with an in-program repetition
scan, (b) the staged host-driven solve, (c) each staged stage separately
(init / each half-sweep / finalize), at the bench shape. Separates true
device throughput from host/tunnel dispatch overhead.
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
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.engine import patchmatch as pm
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.utils.synth import textured_plane_scene

    params = PatchMatchParams()
    mode = pm.Mode()
    images, cams, _ = textured_plane_scene(
        n_views=args.views + 1, width=args.width, height=args.height,
        f=600.0, plane_z=5.0)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)

    # (a) fused, in-program scan over distinct keys — only below the
    # verified-correct bound (above it the program is never shipped, is
    # known to miscompile, and takes pathologically long to compile)
    if args.height * args.width <= pm.FUSED_MAX_PIXELS:
        @jax.jit
        def fused_many(keys):
            def body(c, k):
                out = pm.run_patchmatch(inputs, k, params=params, mode=mode)
                return c + jnp.mean(out.depth), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return tot

        keys = jax.random.split(jax.random.key(7), args.reps)
        float(fused_many(keys))
        t0 = time.perf_counter()
        float(fused_many(keys))
        dt_fused = (time.perf_counter() - t0) / args.reps
        print(f"fused in-program : {dt_fused * 1e3:8.2f} ms/map "
              f"({1.0 / dt_fused:.2f} maps/s)")
    else:
        print("fused in-program : skipped (above FUSED_MAX_PIXELS)")

    # (b) staged host-driven
    k = jax.random.key(3)
    jax.block_until_ready(
        pm.run_patchmatch_staged(inputs, k, params=params, mode=mode))
    t0 = time.perf_counter()
    for i in range(args.reps):
        jax.block_until_ready(pm.run_patchmatch_staged(
            inputs, jax.random.fold_in(k, i), params=params, mode=mode))
    dt_staged = (time.perf_counter() - t0) / args.reps
    print(f"staged host-loop : {dt_staged * 1e3:8.2f} ms/map "
          f"({1.0 / dt_staged:.2f} maps/s)")

    # (c) per-stage timings (staged jits)
    f_init = jax.jit(pm.init_state, static_argnames=("params", "mode"))
    f_sweep = jax.jit(pm.sweep_once,
                      static_argnames=("sweep_idx", "params", "mode"))
    f_fin = jax.jit(pm.finalize, static_argnames=("params",))
    k_init, k_sweeps = jax.random.split(k)
    state = jax.block_until_ready(
        f_init(inputs, k_init, params=params, mode=mode))

    def timeit(name, fn, n=args.reps):
        jax.block_until_ready(fn(0))
        t0 = time.perf_counter()
        for i in range(n):
            r = fn(i)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:17s}: {dt * 1e3:8.2f} ms")
        return dt

    timeit("init", lambda i: f_init(inputs, jax.random.fold_in(k_init, i),
                                    params=params, mode=mode))
    st = state
    for s in range(2 * params.max_iterations):
        ks = jax.random.fold_in(k_sweeps, s)
        stl = st
        timeit(f"sweep[{s}]",
               lambda i, _st=stl, _s=s, _ks=ks: f_sweep(
                   _st, inputs, sweep_idx=_s, key=jax.random.fold_in(_ks, 0),
                   params=params, mode=mode))
        st = f_sweep(st, inputs, sweep_idx=s, key=ks, params=params, mode=mode)
    timeit("finalize", lambda i: f_fin(st, inputs, params=params))


if __name__ == "__main__":
    main()
