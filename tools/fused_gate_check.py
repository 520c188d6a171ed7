"""Validate the size-gated fused dispatch on the real TPU: the fused
single-program solve must match the staged solve at sizes up to the
FUSED_MAX_PIXELS bound (engine/patchmatch.py). The XLA:TPU fused-program
fault is a SILENT miscompile (deterministic garbage, no error —
tools/fused_fault_repro.py), so any change to the sweep program must
re-run this before trusting the gate.

Usage: python tools/fused_gate_check.py [--sizes 640x480,1280x960]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="640x480,1280x960")
    ap.add_argument("--views", type=int, default=4)
    args = ap.parse_args()

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.engine.patchmatch import (
        Mode, run_patchmatch, run_patchmatch_staged)
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.utils.synth import textured_plane_scene

    params = PatchMatchParams()
    mode = Mode()
    bad = 0
    for size in args.sizes.split(","):
        w, h = (int(v) for v in size.split("x"))
        images, cams, _ = textured_plane_scene(
            n_views=args.views + 1, width=w, height=h, f=600.0 * w / 320.0,
            plane_z=5.0)
        inputs = build_solver_inputs(images[0], images[1:], cams[0],
                                     cams[1:], params)
        key = jax.random.key(11)
        t0 = time.perf_counter()
        fused = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
            inputs, key, params=params, mode=mode)
        fd = np.asarray(fused.depth)
        t1 = time.perf_counter()
        staged = run_patchmatch_staged(inputs, key, params=params, mode=mode)
        sd = np.asarray(staged.depth)
        t2 = time.perf_counter()
        # identical programs up to XLA fusion-level reassociation; garbage
        # output diverges everywhere
        rel = np.abs(fd - sd) / np.maximum(np.abs(sd), 1e-3)
        frac = float((rel > 1e-2).mean())
        ok = frac < 0.02 and np.isfinite(fd).all()
        bad += not ok
        print(f"{'OK  ' if ok else 'FAIL'} {w}x{h}: "
              f"{frac * 100:.3f}% pixels differ >1% "
              f"(fused {t1 - t0:.0f}s, staged {t2 - t1:.0f}s incl compile)",
              flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
