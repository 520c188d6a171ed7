"""Headline benchmark: single-chip PatchMatch throughput (depth-maps/s).

Measures the full per-view solve — random init, 2 red/black checkerboard
iterations of multi-hypothesis propagation + refinement (each evaluating
14 plane hypotheses x V views x 36-tap bilateral ZNCC per pixel), depth
extraction and checkerboard median — on a photo-consistent synthetic scene
at 320x240 with 4 source views (DTU quarter-res class; shape will be raised
as the Pallas NCC kernel lands).

The reference publishes no throughput numbers (BASELINE.md); the baseline
constant below is an estimate of the reference CUDA implementation's
per-view PatchMatch rate at this shape on its tested GPU (GTX 1080 Ti,
src/README.md:17-20), derived from its kernel workload (~2,000 texture
reads/pixel/sweep, SURVEY.md §3.2). vs_baseline > 1 means faster than that
estimate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "maps/s", "vs_baseline": N}
"""

import json
import time

BASELINE_MAPS_PER_S = 10.0  # estimated reference rate at this shape (see above)

H, W, V1 = 240, 320, 5      # 1 ref + 4 src views (quarter-res DTU class)
WARMUP = 1
REPS = 1


def main():
    import os

    import jax

    # persistent compile cache: the solver stages are large programs and the
    # (remote) TPU compile dominates cold runs
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch_staged
    from acmmp_tpu.utils.synth import textured_plane_scene

    params = PatchMatchParams()
    mode = Mode()
    images, cams, _ = textured_plane_scene(
        n_views=V1, width=W, height=H, f=600.0, plane_z=5.0)
    inputs = build_solver_inputs(
        images[0], images[1:], cams[0], cams[1:], params)

    solve = run_patchmatch_staged
    keys = [jax.random.key(i) for i in range(WARMUP + REPS)]

    for k in keys[:WARMUP]:
        jax.block_until_ready(solve(inputs, k, params=params, mode=mode))

    t0 = time.perf_counter()
    for k in keys[WARMUP:]:
        jax.block_until_ready(solve(inputs, k, params=params, mode=mode))
    dt = time.perf_counter() - t0

    maps_per_s = REPS / dt
    print(json.dumps({
        "metric": f"patchmatch_{W}x{H}_v{V1 - 1}_depth_maps_per_s",
        "value": round(maps_per_s, 4),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_s / BASELINE_MAPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
