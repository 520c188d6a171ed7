"""Quality + speed A/B for `rand_depth_tile_window` on the real TPU.

Runs the staged photometric solve from random init on the synthetic
textured-plane scene across several seeds, for window fraction 0 (exact
reference semantics) vs candidate fractions, and reports per-variant
depth accuracy and solve time. The deviation only changes WHERE random
exploration lands each sweep (per-tile subranges, fresh every sweep) —
this tool is the evidence gate before enabling it anywhere
(config.rand_depth_tile_window).

Quality caveat the A/B must cover: the windowed marginal is trapezoidal
(edge ramps of width f*range — docs/PERF.md, DEVIATIONS.md #18), so true
depths near the range ends are the adversarial case; run with
--plane_z near depth_max (range is [2, 10] for the synthetic scene) as
well as the mid-range default.

Usage: python tools/rand_window_ab.py [--height 240 --width 320 --views 4]
       [--windows 0,0.25,0.125] [--seeds 4] [--plane_z 5.0] [--cpu]
       [--scene plane|relief] [--json out.json]

`--scene relief` swaps in the non-planar height-field fixture
(utils/synth.textured_relief_scene) and scores against its analytic
ground-truth depth — propagation/refinement work much harder there, so
it is the stronger quality gate for the exploration-law deviations.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--windows", default="0,0.25,0.125")
    ap.add_argument("--plane_z", type=float, default=5.0,
                    help="true plane depth; near 10 (range max) probes the "
                         "trapezoidal-marginal edge suppression")
    ap.add_argument("--min_cos", default="",
                    help="comma list of rand_normal_min_cos values to "
                         "cross with each window (e.g. 0,0.25); empty = "
                         "reference law only")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (quality-only; timings meaningless)")
    ap.add_argument("--geom", action="store_true",
                    help="also run one geometric pass per seed")
    ap.add_argument("--scene", default="plane", choices=["plane", "relief"])
    ap.add_argument("--spread", type=float, default=1.2,
                    help="relief rig camera spread; >= 1 with --converge "
                         "is the DTU-like triangulation-conditioned rig "
                         "utils/synth.py recommends for quality evaluation "
                         "(the old 0.22-parallel default turns ~1 px of "
                         "disparity error into ~23 scaled-mm of depth "
                         "error, masking quality deltas)")
    ap.add_argument("--parallel_rig", action="store_true",
                    help="use the legacy weak rig (spread=0.22, "
                         "non-convergent) — the cold-init adversarial row "
                         "of the original QUALITY.md table")
    ap.add_argument("--json", default="",
                    help="append one JSON line per variant to this file")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import json

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch_staged
    from acmmp_tpu.utils.synth import (
        textured_plane_scene, textured_relief_scene,
    )

    if args.scene == "plane":
        images, cams, plane_z = textured_plane_scene(
            n_views=args.views + 1, width=args.width, height=args.height,
            f=600.0 * args.width / 320.0, plane_z=args.plane_z)
        gt = np.full((args.height, args.width), plane_z, np.float32)
    else:
        spread = 0.22 if args.parallel_rig else args.spread
        images, cams, gt = textured_relief_scene(
            n_views=args.views + 1, width=args.width, height=args.height,
            f=140.0 * args.width / 96.0, spread=spread,
            converge=not args.parallel_rig)

    H, W = args.height, args.width
    interior = np.s_[8:H - 8, 8:W - 8]

    coss = [float(t) for t in args.min_cos.split(",") if t] or [0.0]
    for wtxt in args.windows.split(","):
        for mc in coss:
            w = float(wtxt)
            params = PatchMatchParams(rand_depth_tile_window=w,
                                      rand_normal_min_cos=mc)
            inputs = build_solver_inputs(images[0], images[1:], cams[0],
                                         cams[1:], params)
            errs, inliers, times = [], [], []
            for s in range(args.seeds):
                key = jax.random.key(100 + s)
                t0 = time.perf_counter()
                out = run_patchmatch_staged(inputs, key, params=params,
                                            mode=Mode())
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
                d = np.asarray(out.depth)[:H, :W][interior]
                e = np.abs(d - gt[interior])
                errs.append(float(np.median(e)))
                inliers.append(float((e < 0.1).mean()))
            rec = {
                "scene": args.scene,
                "rig": (None if args.scene == "plane" else
                        "parallel0.22" if args.parallel_rig else
                        f"converge{args.spread}"),
                "h": H, "w": W, "views": args.views,
                "plane_z": args.plane_z if args.scene == "plane" else None,
                "window": w, "min_cos": mc,
                "median_err": round(float(np.mean(errs)), 5),
                "median_err_std": round(float(np.std(errs)), 5),
                "inliers_0.1": round(float(np.mean(inliers)), 4),
                "inliers_std": round(float(np.std(inliers)), 4),
                "ms_per_solve": round(
                    float(np.mean(times[1:] or times)) * 1e3, 1),
            }
            print(f"window={w:6.3f} min_cos={mc:5.2f}: median_err "
                  f"{rec['median_err']:.4f} +- {rec['median_err_std']:.4f}   "
                  f"inliers@0.1 {rec['inliers_0.1']:.3f} +- "
                  f"{rec['inliers_std']:.3f}  "
                  f" {rec['ms_per_solve']:8.1f} ms/solve",
                  flush=True)
            if args.json:
                with open(args.json, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
