"""Full-scale quality artifact: one real `run_pipeline` on the TPU over a
synthetic scene with EXACT analytic ground truth, scored by the DTU
protocol (eval/dtu.py — the stand-in for BASELINE.md's DTU parity bar;
protocol shape: /root/reference/python_scripts/matlab_analysis.py:35-103).

Scene: the non-planar textured relief height-field
(utils/synth.textured_relief_scene) at >= 1280x960 with >= 5 source
views; the multi-scale planner gives 2 scales at this size (coarse
pass + JBU upsample + fine pass), and fusion produces the cloud that is
scored. Ground truth is the analytic surface sampled densely over the
reconstruction's own bounding region.

Units: the synthetic scene lives at depth ~5 (dimensionless). DTU
thresholds are mm at ~600-900 mm depth, so clouds are scaled by
SCALE=150 before scoring (depth 5 -> 750 "mm", pixel footprint at
f=2400: 750/2400 ~ 0.31 mm/px — the DTU class) and the standard
acc/cmp@{0.5,2,5,10} mm cuts apply as-is.

Writes one JSON line to stdout and (with --out) a metrics file.
Usage: python tools/fullscale_quality.py [--width 1280 --height 960]
       [--views 6] [--geom_iters 2] [--out QUALITY_fullscale.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SCALE = 150.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=960)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--geom_iters", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--dense", default="", help="reuse/keep dense folder")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--window", type=float, default=None,
                    help="rand_depth_tile_window override (0 = exact "
                         "reference semantics; default = shipping value)")
    ap.add_argument("--min_cos", type=float, default=None,
                    help="rand_normal_min_cos override (0 = exact)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from PIL import Image as PILImage

    from acmmp_tpu.config import PipelineConfig
    from acmmp_tpu.io.dense_folder import write_cam_txt, write_pair_txt
    from acmmp_tpu.pipeline.scheduler import run_pipeline
    from acmmp_tpu.utils.synth import textured_relief_scene

    W, H, V = args.width, args.height, args.views
    f = 140.0 * W / 96.0
    t0 = time.monotonic()
    # wide convergent rig (spread 1.2 at depth 5 ~ 27deg end-to-end) so
    # the mm-scale metrics measure matching quality, not triangulation
    # conditioning — the 0.22-parallel default rig turns one pixel of
    # disparity error into ~23 scaled-mm of depth error
    images, cams, gt_depth0 = textured_relief_scene(
        n_views=V, width=W, height=H, f=f, spread=1.2, converge=True)
    print(f"scene rendered in {time.monotonic() - t0:.1f}s", flush=True)

    dense = args.dense or tempfile.mkdtemp(prefix="acmmp_fullscale_")
    if not os.path.exists(os.path.join(dense, "pair.txt")):
        os.makedirs(os.path.join(dense, "images"), exist_ok=True)
        os.makedirs(os.path.join(dense, "cams"), exist_ok=True)
        pairs = []
        for i in range(V):
            PILImage.fromarray(
                np.clip(images[i], 0, 255).astype(np.uint8)).save(
                os.path.join(dense, "images", f"{i:08d}.jpg"), quality=98)
            write_cam_txt(os.path.join(dense, "cams", f"{i:08d}_cam.txt"),
                          cams[i])
            pairs.append((i, [(j, 100.0) for j in range(V) if j != i]))
        write_pair_txt(os.path.join(dense, "pair.txt"), pairs)

    from acmmp_tpu.config import PatchMatchParams

    pm_kw = {}
    if args.window is not None:
        pm_kw["rand_depth_tile_window"] = args.window
    if args.min_cos is not None:
        pm_kw["rand_normal_min_cos"] = args.min_cos
    cfg = PipelineConfig(geom_iterations=args.geom_iters,
                         patchmatch=PatchMatchParams(**pm_kw))
    t0 = time.monotonic()
    ply = run_pipeline(dense, cfg)
    wall = time.monotonic() - t0

    # ground truth: the analytic surface sampled on a fine world grid over
    # every view's frustum footprint (utils.synth.relief_gt_points)
    from acmmp_tpu.utils.synth import relief_gt_points

    gt_pts = relief_gt_points(cams, W, H)

    from acmmp_tpu.eval.dtu import dtu_metrics
    from acmmp_tpu.io.ply import read_ply

    recon_pts, _, _ = read_ply(ply)
    metrics = dtu_metrics(np.asarray(recon_pts, np.float64) * SCALE,
                          gt_pts * SCALE, dst=0.2)
    result = {
        "tool": "fullscale_quality",
        "shape": f"{W}x{H}", "views": V, "geom_iters": args.geom_iters,
        "rand_depth_tile_window": cfg.patchmatch.rand_depth_tile_window,
        "rand_normal_min_cos": cfg.patchmatch.rand_normal_min_cos,
        "pipeline_wall_s": round(wall, 1),
        "ply": ply,
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
        "scale_to_mm": SCALE,
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
