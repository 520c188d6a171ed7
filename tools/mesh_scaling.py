"""Scaling-efficiency record on the virtual CPU mesh (VERDICT r4 item 8).

Runs the SAME fixed mixed-size scene (the dryrun geometry at its n=8
size) through the production `run_pipeline` at several mesh sizes and
reports pipeline depth-maps/s from a SECOND, compile-warm run per mesh
(the first run pays XLA:CPU compiles; the timed run re-executes the same
programs on fresh output dirs).

CAVEAT (print + commit with the numbers): this is a 1-core host running
N virtual CPU devices — per-device compute is serialized, so the
measurable quantity is the SHARDING OVERHEAD (collectives, halo
exchange, batching machinery), not real-chip speedup. Efficiency is
reported as t(mesh=1) / t(mesh=n): 1.0 means sharding added nothing on a
serialized host; the ICI-parallel speedup on real chips is bounded below
by n * efficiency. BASELINE.md's >= 80% multi-chip target reads against
this overhead bound until a multi-chip TPU is available.

Usage: python tools/mesh_scaling.py [--meshes 1,8] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def build_scene(root):
    """The dryrun scene at its n=8 geometry: 4 small 96x32 views + 1 tall
    192x64 view (the tall view tiles over the mesh at its fine scale)."""
    from PIL import Image as PILImage

    from acmmp_tpu.io.dense_folder import write_cam_txt, write_pair_txt
    from acmmp_tpu.utils.synth import textured_plane_scene

    h_tall, h_small, w_small = 192, 96, 32
    n_views = 5
    imgs, cams, _ = textured_plane_scene(n_views=n_views, width=64,
                                         height=h_tall)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "cams"))
    pairs = []
    for i in range(n_views):
        img = imgs[i] if i == n_views - 1 else imgs[i][:h_small, :w_small]
        PILImage.fromarray(
            np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(root, "images", f"{i:08d}.jpg"), quality=98)
        write_cam_txt(os.path.join(root, "cams", f"{i:08d}_cam.txt"),
                      cams[i])
        pairs.append((i, [(j, 100.0) for j in range(n_views) if j != i]))
    write_pair_txt(os.path.join(root, "pair.txt"), pairs)
    return h_tall, h_small, w_small


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="1,8")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import tempfile

    from acmmp_tpu.config import PatchMatchParams, PipelineConfig
    from acmmp_tpu.parallel import make_view_mesh
    from acmmp_tpu.pipeline.scheduler import run_pipeline

    dense = tempfile.mkdtemp(prefix="acmmp_scaling_")
    h_tall, h_small, w_small = build_scene(dense)
    params = PatchMatchParams(patch_size=5, max_iterations=1,
                              num_view_samples=5, far_strip_candidates=5,
                              near_v_levels=2, size_bound=h_small)
    n_problems, n_passes = 5, 4   # 2 scales x (photometric|hier + 1 geom)

    rows = []
    for n in [int(m) for m in args.meshes.split(",") if m]:
        mesh = make_view_mesh(n_devices=n) if n > 1 else None
        tile_px = h_small * w_small + 1
        cfg = PipelineConfig(patchmatch=params, pad_h=8, pad_w=64,
                             planar_prior=False, geom_iterations=1,
                             tile_pixels=tile_px,
                             output_dir=f"SCALE_warm_{n}")
        t0 = time.monotonic()
        run_pipeline(dense, cfg, mesh=mesh)       # compile warm-up
        warm = time.monotonic() - t0
        import dataclasses

        cfg2 = dataclasses.replace(cfg, output_dir=f"SCALE_timed_{n}")
        t0 = time.monotonic()
        run_pipeline(dense, cfg2, mesh=mesh)
        timed = time.monotonic() - t0
        solves = n_problems * n_passes
        rows.append({"mesh": n, "warm_s": round(warm, 1),
                     "timed_s": round(timed, 1),
                     "maps_per_s": round(solves / timed, 3)})
        print(f"mesh={n}: warm-up {warm:6.1f}s, timed {timed:6.1f}s, "
              f"{solves / timed:.3f} maps/s", flush=True)

    base = rows[0]["timed_s"]
    for r in rows:
        r["overhead_efficiency_vs_mesh1"] = round(base / r["timed_s"], 3)
    print(json.dumps({"tool": "mesh_scaling", "rows": rows,
                      "note": "1-core host: serialized devices; "
                              "efficiency = t(1)/t(n) bounds sharding "
                              "overhead, not real-chip speedup"}),
          flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
