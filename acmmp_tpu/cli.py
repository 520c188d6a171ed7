"""Command-line interface.

Subcommands mirror the reference's executables and scripts:
  reconstruct    ./ACMMP <dense_folder> ...        (main_ACMMP.cpp:9-198)
  fuse           ./fuse_data <dense_folder> ...    (main_fusion.cpp:7-95)
  convert-colmap colmap2mvsnet_acm.py
  eval-dtu       matlab_analysis/dtu eval          (eval/dtu.py)
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

from acmmp_tpu.config import FusionParams, PatchMatchParams, PipelineConfig


def _add_common_fusion_flags(p: argparse.ArgumentParser):
    p.add_argument("dense_folder", help="input dense folder")
    p.add_argument("--fuse_thresh", "-f", type=float, default=0.3,
                   help="average inverse score threshold for fusion")
    p.add_argument("--multi_fusion", nargs="?", const="ACMMP", default=None,
                   help="use a previous reconstruction during fusion")
    p.add_argument("--force_fusion", action="store_true",
                   help="force multi fusion, without prior")
    p.add_argument("--output_dir", default="ACMMP")
    p.add_argument("--num_consistent_thresh", type=int, default=1)
    p.add_argument("--single_match_penalty", type=int, default=0)
    p.add_argument("--mask_dir", default=None,
                   help="directory of boolean masks (0, 255)")
    p.add_argument("--image_override", default="images",
                   help="alternative image directory for fusion colors")


def _cfg_from_args(args, prior: bool) -> PipelineConfig:
    return PipelineConfig(
        output_dir=args.output_dir,
        fusion_dir=args.multi_fusion or "ACMMP",
        mask_dir=args.mask_dir,
        image_dir=args.image_override,
        use_prior=prior,
        multi_fusion=args.multi_fusion is not None,
        force_fusion=args.force_fusion,
        seed=getattr(args, "seed", 0),
        patchmatch=PatchMatchParams(
            max_image_size=getattr(args, "max_image_size", 3200),
        ),
        fusion=FusionParams(
            consistency_scalar=args.fuse_thresh,
            num_consistent_thresh=args.num_consistent_thresh,
            single_match_penalty=args.single_match_penalty,
        ),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="acmmp-tpu",
                                     description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("reconstruct", help="full multi-scale reconstruction")
    _add_common_fusion_flags(pr)
    pr.add_argument("--prior", "-p", action="store_true",
                    help="seed initialization from priors/")
    pr.add_argument("--seed", type=int, default=0, help="RNG seed")
    pr.add_argument("--max_image_size", type=int, default=3200)
    pr.add_argument("--no_planar_prior", action="store_true")

    pf = sub.add_parser("fuse", help="fusion only, from existing .dmb outputs")
    _add_common_fusion_flags(pf)
    pf.add_argument("--geom", action="store_true",
                    help="fuse depths_geom.dmb instead of depths.dmb "
                         "(the reference fusion binary always uses depths.dmb)")

    pc = sub.add_parser("convert-colmap",
                        help="COLMAP sparse model -> dense folder")
    pc.add_argument("--dense_folder", required=True)
    pc.add_argument("--save_folder", required=True)
    pc.add_argument("--max_d", type=int, default=192)
    pc.add_argument("--interval_scale", type=float, default=1.0)
    pc.add_argument("--model_ext", default=".txt", choices=[".txt", ".bin"])

    pe = sub.add_parser("eval-dtu", help="DTU accuracy/completeness of a PLY")
    pe.add_argument("ply")
    pe.add_argument("--gt", required=True, help="ground-truth PLY/STL points")
    pe.add_argument("--dst", type=float, default=0.2,
                    help="down-sample density (official protocol: 0.2)")
    pe.add_argument("--max_dist", type=float, default=60.0)
    pe.add_argument("--json", action="store_true")

    args = parser.parse_args(argv)

    if args.cmd == "reconstruct":
        from acmmp_tpu.pipeline.scheduler import run_pipeline

        cfg = _cfg_from_args(args, prior=args.prior)
        if args.no_planar_prior:
            cfg = dataclasses.replace(cfg, planar_prior=False)
        ply = run_pipeline(args.dense_folder, cfg)
        print(ply)
    elif args.cmd == "fuse":
        from acmmp_tpu.engine.fusion import run_fusion, run_prior_aware_fusion
        from acmmp_tpu.pipeline.scheduler import generate_sample_list

        cfg = _cfg_from_args(args, prior=False)
        problems = generate_sample_list(args.dense_folder)
        out_folder = os.path.join(args.dense_folder, cfg.output_dir)
        if cfg.multi_fusion or cfg.force_fusion:
            ply = run_prior_aware_fusion(
                args.dense_folder, out_folder,
                os.path.join(args.dense_folder, cfg.fusion_dir), problems,
                geom_consistency=args.geom, fp=cfg.fusion,
                single_match_penalty=cfg.fusion.single_match_penalty,
                mask_dir=cfg.mask_dir,
            )
        else:
            ply = run_fusion(
                args.dense_folder, out_folder, problems,
                geom_consistency=args.geom, fp=cfg.fusion,
                image_dir=cfg.image_dir, mask_dir=cfg.mask_dir,
            )
        print(ply)
    elif args.cmd == "convert-colmap":
        from acmmp_tpu.io.colmap import convert_colmap

        convert_colmap(args.dense_folder, args.save_folder, args.max_d,
                       args.interval_scale, args.model_ext)
    elif args.cmd == "eval-dtu":
        import json

        import numpy as np

        from acmmp_tpu.eval.dtu import evaluate_ply
        from acmmp_tpu.io import read_ply

        gt_pts, _, _ = read_ply(args.gt)
        metrics = evaluate_ply(args.ply, gt_pts, dst=args.dst,
                               max_dist=args.max_dist)
        if args.json:
            print(json.dumps(metrics))
        else:
            for k, v in metrics.items():
                print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
