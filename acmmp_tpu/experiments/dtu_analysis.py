"""DTU experiment driver: the method-variant matrix of the reference harness.

Re-implements evaluate_dtu_structure.py:34-104 / run_dtu_analysis.py:48-90
without subprocesses or the private prior-sampler dependency — the pipeline
is a library call, priors are bootstrapped by experiments/prior_sampler.

Per (scan, camera subset):
  1. plain reconstruction                       -> ACMMP_no_prior.ply
  2. dual-hypothesis refusion vs. itself        -> ACMMP_x2.ply
     (--output_dir ACMMP2 --multi_fusion ACMMP --force_fusion,
      evaluate_dtu_structure.py:49-57)
  3. priors rendered from (1)'s point cloud, seeded re-run with
     prior-aware fusion                         -> acmmp_boost_1.ply
     (run_dtu_analysis.py:60-90)

All outputs are idempotent: existing PLYs are not recomputed (the
reference's de-facto resume protocol, evaluate_dtu_structure.py:42-60)."""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np

from acmmp_tpu.config import FusionParams, PatchMatchParams, PipelineConfig
from acmmp_tpu.eval.dtu import dtu_metrics
from acmmp_tpu.eval.stats import MetricTable
from acmmp_tpu.experiments.prior_sampler import write_priors_from_points
from acmmp_tpu.experiments.select_cams import ReconParams, setup_from_source
from acmmp_tpu.io import read_ply
from acmmp_tpu.io.dense_folder import read_cam_txt
from acmmp_tpu.pipeline.scheduler import run_pipeline
from acmmp_tpu.utils.log import get_logger

log = get_logger("dtu_analysis")

# the reference's camera subsets per count (run_dtu_analysis.py:27-38)
DTU_CAM_SETS: Dict[int, List[int]] = {
    2: [38, 48],
    3: [38, 8, 48],
    4: [38, 8, 48, 43],
    5: [13, 17, 38, 43, 48],
    6: [8, 22, 26, 38, 43, 48],
    7: [0, 4, 25, 21, 38, 43, 48],
    8: [0, 4, 8, 21, 26, 38, 43, 48],
    9: [0, 4, 19, 23, 27, 38, 42, 45, 48],
    10: [0, 4, 19, 22, 25, 27, 38, 42, 45, 48],
}


def _cfg(base: PipelineConfig, **kw) -> PipelineConfig:
    return dataclasses.replace(base, **kw)


def analyze_scene(
    dense_folder: str,
    base_cfg: Optional[PipelineConfig] = None,
    boost: bool = True,
) -> Dict[str, str]:
    """Run the method variants on one dense folder; returns variant -> PLY
    path. Idempotent per variant."""
    cfg = base_cfg or PipelineConfig()
    out: Dict[str, str] = {}

    no_prior = os.path.join(dense_folder, "ACMMP_no_prior.ply")
    if not os.path.exists(no_prior):
        ply = run_pipeline(dense_folder, cfg)
        shutil.copy(ply, no_prior)
    out["no_prior"] = no_prior

    x2 = os.path.join(dense_folder, "ACMMP_x2.ply")
    if not os.path.exists(x2):
        ply = run_pipeline(dense_folder, _cfg(
            cfg, output_dir="ACMMP2", fusion_dir="ACMMP",
            multi_fusion=True, force_fusion=True))
        shutil.copy(ply, x2)
    out["x2"] = x2

    if boost:
        boost1 = os.path.join(dense_folder, "acmmp_boost_1.ply")
        if not os.path.exists(boost1):
            pts, _, _ = read_ply(no_prior)
            import glob

            cam_files = sorted(
                glob.glob(os.path.join(dense_folder, "cams", "*_cam.txt")))
            cams = []
            from PIL import Image as PILImage

            for i, cf in enumerate(cam_files):
                cam = read_cam_txt(cf)
                img = os.path.join(dense_folder, "images", f"{i:08d}.jpg")
                with PILImage.open(img) as im:
                    cam.width, cam.height = im.size
                cams.append(cam)
            write_priors_from_points(dense_folder, pts, cams)
            ply = run_pipeline(dense_folder, _cfg(
                cfg, output_dir="ACMMP_BOOST", fusion_dir="ACMMP",
                use_prior=True, multi_fusion=True))
            shutil.copy(ply, boost1)
        out["boost_1"] = boost1
    return out


def analyze_dtu_scans(
    scans_root: str,
    out_root: str,
    cam_counts: Sequence[int] = (2, 3, 5, 9),
    params: Optional[ReconParams] = None,
    base_cfg: Optional[PipelineConfig] = None,
    gt_points: Optional[Dict[str, np.ndarray]] = None,
) -> MetricTable:
    """The full experiment grid: scans x camera subsets x method variants
    (run_dtu_analysis.py main loop). `gt_points` maps scan name -> GT point
    array; when given, every PLY is scored and collected into a MetricTable
    for eval.stats.paired_tests."""
    params = params or ReconParams(mindist=300, maxdist=800, maxangle=120)
    table = MetricTable()
    scans = sorted(d for d in os.listdir(scans_root)
                   if os.path.isdir(os.path.join(scans_root, d)))
    for scan in scans:
        src = os.path.join(scans_root, scan)
        for n_cam in cam_counts:
            cams = DTU_CAM_SETS[n_cam]
            dense = os.path.join(out_root, f"{scan}_{n_cam}_cam")
            if not os.path.exists(os.path.join(dense, "pair.txt")):
                setup_from_source(cams, src, dense, params)
            try:
                plys = analyze_scene(dense, base_cfg)
            except Exception:
                log.exception("scan %s n_cam %d failed; continuing", scan,
                              n_cam)
                continue
            if gt_points and scan in gt_points:
                for method, ply in plys.items():
                    pts, _, _ = read_ply(ply)
                    table.add(method, scan, n_cam,
                              dtu_metrics(pts, gt_points[scan]))
    return table
