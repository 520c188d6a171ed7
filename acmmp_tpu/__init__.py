"""acmmp_tpu — a TPU-native multi-view-stereo engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
ACMMP reference (multi-scale checkerboard PatchMatch with multi-hypothesis
joint view selection, bilateral-weighted ZNCC photometric cost,
geometric-consistency refinement, planar-prior triangulation, joint
bilateral upsampling between scales, seeded prior initialization and
consistency-based depth/normal fusion into point clouds), plus COLMAP
ingestion and DTU evaluation.

Layout:
  core/      camera geometry (single implementation, pure jnp)
  io/        dense-folder contract: pair.txt, cam.txt, .dmb, .ply, prior PNGs, COLMAP
  ops/       vectorized/Pallas compute ops: ZNCC, propagation, refinement, median, JBU
  engine/    the jitted per-view PatchMatch solver, planar priors, fusion
  pipeline/  multi-scale scheduler and stage graph (filesystem checkpoint contract)
  parallel/  device mesh, view sharding, row-tile sharding with halo exchange
  eval/      DTU accuracy/completeness metrics and statistics
"""

__version__ = "0.1.0"
