"""Child process of tests/test_multiprocess.py — runs under
`jax.distributed` with a sibling process (see that file's docstring for
the four stages). Not collected by pytest (leading underscore)."""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

RANK = int(os.environ["ACMMP_MP_RANK"])
PORT = os.environ["ACMMP_MP_PORT"]
TMP = os.environ["ACMMP_MP_TMP"]

jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=RANK)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from acmmp_tpu.config import (  # noqa: E402
    FusionParams, PatchMatchParams, PipelineConfig,
)
from acmmp_tpu.engine.inputs import build_solver_inputs  # noqa: E402
from acmmp_tpu.engine.patchmatch import Mode  # noqa: E402
from acmmp_tpu.parallel import multihost as mh  # noqa: E402
from acmmp_tpu.parallel.sharding import (  # noqa: E402
    VIEW_AXIS, gather_src_depths, make_view_mesh, pad_to_multiple,
    stack_solver_inputs, view_sharded_solve,
)
from acmmp_tpu.utils.synth import textured_plane_scene  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert mh.is_multiprocess()
assert mh.is_primary() == (RANK == 0)

mesh = make_view_mesh()
params = PatchMatchParams(patch_size=7, max_iterations=1)
N_VIEWS = 4
images, cams, plane_z = textured_plane_scene(n_views=N_VIEWS, width=64,
                                             height=48)

# ---- stage 1: view-sharded solve across the 2-process mesh ----
problems_in = []
for i in range(N_VIEWS):
    srcs = [j for j in range(N_VIEWS) if j != i]
    problems_in.append(build_solver_inputs(
        images[i], [images[j] for j in srcs], cams[i],
        [cams[j] for j in srcs], params))
batch = stack_solver_inputs(problems_in)
keys = jax.random.split(jax.random.key(0), N_VIEWS)
batch, keys, _ = pad_to_multiple(batch, keys, 8)
batch = jax.tree.map(lambda x: mh.host_to_global(mesh, P(VIEW_AXIS), x),
                     batch)
keys = mh.keys_to_global(mesh, P(VIEW_AXIS), keys)
out = view_sharded_solve(mesh, batch, keys, params, Mode())
depth = mh.global_to_host(out.depth)
assert depth.shape[0] == 8
assert np.isfinite(depth).all()
err = np.abs(depth[:N_VIEWS, 4:44, 4:60] - plane_z)
assert np.median(err) < 0.5, np.median(err)
print(f"rank {RANK}: stage 1 (view-sharded solve) ok, "
      f"median err {np.median(err):.3f}", flush=True)

# ---- stage 2: the geometric stage-barrier collective ----
rng = np.random.default_rng(7)
maps = rng.uniform(1.0, 9.0, (8, 16, 32)).astype(np.float32)
si = rng.integers(0, 8, (8, 3)).astype(np.int32)
gathered = gather_src_depths(
    mesh,
    mh.host_to_global(mesh, P(VIEW_AXIS), maps),
    mh.host_to_global(mesh, P(VIEW_AXIS), si))
got = mh.global_to_host(gathered)
np.testing.assert_array_equal(got, maps[si])
print(f"rank {RANK}: stage 2 (gather_src_depths) ok", flush=True)

# ---- stage 3: group-sharded fusion == local sequential fusion ----
from acmmp_tpu.engine.fusion import FusionView, fuse_views  # noqa: E402
from acmmp_tpu.io.dense_folder import Problem  # noqa: E402

fp = FusionParams(num_consistent_thresh=2)


def make_views():
    views = {}
    for i in range(N_VIEWS):
        d = np.full((48, 64), plane_z, np.float32)
        nr = np.zeros((48, 64, 3), np.float32)
        nr[..., 2] = -1.0
        img = np.stack([images[i]] * 3, axis=-1).astype(np.float32)
        views[i] = FusionView(img, cams[i], d, nr)
    return views


problems = [Problem(ref_image_id=i,
                    src_image_ids=[j for j in range(N_VIEWS) if j != i])
            for i in range(N_VIEWS)]
seq = fuse_views(make_views(), problems, fp)          # local, no mesh
shd = fuse_views(make_views(), problems, fp, mesh=mesh)
assert len(seq[0]) > 0
np.testing.assert_array_equal(np.asarray(seq[0]), np.asarray(shd[0]))
np.testing.assert_array_equal(np.asarray(seq[1]), np.asarray(shd[1]))
print(f"rank {RANK}: stage 3 (sharded fusion, {len(seq[0])} pts) ok",
      flush=True)

# ---- stage 4: the full production pipeline on the 2-process mesh ----
from PIL import Image as PILImage  # noqa: E402

from acmmp_tpu.io.dense_folder import (  # noqa: E402
    write_cam_txt, write_pair_txt,
)
from acmmp_tpu.io.ply import read_ply  # noqa: E402
from acmmp_tpu.pipeline.scheduler import run_pipeline  # noqa: E402

dense = os.path.join(TMP, "scene")
if mh.is_primary():
    os.makedirs(os.path.join(dense, "images"), exist_ok=True)
    os.makedirs(os.path.join(dense, "cams"), exist_ok=True)
    pairs = []
    for i in range(N_VIEWS):
        PILImage.fromarray(
            np.clip(images[i], 0, 255).astype(np.uint8)).save(
            os.path.join(dense, "images", f"{i:08d}.jpg"), quality=98)
        write_cam_txt(os.path.join(dense, "cams", f"{i:08d}_cam.txt"),
                      cams[i])
        pairs.append((i, [(j, 100.0) for j in range(N_VIEWS) if j != i]))
    write_pair_txt(os.path.join(dense, "pair.txt"), pairs)
mh.barrier("dense_folder_written")

cfg = PipelineConfig(
    # max_iterations=2 (the production default): ONE sweep pair leaves
    # normals ~25deg from truth on this tiny scene (measured identically
    # on round-3 code — always borderline, previously passing fusion's
    # 10deg agreement check only by seed luck), and the traced-sweep
    # staged path makes the extra iteration compile-free.
    patchmatch=PatchMatchParams(patch_size=7, max_iterations=2),
    fusion=FusionParams(num_consistent_thresh=2),
    pad_h=1, pad_w=1, geom_iterations=1, planar_prior=False,
)
ply = run_pipeline(dense, cfg, mesh=mesh)
assert os.path.exists(ply), ply
pts, _, _ = read_ply(ply)
assert len(pts) > 0, "fusion accepted no points"
zerr = np.median(np.abs(pts[:, 2] - plane_z))
assert zerr < 0.5, zerr
print(f"rank {RANK}: stage 4 (run_pipeline, {len(pts)} pts, "
      f"median z err {zerr:.3f}) ok", flush=True)

print(f"rank {RANK}: ALL STAGES OK", flush=True)
sys.exit(0)
