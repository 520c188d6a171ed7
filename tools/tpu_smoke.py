"""TPU kernel-variant smoke suite: compile AND value-check every Pallas
kernel configuration on the real chip at tiny shapes.

Why this exists: interpret-mode oracle tests cannot catch Mosaic compile
failures or miscompiles — round 2 proved it (the `ph_mem + cw`
alignment-proof failure shipped green through the whole oracle suite and
only surfaced on the real chip, docs/PERF.md NB). This is the defense for
that failure class: one command, one pass/fail line per variant, non-zero
exit on any failure.

Variants covered:
  * warped-ZNCC kernel (ops/pallas_ncc.py): u8/bf16 source packing x
    parity row-packed/full grid x two-phase/single-phase row layout x
    all-views-resident/one-view-resident VMEM layout (16 configs), each
    value-checked against the jnp oracle;
  * geometric-consistency kernel (ops/pallas_geom.py), packed + full;
  * coherent 2D sampler (ops/pallas_sample.py) vs the jnp oracle
    (bitwise);
  * fused-vs-staged solver equality at the size-gate boundary class
    (validates the FUSED_MAX_PIXELS dispatch, engine/patchmatch.py).

Usage: python tools/tpu_smoke.py [--skip-fused] [--width 256] [--height 32]
"""

import argparse
import dataclasses
import itertools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAILED = []


def check(name, fn):
    try:
        fn()
        print(f"PASS  {name}", flush=True)
    except Exception as e:  # noqa: BLE001 — report every variant
        FAILED.append(name)
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"FAIL  {name}: {msg}", flush=True)
        if os.environ.get("ACMMP_SMOKE_TRACE"):
            traceback.print_exc()


def close(a, b, atol=2e-3, frac=1e-3, bitwise=False):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    if bitwise:
        np.testing.assert_array_equal(a, b)
        return
    bad = np.abs(a - b) > atol + 1e-3 * np.abs(b)
    assert bad.mean() < frac, (
        f"{bad.mean():.5f} of values differ; max |d|={np.abs(a - b).max()}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--skip-fused", action="store_true",
                    help="skip the (slower-to-compile) fused-vs-staged check")
    args = ap.parse_args()

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.ops import parity
    from acmmp_tpu.ops import sampling as samp_ops
    from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas
    from acmmp_tpu.utils.synth import textured_plane_scene

    assert jax.devices()[0].platform == "tpu", (
        "smoke suite must run on the real TPU (that is its whole point); "
        f"got {jax.devices()}")

    params = PatchMatchParams()
    oracle_params = dataclasses.replace(params, ncc_backend="jnp")
    images, cams, plane_z = textured_plane_scene(
        n_views=args.views, width=args.width, height=args.height)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)

    # a coherent field (the true plane + jitter) and a random field stacked,
    # exercising both tight and wide scan windows in one call
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    p_true = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z), n_cam)
    p_rand = samp_ops.random_plane(jax.random.key(3), inputs.ref_cam, x, y,
                                   inputs.depth_min, inputs.depth_max)
    planes = jnp.stack([p_true, p_rand])

    pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
    off0 = parity.row_pack_offset(pm)
    planes_pk = parity.pack_rows_c(planes, off0)

    # ---- NCC kernel: the full variant matrix ----
    for u8, packed, two_ph, res in itertools.product(
            [True, False], [True, False], [True, False], [True, False]):
        name = (f"ncc[{'u8' if u8 else 'bf16'},"
                f"{'packed' if packed else 'full'},"
                f"{'2ph' if two_ph else '1ph'},"
                f"{'res' if res else '1view'}]")

        def run(u8=u8, packed=packed, two_ph=two_ph, res=res):
            src_o = inputs.src_imgs
            if not u8:
                src_o = src_o.astype(jnp.bfloat16).astype(jnp.float32)
            kw = dict(force_bf16=not u8, force_two_phase=two_ph,
                      force_all_resident=res)
            if packed:
                got = multiview_zncc_pallas(
                    inputs.ref_img, inputs.src_imgs, vg, planes_pk, params,
                    row_pack_off=off0, **kw)
                want = ncc_ops.multiview_zncc_packed(
                    inputs.ref_img, src_o, vg, planes_pk, oracle_params,
                    off0)
            else:
                got = multiview_zncc_pallas(
                    inputs.ref_img, inputs.src_imgs, vg, planes, params,
                    **kw)
                want = ncc_ops.multiview_zncc(
                    inputs.ref_img, src_o, vg, planes, oracle_params)
            close(got, want)

        check(name, run)

    # ---- K-batched (k_shared) tile visits: key layout corners ----
    for u8, packed, res in [(True, True, True), (True, False, True),
                            (False, True, True), (True, True, False)]:
        name = (f"ncc_kshared[{'u8' if u8 else 'bf16'},"
                f"{'packed' if packed else 'full'},"
                f"{'res' if res else '1view'}]")

        def run_ks(u8=u8, packed=packed, res=res):
            src_o = inputs.src_imgs
            if not u8:
                src_o = src_o.astype(jnp.bfloat16).astype(jnp.float32)
            kw = dict(force_bf16=not u8, force_all_resident=res,
                      k_shared=True)
            if packed:
                got = multiview_zncc_pallas(
                    inputs.ref_img, inputs.src_imgs, vg, planes_pk, params,
                    row_pack_off=off0, **kw)
                want = ncc_ops.multiview_zncc_packed(
                    inputs.ref_img, src_o, vg, planes_pk, oracle_params,
                    off0)
            else:
                got = multiview_zncc_pallas(
                    inputs.ref_img, inputs.src_imgs, vg, planes, params,
                    **kw)
                want = ncc_ops.multiview_zncc(
                    inputs.ref_img, src_o, vg, planes, oracle_params)
            close(got, want)

        check(name, run_ks)

    # K=3 unroll (the refinement 'incumbent-depth' stack size,
    # engine/patchmatch.py ncc_kbatch_refine) — a different static K than
    # the K=2 checks above and the K=8 propagation stack
    def run_ks3():
        p_mid = geo.plane_from_depth_normal(
            inputs.ref_cam, x, y, jnp.full(x.shape, plane_z * 1.1), n_cam)
        p3 = parity.pack_rows_c(jnp.stack([p_true, p_mid, p_rand]), off0)
        got = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, p3, params,
            row_pack_off=off0, k_shared=True)
        want = ncc_ops.multiview_zncc_packed(
            inputs.ref_img, inputs.src_imgs, vg, p3, oracle_params, off0)
        close(got, want)

    check("ncc_kshared[K=3,u8,packed,res]", run_ks3)

    # ---- geometric-consistency kernel, full + packed ----
    from acmmp_tpu.ops.geom import geom_consistency_cost

    Hs, Ws = inputs.src_imgs.shape[-2:]
    sd = jnp.broadcast_to(
        jnp.pad(jnp.full((H, W), plane_z),
                ((0, Hs - H), (0, Ws - W))), (args.views - 1, Hs, Ws))

    def run_geom(packed):
        if packed:
            xp, yp = parity.pack_rows(x, off0), parity.pack_rows(y, off0)
            got = geom_consistency_cost(
                inputs.ref_cam, inputs.src_cams, sd, planes_pk, xp, yp,
                params, row_pack_off=off0)
            want = geom_consistency_cost(
                inputs.ref_cam, inputs.src_cams, sd, planes_pk, xp, yp,
                oracle_params, row_pack_off=off0)
        else:
            got = geom_consistency_cost(
                inputs.ref_cam, inputs.src_cams, sd, planes, x, y, params)
            want = geom_consistency_cost(
                inputs.ref_cam, inputs.src_cams, sd, planes, x, y,
                oracle_params)
        close(got, want)

    check("geom[full]", lambda: run_geom(False))
    check("geom[packed]", lambda: run_geom(True))

    # ---- coherent 2D sampler (bitwise vs oracle) ----
    from acmmp_tpu.ops.pallas_sample import gather2d_pallas
    from acmmp_tpu.ops.sample import gather2d

    def run_sampler():
        k = jax.random.key(9)
        V, C = 2, 4
        maps = jax.random.normal(k, (V, C, 40, 200), jnp.float32)
        rr = jax.random.randint(jax.random.fold_in(k, 1), (V, 24, 130),
                                0, 40)
        cc = jax.random.randint(jax.random.fold_in(k, 2), (V, 24, 130),
                                0, 200)
        valid = jax.random.bernoulli(jax.random.fold_in(k, 3),
                                     0.8, (V, 24, 130))
        close(gather2d_pallas(maps, rr, cc, valid),
              gather2d(maps, rr, cc, valid), bitwise=True)

    check("sampler[f32]", run_sampler)

    # ---- fused-vs-staged dispatch equality ----
    if not args.skip_fused:
        from acmmp_tpu.engine.patchmatch import (
            Mode, run_patchmatch, run_patchmatch_staged)

        def run_fused_eq():
            mode = Mode()
            key = jax.random.key(5)
            fused = jax.jit(run_patchmatch, static_argnames=(
                "params", "mode"))(inputs, key, params=params, mode=mode)
            staged = run_patchmatch_staged(inputs, key, params=params,
                                           mode=mode)
            # identical up to XLA fusion-level float reassociation
            close(fused.depth, staged.depth, atol=1e-3)
            close(fused.cost, staged.cost, atol=1e-3)

        check("solver[fused==staged]", run_fused_eq)

    print(f"\n{len(FAILED)} failed" if FAILED else "\nall variants passed",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
