"""Propagation-kernel attack bench: REAL mid-solve fields at the DTU
operating point (VERDICT r4 item 1 — the K=8 K-shared propagation call is
~70% of the DTU half-sweep).

One TPU process (per the axon-tunnel cost model: batch everything):
  1. runs the production staged solver (shipping defaults) on the relief
     scene at --height x --width for --sweeps half-sweeps, capturing the
     solver state BEFORE selected sweeps;
  2. recomputes each captured state's 8 checkerboard-propagation
     candidate planes exactly as the sweep does
     (prop_ops.best_neighbor_planes -> parity-packed);
  3. WINDOW STATS (jnp, host-reduced): per (view, tap, tile) row/col
     bbox spans per hypothesis, plus the scan-visit counts
     n_rb * n_cp each grouping variant would execute — the model that
     predicts which sub-stacking wins before timing it;
  4. TIMES the real prop stack through multiview_zncc_pallas for each
     grouping variant (plus the per-k grid as the no-sharing floor).

Region order of the 8 candidates (ops/propagation.py:69-78, matching
cost_array rows of ACMMP.cu:806): 0 up_near, 1 up_far, 2 down_near,
3 down_far, 4 left_near, 5 left_far, 6 right_near, 7 right_far.
Groupings measured:
  one      — ((0..7),)               : the shipping single-union scan
  nearfar  — ((0,2,4,6),(1,3,5,7))  : near (<=3 px reach) vs far
                                      (3+2i px, up to 23 — ACMMP.cu:819-827)
  four     — ((0,2),(4,6),(1,3),(5,7)) : near-vert/near-horiz/far-vert/far-horiz
  perk     — 8 singleton groups      : per-k windows, shared chunk code

Usage: python tools/prop_attack.py [--height 1184 --width 1600 --views 8]
       [--sweeps 4] [--capture 1,3] [--reps 3] [--stats_taps 0,17,35]
       [--json out.json] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def _groupings():
    from acmmp_tpu.ops.ncc import PROP_GROUPINGS

    g = dict(PROP_GROUPINGS)
    g["one"] = g.pop("none")
    return g


GROUPINGS = _groupings()


def window_stats(inputs, vg, cand_pk, off0, params, tap_ids, R=4):
    """Predicted chunk-scan visit counts per grouping, from the per-tile
    per-tap warp bboxes (the same bounds the kernel derives in-kernel).
    Returns {grouping: visits_total} + span percentiles. All in jnp; one
    jitted call per (view, tap)."""
    from acmmp_tpu.ops import ncc as ncc_ops

    taps = ncc_ops.tap_weights_spatial(params)
    K = cand_pk.shape[0]
    Hg, W = cand_pk.shape[1:3]
    TH, TW = 8, 128
    nty, ntx = Hg // TH, W // TW
    Hs, Ws = inputs.src_imgs.shape[1:]
    Hs_p = ((Hs + 8 * R - 1) // (8 * R)) * (8 * R)
    Ws_p = ((Ws + 127) // 128) * 128

    m = jnp.einsum("ij,khwj->khwi", vg.KrT, cand_pk[..., :3],
                   precision=jax.lax.Precision.HIGHEST)
    iw = 1.0 / cand_pk[..., 3]

    ii = jnp.arange(Hg, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    rr = 2 * ii + (jnp.asarray(off0, jnp.int32) + jj) % 2
    yy = rr.astype(jnp.float32)
    xx = jj.astype(jnp.float32) * jnp.ones((Hg, 1), jnp.float32)

    @jax.jit
    def bounds_vt(v, di, dj):
        # v/di/dj are TRACED (one compiled program serves all 24
        # (view, tap) calls — each retrace would re-upload a program
        # through the axon tunnel)
        a = vg.A.astype(jnp.float32)[v]
        b = vg.B.astype(jnp.float32)[v]
        mq = (m[..., 0] * xx + m[..., 1] * yy + m[..., 2]) * iw
        # rank-1 form as in the kernel: p(di,dj) = p00 + di*u + dj*t
        m0i = m[..., 0] * iw
        m1i = m[..., 1] * iw
        px00 = a[0, 0] * xx + a[0, 1] * yy + a[0, 2] - b[0] * mq
        py00 = a[1, 0] * xx + a[1, 1] * yy + a[1, 2] - b[1] * mq
        pz00 = a[2, 0] * xx + a[2, 1] * yy + a[2, 2] - b[2] * mq
        ux = a[0, 0] - b[0] * m0i
        uy = a[1, 0] - b[1] * m0i
        uz = a[2, 0] - b[2] * m0i
        tx = a[0, 1] - b[0] * m1i
        ty = a[1, 1] - b[1] * m1i
        tz = a[2, 1] - b[2] * m1i
        px = px00 + di * ux + dj * tx
        py = py00 + di * uy + dj * ty
        pz = pz00 + di * uz + dj * tz
        inv = 1.0 / pz
        sx = jnp.clip(jnp.nan_to_num(px * inv), 0.0, Ws_p - 1.0)
        sy = jnp.clip(jnp.nan_to_num(py * inv), 0.0, Hs_p - 1.0)
        xi = jnp.floor(sx).astype(jnp.int32)
        yi = jnp.floor(sy).astype(jnp.int32)
        yt = yi.reshape(K, nty, TH, ntx, TW)
        xt = xi.reshape(K, nty, TH, ntx, TW)
        return (yt.min(axis=(2, 4)), yt.max(axis=(2, 4)),
                xt.min(axis=(2, 4)), xt.max(axis=(2, 4)))  # [K,nty,ntx]

    def visits(ymin, ymax, xmin, xmax, grp):
        g = list(grp)
        uy0 = ymin[g].min(axis=0)
        uy1 = ymax[g].max(axis=0)
        ux0 = xmin[g].min(axis=0)
        ux1 = xmax[g].max(axis=0)
        w_lo = uy0 // R
        w_hi = np.minimum(uy1 + 1, Hs_p - 1) // R
        # mirror of the kernel's two-phase chunking (pallas_ncc.py):
        # phase offset 4 when w_lo lands in the second half of its chunk
        off = np.where(w_lo % 8 >= 4, 4, 0)
        c_lo = (w_lo - off) // 8
        n_rb = (w_hi - off) // 8 + 1 - c_lo
        col_lo = ux0 // TW
        col_hi = np.minimum((ux1 + 1) // TW, Ws_p // TW - 1)
        n_cp = (col_hi + 1 - col_lo + 1) // 2
        return n_rb * n_cp

    V = int(jnp.sum(inputs.view_mask))
    out = {name: 0.0 for name in GROUPINGS}
    span_samples = {"union_rows": [], "near_rows": [], "far_rows": [],
                    "perk_rows": []}
    for v in range(V):
        for t in tap_ids:
            di, dj, _ = taps[t]
            ymin, ymax, xmin, xmax = [
                np.asarray(a) for a in
                bounds_vt(jnp.int32(v), jnp.float32(di), jnp.float32(dj))]
            for name, grp in GROUPINGS.items():
                gs = grp or (tuple(range(K)),)
                tot = 0.0
                for g in gs:
                    # per-group visit cost is weighted by |g| (each visit
                    # does per-k work for every member)
                    tot += float(visits(ymin, ymax, xmin, xmax, g).sum()
                                 ) * len(g)
                out[name] += tot
            span_samples["union_rows"].append(
                float((ymax.max(axis=0) - ymin.min(axis=0)).mean()))
            near = [0, 2, 4, 6]
            far = [1, 3, 5, 7]
            span_samples["near_rows"].append(
                float((ymax[near].max(axis=0) - ymin[near].min(axis=0)
                       ).mean()))
            span_samples["far_rows"].append(
                float((ymax[far].max(axis=0) - ymin[far].min(axis=0)
                       ).mean()))
            span_samples["perk_rows"].append(
                float((ymax - ymin).mean()))
    spans = {k: round(float(np.mean(v)), 1) for k, v in span_samples.items()}
    return out, spans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1184)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--capture", default="1,3",
                    help="capture state BEFORE these half-sweep indices")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stats_taps", default="0,17,35",
                    help="tap ids for window stats (36 taps total)")
    ap.add_argument("--skip_stats", action="store_true")
    ap.add_argument("--variants", default="one,nearfar,four,perk")
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # do NOT share the TPU cache dir: foreign-ISA CPU AOT entries
        # SIGILL, and CPU entries would pollute the TPU cache
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_cpu")

    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.engine import patchmatch as pm
    from acmmp_tpu.engine.inputs import build_solver_inputs
    from acmmp_tpu.ops import ncc as ncc_ops
    from acmmp_tpu.ops import parity
    from acmmp_tpu.ops import propagation as prop_ops
    from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas
    from acmmp_tpu.utils.synth import textured_relief_scene

    params = PatchMatchParams()
    t0 = time.monotonic()
    images, cams, _ = textured_relief_scene(
        n_views=args.views + 1, width=args.width, height=args.height,
        f=140.0 * args.width / 96.0, spread=1.2, converge=True)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params)
    print(f"# scene+inputs {time.monotonic() - t0:.1f}s", flush=True)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    mode = pm.Mode()
    eff = pm.effective_params(params, H, W)
    capture = {int(s) for s in args.capture.split(",") if s}

    # ---- run the production staged solve, capturing states ----
    f_init = jax.jit(pm.init_state, static_argnames=("params", "mode"))
    f_sweep = jax.jit(pm.sweep_once_dyn,
                      static_argnames=("params", "mode", "coherent"))
    key = jax.random.key(5)
    k_init, k_sweeps = jax.random.split(key)
    state = f_init(inputs, k_init, params=params, mode=mode)
    states = {}
    for s in range(args.sweeps):
        if s in capture:
            states[s] = state
        coh = s != 0 or pm.first_sweep_coherent(eff, mode)
        state = f_sweep(state, inputs, jnp.float32(s // 2),
                        jnp.int32(s % 2), jax.random.fold_in(k_sweeps, s),
                        params=params, mode=mode, coherent=coh)
    if args.sweeps in capture:
        states[args.sweeps] = state
    jax.block_until_ready(state)
    print(f"# solve+capture {time.monotonic() - t0:.1f}s", flush=True)

    nv = jnp.sum(inputs.view_mask)
    results = []
    variants = [v for v in args.variants.split(",") if v]

    # one compiled program per distinct computation (off0 and the state
    # are traced): each extra program is another tunnel upload
    @jax.jit
    def cand(st, off0):
        cp, _ = prop_ops.best_neighbor_planes(
            st.costs, st.planes, x, y, inputs.ref_cam.width,
            inputs.ref_cam.height, params)
        return parity.pack_rows_c(cp, off0)

    runs = {}

    def make_run(grp):
        @jax.jit
        def run(p, off0):
            out = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, p, params,
                row_pack_off=off0, n_views=nv, k_shared=True,
                k_groups=grp)
            return jnp.sum(out)
        return run

    for s, st in states.items():
        parity_mask = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2 == 0)
        if s % 2 == 1:
            parity_mask = ~parity_mask
        off0 = parity.row_pack_offset(parity_mask)
        cand_pk = jax.block_until_ready(cand(st, off0))

        if not args.skip_stats:
            tap_ids = [int(t) for t in args.stats_taps.split(",")]
            pred, spans = window_stats(inputs, vg, cand_pk, off0, params,
                                       tap_ids)
            base = pred["one"]
            pred_rel = {k: round(v / base, 3) for k, v in pred.items()}
            print(f"sweep {s}: predicted weighted visits (rel to 'one'): "
                  f"{pred_rel}  mean row spans: {spans}", flush=True)
        else:
            pred_rel, spans = {}, {}

        row = {"sweep": s, "pred_rel": pred_rel, "spans": spans,
               "times_ms": {}}
        if args.cpu:
            # CPU smoke: interpret mode validates plumbing, timings are
            # meaningless
            from jax.experimental.pallas import tpu as pltpu
            ctx = pltpu.force_tpu_interpret_mode
        else:
            import contextlib
            ctx = contextlib.nullcontext
        for name in variants:
            if name not in runs:
                runs[name] = make_run(GROUPINGS[name])
            run = runs[name]

            with ctx():
                float(run(cand_pk, off0))
                t1 = time.perf_counter()
                for _ in range(args.reps):
                    float(run(cand_pk, off0))
            dt = (time.perf_counter() - t1) / args.reps * 1e3
            row["times_ms"][name] = round(dt, 1)
            print(f"sweep {s}: prop K=8 {name:8s}: {dt:9.1f} ms/call",
                  flush=True)
        results.append(row)

    print(json.dumps({"tool": "prop_attack", "shape":
                      f"{args.width}x{args.height}", "views": args.views,
                      "results": results}), flush=True)
    if args.json:
        with open(args.json, "a") as fh:
            fh.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()
