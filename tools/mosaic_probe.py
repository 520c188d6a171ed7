"""Probe Mosaic support for the ops the packed-gather NCC kernel needs:
int32 take_along_axis (axis=1, 128 lanes), per-lane-variable right shifts,
byte masking + int->float converts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe(name, fn, *args):
    try:
        out = fn(*args)
        print(f"{name}: OK", np.asarray(out).ravel()[:4])
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}")
        return False


H, W = 8, 128
words = (np.random.randint(0, 2**31, (H, W)).astype(np.int32))
idx = np.random.randint(0, W, (H, W)).astype(np.int32)
sh = (8 * np.random.randint(0, 4, (H, W))).astype(np.int32)


def k_taa_i32(w_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(w_ref[...], i_ref[...], axis=1)


def k_dyn_shift(w_ref, s_ref, o_ref):
    v = jax.lax.shift_right_logical(w_ref[...], s_ref[...])
    o_ref[...] = (v & 0xFF).astype(jnp.float32)


def k_unpack(w_ref, o_ref):
    w = w_ref[...]
    acc = jnp.zeros(w.shape, jnp.float32)
    for k in range(4):
        b = (jax.lax.shift_right_logical(w, jnp.int32(8 * k)) & 0xFF)
        acc = acc + b.astype(jnp.float32)
    o_ref[...] = acc


def k_taa_axis0_i32(w_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(w_ref[...], i_ref[...] % 8, axis=0)


def run(kernel, outdtype, *arrs):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), outdtype),
    )(*[jnp.asarray(a) for a in arrs])


probe("taa_i32_axis1", lambda: run(k_taa_i32, jnp.int32, words, idx))
probe("dyn_lane_shift", lambda: run(k_dyn_shift, jnp.float32, words, sh))
probe("unpack4_static", lambda: run(k_unpack, jnp.float32, words))
probe("taa_i32_axis0", lambda: run(k_taa_axis0_i32, jnp.int32, words, idx))

# correctness of taa_i32 vs numpy
got = np.asarray(run(k_taa_i32, jnp.int32, words, idx))
want = np.take_along_axis(words, idx, axis=1)
print("taa_i32 exact:", np.array_equal(got, want))
got = np.asarray(run(k_dyn_shift, jnp.float32, words, sh))
want = ((words.astype(np.uint32) >> sh) & 0xFF).astype(np.float32)
print("dyn_shift exact:", np.array_equal(got, want))
