"""Minimal repro for the persistent-cache reload segfault on CPU.

Phase 'write': compile one staged sweep program under the virtual 8-device
CPU platform, persisting it to a scratch cache dir.
Phase 'read': in a fresh process, compile the same program — the cache hit
deserializes the executable (the segfault site in the pytest suite).

Usage: python tools/cache_reload_repro.py write|read [cache_dir]
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
cache = sys.argv[2] if len(sys.argv) > 2 else "/tmp/repro_cache"
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

from acmmp_tpu.config import PatchMatchParams  # noqa: E402
from acmmp_tpu.engine import patchmatch as pm  # noqa: E402
from acmmp_tpu.engine.inputs import build_solver_inputs  # noqa: E402
from acmmp_tpu.utils.synth import textured_plane_scene  # noqa: E402

params = PatchMatchParams(patch_size=7)
images, cams, _ = textured_plane_scene(n_views=4, width=64, height=48)
inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                             params, pad_h=1, pad_w=1)
mode = pm.Mode()
key = jax.random.key(0)

f_init = jax.jit(pm.init_state, static_argnames=("params", "mode"))
f_sweep = jax.jit(pm.sweep_once,
                  static_argnames=("sweep_idx", "params", "mode"))
state = f_init(inputs, key, params=params, mode=mode)
state = f_sweep(state, inputs, sweep_idx=0, key=key, params=params,
                mode=mode)
jax.block_until_ready(state)
print(f"{sys.argv[1]}: OK (cache dir {cache})")
