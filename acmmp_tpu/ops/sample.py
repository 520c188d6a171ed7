"""Coherent multi-channel 2D map sampling (nearest) — oracle + dispatch.

Fusion projects every reference pixel into each source view and reads the
source depth/normal maps at the rounded integer coordinates
(src/acmmp_definitions.cpp:938-966 reads `depths[j]` / `normals[j]` at the
projected point). As a jnp gather that read runs at XLA:TPU's ~10-20
ns/element; the Pallas kernel (`ops/pallas_sample.py`) reuses the row-scan
machinery of the geometric-consistency kernel instead, exploiting the
coherence of projected coordinate fields.

Contract: `maps[v, c]` sampled at `(rr[v], cc[v])` where `valid[v]`, zeros
elsewhere. Valid lanes must carry in-range indices (callers clip); invalid
lanes may hold garbage (e.g. NaN casts) — they neither widen the kernel's
scan window nor affect the output. Both backends return bitwise-identical
results (the kernel moves whole f32 words; there is no arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather2d(maps: jax.Array, rr: jax.Array, cc: jax.Array,
             valid: jax.Array) -> jax.Array:
    """jnp oracle: `maps` [V, C, Hs, Ws] sampled at (`rr`, `cc`) [V, H, W]
    where `valid`, else 0. Returns [V, C, H, W]."""
    V, C, Hs, Ws = maps.shape

    def one(m, r, c, ok):
        idx = jnp.where(ok, r * Ws + c, 0).reshape(-1)
        out = jnp.take(m.reshape(C, Hs * Ws), idx, axis=1)
        return jnp.where(ok.reshape(-1)[None], out, 0.0).reshape(
            (C,) + r.shape)

    return jax.vmap(one)(maps, rr, cc, valid)


def gather2d_sample(maps: jax.Array, rr: jax.Array, cc: jax.Array,
                    valid: jax.Array, backend: str = "auto") -> jax.Array:
    """Backend dispatch: the Pallas row-scan kernel on TPU ("auto"), the
    jnp oracle otherwise. Same contract as `gather2d`."""
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from acmmp_tpu.ops.pallas_sample import gather2d_pallas

        return gather2d_pallas(maps, rr, cc, valid)
    return gather2d(maps, rr, cc, valid)
