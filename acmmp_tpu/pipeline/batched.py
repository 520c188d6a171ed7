"""Batched (and optionally mesh-sharded) execution of per-view solves.

The reference loops reference views sequentially on one GPU
(src/main_ACMMP.cpp:112-137). Here a whole batch of views runs per
dispatch: each solver stage (init / half-sweep / finalize) is mapped over
the view axis and executed as its own XLA program — the staged structure
both avoids the XLA:TPU multi-sweep miscompile (see
engine.patchmatch.run_patchmatch_staged) and is the natural place for
cross-chip collectives. With a mesh, every stage is shard_mapped over the
"view" axis, and the geometric pass's neighbor depth maps are gathered
in-program (lax.all_gather over ICI) instead of re-read from disk.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from acmmp_tpu.parallel.shmap import shard_map

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.patchmatch import (
    Mode, SolverInputs, SolverOutputs, effective_params, finalize,
    first_sweep_coherent, init_state, sweep_once_dyn,
)
from acmmp_tpu.parallel.sharding import VIEW_AXIS, stack_solver_inputs

_specs = partial(jax.tree.map, lambda _: P(VIEW_AXIS))


class BatchedSolver:
    """Caches jitted batch-mapped (and shard_mapped) stage programs per
    (params, mode, shapes). One instance per pipeline run."""

    def __init__(self, params: PatchMatchParams, mesh: Optional[Mesh] = None):
        self.params = params
        self.mesh = mesh
        self._fns = {}

    def _stage_fns(self, mode: Mode):
        key = mode
        if key in self._fns:
            return self._fns[key]
        params = self.params

        # lax.map (sequential over the local view batch), not vmap: the
        # Pallas NCC kernel has no batching rule, and sequential per-chip
        # solves match the reference's memory model
        v_init = lambda i, k: jax.lax.map(          # noqa: E731
            lambda x: init_state(x[0], x[1], params, mode), (i, k))
        v_fin = lambda s, i: jax.lax.map(           # noqa: E731
            lambda x: finalize(x[0], x[1], params), (s, i))

        # iteration/parity are TRACED (it/par scalars broadcast over the
        # batch): one compiled sweep program serves every coherent
        # half-sweep; only `coherent` (static: changes the NCC K-batch
        # layout) splits the first post-random-init sweep out.
        def v_sweep(s, i, k, it, par, coherent):
            return jax.lax.map(
                lambda x: sweep_once_dyn(x[0], x[1], it, par, x[2], params,
                                         mode, coherent=coherent), (s, i, k))

        if self.mesh is None:
            fns = (
                jax.jit(v_init),
                jax.jit(v_sweep, static_argnames=("coherent",)),
                jax.jit(v_fin),
            )
        else:
            mesh = self.mesh

            def sm(fn, n_in):
                def wrapped(*args, **kw):
                    specs = tuple(_specs(a) for a in args)
                    return shard_map(
                        lambda *a: fn(*a, **kw), mesh=mesh,
                        in_specs=specs,
                        out_specs=_specs(jax.eval_shape(
                            lambda *a: fn(*a, **kw), *args)),
                        check_rep=False)(*args)
                return wrapped

            def sm_sweep(s, i, k, it, par, coherent):
                # it/par are replicated scalars: broadcast them into the
                # shard_map as whole-array (P()) operands
                fn = partial(v_sweep, coherent=coherent)
                specs = (_specs(s), _specs(i), _specs(k), P(), P())
                return shard_map(
                    lambda *a: fn(*a), mesh=mesh, in_specs=specs,
                    out_specs=_specs(jax.eval_shape(fn, s, i, k, it, par)),
                    check_rep=False)(s, i, k, it, par)

            fns = (
                jax.jit(sm(v_init, 2)),
                jax.jit(sm_sweep, static_argnames=("coherent",)),
                jax.jit(sm(v_fin, 2)),
            )
        self._fns[key] = fns
        return fns

    def pad(self, n: int) -> int:
        """Batch size after padding to a mesh multiple."""
        if self.mesh is None:
            return n
        m = self.mesh.devices.size
        return ((n + m - 1) // m) * m

    def solve_batch(self, inputs_list: Sequence[SolverInputs],
                    keys: Sequence[jax.Array], mode: Mode) -> List[SolverOutputs]:
        """Solve a batch of same-shape problems; returns per-view outputs
        (padding replicas dropped). Multi-process (one JAX process per
        host): inputs are placed as globally-sharded arrays from each
        process's host copy and outputs are allgathered back to every
        host (parallel/multihost.py)."""
        from acmmp_tpu.parallel import multihost as mh

        n = len(inputs_list)
        np_ = self.pad(n)
        padded = list(inputs_list) + [inputs_list[-1]] * (np_ - n)
        kp = list(keys) + [keys[-1]] * (np_ - n)
        batch = stack_solver_inputs(padded)
        kb = jnp.stack(kp)

        f_init, f_sweep, f_fin = self._stage_fns(mode)
        # derive stage keys exactly as run_patchmatch_staged does (split,
        # then fold_in per sweep) so a given seed yields the same
        # reconstruction in every executor configuration (DEVIATIONS.md
        # reproducibility contract)
        ks2 = jax.vmap(jax.random.split)(kb)               # [B, 2]
        k_init, k_sweeps = ks2[:, 0], ks2[:, 1]
        n_sweeps = 2 * self.params.max_iterations
        sweep_keys = [jax.vmap(lambda k: jax.random.fold_in(k, s))(k_sweeps)
                      for s in range(n_sweeps)]

        multiproc = self.mesh is not None and mh.is_multiprocess()
        if multiproc:
            spec = P(VIEW_AXIS)
            batch = jax.tree.map(
                lambda x: mh.host_to_global(self.mesh, spec, x), batch)
            k_init = mh.keys_to_global(self.mesh, spec, k_init)
            sweep_keys = [mh.keys_to_global(self.mesh, spec, k)
                          for k in sweep_keys]

        state = f_init(batch, k_init)
        eff = effective_params(self.params,
                               *inputs_list[0].ref_img.shape)
        for s in range(n_sweeps):
            coh = s != 0 or first_sweep_coherent(eff, mode)
            state = f_sweep(state, batch, sweep_keys[s],
                            jnp.float32(s // 2), jnp.int32(s % 2),
                            coherent=coh)
        out = f_fin(state, batch)
        out = jax.tree.map(mh.global_to_host if multiproc else np.asarray,
                           out)
        return [jax.tree.map(lambda a: a[i], out) for i in range(n)]
