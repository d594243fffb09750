"""Device-mesh sharded solving (SURVEY.md §2.2 DP row, §5 'Distributed
communication backend').

Design: scenario parallelism.  A batch of ProblemSpecs (stacked pytree)
shards its leading axis over a 1-D mesh axis ``"scenario"``; each device
runs the identical batched solver on its shard (pure SPMD — solves are
embarrassingly parallel), and only scalar health metrics are reduced
across the mesh with `psum` (riding ICI within a slice, DCN across
hosts via `jax.distributed`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from obca_tpu.solver import ipm
from obca_tpu.spec import ProblemSpec, SolverConfig


def scenario_mesh(devices=None, name: str = "scenario") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (name,))


def solve_sharded(specs: ProblemSpec, cfg: SolverConfig, mesh: Mesh,
                  W0=None, with_metrics: bool = True):
    """Solve a stacked-spec batch sharded over the mesh's scenario axis.

    The batch size must divide the mesh size.  Returns the SolveResult
    batch (sharded) and, when `with_metrics`, a small dict of
    psum-reduced fleet metrics (converged count, max KKT error, mean
    iterations) — the only cross-device communication in the workload.
    """
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    specs = jax.device_put(specs, shard)
    if W0 is not None:
        W0 = jax.device_put(W0, shard)

    @partial(jax.jit, out_shardings=None)
    def run(specs, W0):
        res = ipm.solve_batch(specs, cfg, W0)
        if not with_metrics:
            return res, {}
        metrics = {
            "n_converged": jnp.sum(
                (res.status == ipm.STATUS_CONVERGED).astype(jnp.int32)
            ),
            "max_err": jnp.max(res.err),
            "mean_iters": jnp.mean(res.iters.astype(jnp.float32)),
            "mean_obj": jnp.mean(res.obj),
        }
        return res, metrics

    return run(specs, W0)


def make_sharded_solver(pipeline, mesh: Mesh):
    """Build a *cached* jitted sharded runner for an arbitrary batched
    solve pipeline.  Returns ``run(specs) -> (SolveResult, metrics)``;
    call it repeatedly (e.g. timed benchmark reps) without re-tracing —
    the jit closure is created once per (pipeline, mesh), which is what
    scaling measurements must time (ADVICE r2: re-jitting per call put
    Python tracing inside the timed region)."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(specs):
        res = pipeline(specs)
        metrics = {
            "n_converged": jnp.sum(
                (res.status == ipm.STATUS_CONVERGED).astype(jnp.int32)
            ),
            "max_err": jnp.max(res.err),
            "mean_iters": jnp.mean(res.iters.astype(jnp.float32)),
        }
        return res, metrics

    def runner(specs):
        return run(jax.device_put(specs, shard))

    return runner


def solve_sharded_fn(pipeline, specs, mesh: Mesh):
    """One-shot convenience wrapper over :func:`make_sharded_solver`.
    For repeated/timed calls build the runner once instead."""
    return make_sharded_solver(pipeline, mesh)(specs)


def dryrun_step(specs: ProblemSpec, cfg: SolverConfig, mesh: Mesh):
    """One sharded solve step on tiny shapes — used by the multi-chip
    dry-run harness to validate that the full solver compiles and
    executes under a device mesh."""
    res, metrics = solve_sharded(specs, cfg, mesh)
    jax.block_until_ready(res.U)
    return res, metrics
