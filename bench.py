"""Benchmark: full OBCA parking solves/s on the local device.

Runs the complete pipeline (SE(2)-lattice warm start + batched
interior-point solve, both on-device) for a batch of randomized
reverse-parking instances at the canonical N=80 horizon, and prints ONE
JSON line:

  {"metric": "parking_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": R}

Baseline: the reference pipeline (Hybrid A* + Ipopt) takes ~1 s per
solve on a single CPU core (BASELINE.md — paper-era figure), so
vs_baseline == solves/s.

The planner field (`lattice.plan_field`) depends only on the scenario
geometry, is computed once outside the timed region's per-scenario
work, and is shared across the batch — but it IS recomputed inside
every timed repetition, so the reported number covers the full
pipeline including planning.
"""

import dataclasses
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    B = int(os.environ.get("BENCH_B", "128"))
    N = int(os.environ.get("BENCH_N", "80"))
    max_iter = int(os.environ.get("BENCH_ITERS", "120"))
    dtype = jnp.float32
    if os.environ.get("BENCH_DTYPE", "f32") == "f64":
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64

    from obca_tpu.solver import ipm
    from obca_tpu.spec import (SolverConfig, f32_solver_config,
                               reverse_parking_spec)
    from obca_tpu.warmstart import geometric, lattice

    base = reverse_parking_spec(N=N, Ts=24.0 / N, dtype=dtype)
    rng = np.random.default_rng(0)
    shifts = rng.uniform(-0.5, 0.5, size=(B, 2)).astype(np.float32)
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(
            base,
            x0=base.x0.at[0].add(dx).at[1].add(dy))
          for dx, dy in shifts],
    )
    if dtype == jnp.float32:
        cfg = f32_solver_config(max_iter=max_iter)
    else:
        cfg = SolverConfig(max_iter=max_iter, dtype=dtype)

    @jax.jit
    def pipeline(specs, base):
        # The planner field depends only on (obstacles, goal): compute
        # once, share across the batch; each scenario extracts its own
        # start-dependent path from it.
        field = lattice.plan_field(base)

        def one(sp):
            W0 = geometric.lattice_warm_start(sp, dtype=dtype,
                                              field=field)
            return ipm.solve_single(sp, cfg, W0)

        return jax.vmap(one, in_axes=(0,))(specs)

    # Warmup / compile.
    res = jax.block_until_ready(pipeline(specs, base))
    n_conv = int(np.sum(np.asarray(res.status) == ipm.STATUS_CONVERGED))

    # Timed runs.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for _ in range(reps):
        res = jax.block_until_ready(pipeline(specs, base))
    dt_s = (time.perf_counter() - t0) / reps

    solves_per_s = B / dt_s
    print(json.dumps({
        "metric": "parking_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1.0, 3),
        "detail": {
            "B": B, "N": N, "converged": n_conv,
            "batch_wall_s": round(dt_s, 3),
            "iters_max": int(np.asarray(res.iters).max()),
            "iters_med": int(np.median(np.asarray(res.iters))),
            "dtype": str(np.dtype(dtype).name),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
