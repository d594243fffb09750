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
    # Pass-1 iteration cap; the multi-round rescue handles the tail,
    # so this sits just above the median iteration count (47) instead
    # of 2.5x it.  Measured r5 (with the round-1-full + capped-cleanup
    # rescue): cap 60 -> 148 solves/s, cap 55 -> 185, both 128/128
    # converged (the r4 single-round rescue dropped a lane at 55 —
    # bench/out/cap_sweep.json records the robustness window).
    max_iter = int(os.environ.get("BENCH_ITERS", "55"))
    mode = os.environ.get("BENCH_DTYPE", "f32")
    dtype = jnp.float32
    if mode in ("f64", "mixed"):
        # mixed: f64 iterate (emulated elementwise on TPU) + f32 MXU
        # factorization — needs x64 enabled.
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64

    from obca_tpu.solver import ipm
    from obca_tpu.spec import (SolverConfig, f32_solver_config,
                               mixed_solver_config, reverse_parking_spec)
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
    if mode == "mixed":
        cfg = mixed_solver_config(max_iter=max_iter)
    elif dtype == jnp.float32:
        cfg = f32_solver_config(max_iter=max_iter)
    else:
        cfg = SolverConfig(max_iter=max_iter, dtype=dtype)

    # Dynamic (pytree-leaf) barrier knobs — cfg is a jit *argument*, so
    # overriding these costs no recompile (tools/knob_sweep.py is the
    # measured basis for non-default values).
    if os.environ.get("BENCH_MU_INIT"):
        import dataclasses as _dc
        cfg = _dc.replace(cfg, mu_init=jnp.asarray(
            float(os.environ["BENCH_MU_INIT"]), jnp.float32).astype(
                cfg.mu_init.dtype))
    rescue_mu = jnp.asarray(
        float(os.environ.get("BENCH_RESCUE_MU", "1e-5")), jnp.float32)

    # Static lattice geometry (concrete spec -> static-shift sweep).
    lcfg = lattice.LatticeConfig.for_spec(base)

    @jax.jit
    def pipeline(specs, base, cfg, rescue_mu):
        # The planner field depends only on (obstacles, goal): compute
        # once, share across the batch; each scenario extracts its own
        # start-dependent path from it.
        field = lattice.plan_field(base, lcfg)
        W0 = jax.vmap(
            lambda sp: geometric.lattice_warm_start(sp, dtype=dtype,
                                                    field=field)
        )(specs)
        # Two-pass batched solve: lanes whose warm start lands in a bad
        # dual basin are re-seeded from a converged neighbor (see
        # ipm.solve_batch_rescued) — converged == B instead of ~92%.
        return ipm.solve_batch_rescued(specs, cfg, W0,
                                       rescue_mu=rescue_mu)

    # Warmup / compile.
    res = jax.block_until_ready(pipeline(specs, base, cfg, rescue_mu))
    n_conv = int(np.sum(np.asarray(res.status) == ipm.STATUS_CONVERGED))

    # Timed runs.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for _ in range(reps):
        res = jax.block_until_ready(pipeline(specs, base, cfg,
                                             rescue_mu))
    dt_s = (time.perf_counter() - t0) / reps

    solves_per_s = B / dt_s

    # On-chip parity through the real (Mosaic-compiled) kernel path:
    # solve the canonical golden instance from its committed warm start
    # under vmap (vmap is what dispatches to the Pallas kernels on TPU)
    # and compare controls to the f64 oracle golden (BASELINE.json:2).
    parity_gap = None
    if os.environ.get("BENCH_PARITY", "1") == "1":
        gold = np.load(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "oracle", "goldens", "reverse_parking_N80.npz"))
        gspec = reverse_parking_spec(
            N=int(gold["N"]), Ts=float(gold["Ts"]), dtype=dtype)
        gW0 = jnp.asarray(gold["W0"], dtype)[None]
        gspecs = jax.tree.map(lambda x: x[None], gspec)
        # The parity datum measures the PRODUCTION solver config on the
        # canonical instance (full iteration budget) — not the
        # benchmark batch's pass-1 throughput cap, which is a separate
        # knob backed by the multi-round rescue (r5: cap 55 under the
        # old shared-cap probe read 2.5e-3 purely because the probe
        # solve was cut at 55 iterations).
        if mode == "mixed":
            gcfg = mixed_solver_config()
        elif dtype == jnp.float32:
            gcfg = f32_solver_config()
        else:
            gcfg = SolverConfig(dtype=dtype)
        gres = jax.jit(jax.vmap(
            lambda sp, w: ipm.solve_single(sp, gcfg, w)))(gspecs, gW0)
        parity_gap = float(np.abs(
            np.asarray(gres.U[0], np.float64) - gold["U"]).max())

    print(json.dumps({
        "metric": "parking_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1.0, 3),
        "detail": {
            "B": B, "N": N, "converged": n_conv,
            "converged_solves_per_s": round(n_conv / dt_s, 3),
            "batch_wall_s": round(dt_s, 3),
            "iters_max": int(np.asarray(res.iters).max()),
            "iters_med": int(np.median(np.asarray(res.iters))),
            "dtype": mode,
            "parity_gap_vs_oracle": parity_gap,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
