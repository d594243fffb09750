"""Differential per-phase profiling of the batched TPU solve
(SURVEY.md §5 tracing/profiling; VERDICT round-1 item 10).

Times the full pipeline under config variants that disable or shrink
one phase at a time; the difference attributes wall-clock to phases:

  base          full f32 config (GCR m, 12-pt line search, Ruiz 3, SOC)
  -gcr          refine_iters (GCR steps) 10 -> 2
  -merit        ls_steps 12 -> 2
  -ruiz         ruiz_iters 3 -> 0
  -soc          SOC solve off

All runs use a FIXED iteration count (max_iter with tol=0 would never
stop; instead convergence is disabled by tol=1e-30 and max_iter=K) so
the comparison is per-iteration-count fair.

Emits one JSON line with ms/iteration per phase and a bandwidth
roofline estimate for the Pallas factor/solve kernels.

Usage: python tools/profile_solve.py [B] [N] [K_iters]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from obca_tpu import nlp
    from obca_tpu.solver import ipm
    from obca_tpu.spec import f32_solver_config, reverse_parking_spec
    from obca_tpu.warmstart import geometric, lattice

    base_spec = reverse_parking_spec(N=N, Ts=24.0 / N, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    shifts = rng.uniform(-0.3, 0.3, size=(B, 2)).astype(np.float32)
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(base_spec,
                              x0=base_spec.x0.at[0].add(dx).at[1].add(dy))
          for dx, dy in shifts],
    )
    field = lattice.plan_field(base_spec,
                               lattice.LatticeConfig.for_spec(base_spec))
    W0s = jax.jit(jax.vmap(
        lambda sp: geometric.lattice_warm_start(sp, dtype=jnp.float32,
                                                field=field)
    ))(specs)

    variants = {
        "base": {},
        "gcr2": dict(refine_iters=2),
        "gcr1": dict(refine_iters=1),
        "merit2": dict(ls_steps=2),
        "merit8": dict(ls_steps=8),
        "ruiz0": dict(ruiz_iters=0),
        "ruiz2": dict(ruiz_iters=2),
        "soc": dict(soc=True),
        "nowd": dict(watchdog=False),
        "nols": dict(dual_init_ls=False),
    }

    def run(cfgkw):
        cfg = f32_solver_config(max_iter=K, tol=1e-30, **cfgkw)

        @jax.jit
        def f(sps, w0s):
            return jax.vmap(
                lambda sp, w: ipm.solve_single(sp, cfg, w)
            )(sps, w0s)

        res = jax.block_until_ready(f(specs, W0s))   # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            res = jax.block_until_ready(f(specs, W0s))
        dt = (time.perf_counter() - t0) / reps
        assert int(np.asarray(res.iters).max()) == K
        return dt

    out = {"B": B, "N": N, "K": K}
    times = {}
    for name, kw in variants.items():
        times[name] = run(kw)
        out[f"wall_s_{name}"] = round(times[name], 4)

    per_it = lambda t: t / K * 1e3
    out["ms_per_iter"] = round(per_it(times["base"]), 3)
    # Marginal phase costs (differences of fixed-iteration walls).
    out["ms_gcr_per_step"] = round(
        per_it(times["base"] - times["gcr1"]) / 3.0, 3)
    # m=4 total ≈ 4 x marginal step (step 1 costs the same streams).
    out["ms_gcr_total"] = round(
        4.0 * per_it(times["base"] - times["gcr1"]) / 3.0, 3)
    out["ms_merit10"] = round(per_it(times["base"] - times["merit2"]), 3)
    out["ms_merit_per_pt"] = round(
        per_it(times["base"] - times["merit8"]) / 4.0, 3)
    out["ms_ruiz3"] = round(per_it(times["base"] - times["ruiz0"]), 3)
    out["ms_ruiz_per_sweep"] = round(
        per_it(times["base"] - times["ruiz2"]), 3)
    out["ms_soc"] = round(per_it(times["soc"] - times["base"]), 3)
    out["ms_watchdog"] = round(per_it(times["base"] - times["nowd"]), 3)

    # Exact attribution: one traced run of the base config, aggregated
    # per ipm.step named scope (r5 — the r4 knob-differencing left
    # 5.8 of 9.3 ms/iter unattributed and sat at its noise floor,
    # VERDICT r4 weak #3; the knob figures above remain as
    # cross-checks of the marginal costs).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import trace_solve as ts

    cfg = f32_solver_config(max_iter=K, tol=1e-30)

    @jax.jit
    def f_base(sps, w0s):
        return jax.vmap(
            lambda sp, w: ipm.solve_single(sp, cfg, w)
        )(sps, w0s)

    jax.block_until_ready(f_base(specs, W0s))
    logdir = "/tmp/obca_profile_trace"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        jax.block_until_ready(f_base(specs, W0s))
    wall = time.perf_counter() - t0
    events = ts._load_trace_events(logdir)
    _, total_us, phases = ts._device_op_durations(events)
    out["trace_phase_ms_per_iter"] = {
        k: round(v / 1e3 / K, 3)
        for k, v in sorted(phases.items(), key=lambda kv: -kv[1])}
    out["trace_device_ms_per_iter"] = round(total_us / 1e3 / K, 3)
    # Host/dispatch share = untraced wall minus device time (the
    # traced run's own wall is inflated by profiler overhead).
    out["ms_host_dispatch_gap"] = round(
        out["ms_per_iter"] - total_us / 1e3 / K, 3)
    # The only device time not attributed to a named phase/kernel.
    out["ms_unattributed"] = out["trace_phase_ms_per_iter"].get(
        "other", 0.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
