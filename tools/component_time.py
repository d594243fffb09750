"""Decompose the headline pipeline wall into components on the chip:
planner field, warm-start extraction, pass-1 batched solve, rescue
pass.  The r4 knob sweep measured IDENTICAL 1.455 s walls across
barrier settings whose iteration depths differed by 35+ iterations —
meaning the wall is dominated by something other than solver
iterations; this pins down what.

    python tools/component_time.py [B] [N] [max_iter]
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
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 70

    from obca_tpu.solver import ipm
    from obca_tpu.spec import f32_solver_config, reverse_parking_spec
    from obca_tpu.warmstart import geometric, lattice

    dtype = jnp.float32
    base = reverse_parking_spec(N=N, Ts=24.0 / N, dtype=dtype)
    rng = np.random.default_rng(0)
    shifts = rng.uniform(-0.5, 0.5, size=(B, 2)).astype(np.float32)
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(
            base, x0=base.x0.at[0].add(dx).at[1].add(dy))
          for dx, dy in shifts],
    )
    cfg = f32_solver_config(max_iter=max_iter)
    lcfg = lattice.LatticeConfig.for_spec(base)

    field_fn = jax.jit(lambda b: lattice.plan_field(b, lcfg))

    @jax.jit
    def ws_fn(specs, field):
        return jax.vmap(
            lambda sp: geometric.lattice_warm_start(sp, dtype=dtype,
                                                    field=field)
        )(specs)

    @jax.jit
    def pass1_fn(specs, W0, cfg):
        return ipm.solve_batch(specs, cfg, W0)

    @jax.jit
    def rescued_fn(specs, W0, cfg):
        return ipm.solve_batch_rescued(specs, cfg, W0)

    def t(f, *a, reps=3):
        jax.block_until_ready(f(*a))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / reps, out

    t_field, field = t(field_fn, base)
    t_ws, W0 = t(ws_fn, specs, field)
    t_p1, res1 = t(pass1_fn, specs, W0, cfg)
    t_all, res = t(rescued_fn, specs, W0, cfg)

    st1 = np.asarray(res1.status)
    print(json.dumps({
        "B": B, "N": N, "max_iter": max_iter,
        "field_s": round(t_field, 4),
        "ws_s": round(t_ws, 4),
        "pass1_s": round(t_p1, 4),
        "rescued_total_s": round(t_all, 4),
        "rescue_s": round(t_all - t_p1, 4),
        "pass1_converged": int((st1 == 0).sum()),
        "pass1_iters_max": int(np.asarray(res1.iters).max()),
        "pass1_iters_med": float(np.median(np.asarray(res1.iters))),
        "total_converged": int((np.asarray(res.status) == 0).sum()),
        "total_iters_max": int(np.asarray(res.iters).max()),
        "ms_per_iter_pass1": round(
            t_p1 * 1e3 / max(int(np.asarray(res1.iters).max()), 1), 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
