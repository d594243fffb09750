"""On-chip (resolve_mu, resolve_tol) sweep for the MPC fleet — ONE
compile, many points (the knobs are jit arguments; see run_mpc.py).

    python tools/mpc_knob_sweep.py
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
    R = int(os.environ.get("MPC_ROLLOUTS", "128"))
    T = int(os.environ.get("MPC_STEPS", "30"))
    N = int(os.environ.get("MPC_N", "80"))

    from obca_tpu import mpc
    from obca_tpu.spec import f32_solver_config, reverse_parking_spec
    from obca_tpu.warmstart import geometric, lattice

    cfg0 = f32_solver_config(max_iter=70)
    base = reverse_parking_spec(N=N, Ts=24.0 / N, dtype=cfg0.dtype)
    rng = np.random.default_rng(0)
    shifts = rng.uniform(-0.3, 0.3, size=(R, 2)).astype(np.float32)
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(
            base, x0=base.x0.at[0].add(dx).at[1].add(dy))
          for dx, dy in shifts],
    )
    lcfg = lattice.LatticeConfig.for_spec(base)

    @jax.jit
    def fleet(specs, cfg, rmu, rtol):
        field = lattice.plan_field(base, lcfg)
        W0 = jax.vmap(
            lambda sp: geometric.lattice_warm_start(
                sp, dtype=cfg.dtype, field=field)
        )(specs)
        return mpc.run_fleet(specs, cfg, T, W0, resolve_mu=rmu,
                             resolve_tol=rtol)

    points = json.loads(os.environ.get("MPC_POINTS", "null")) or [
        {"rmu": 1e-5, "rtol": 1e-4},
        {"rmu": 1e-4, "rtol": 1e-4},
        {"rmu": 1e-4, "rtol": 3e-4},
        {"rmu": 1e-5, "rtol": 3e-4},
        {"rmu": 3e-5, "rtol": 2e-4},
    ]
    first = True
    for pt in points:
        rmu = jnp.asarray(pt["rmu"], jnp.float32)
        rtol = jnp.asarray(pt["rtol"], jnp.float32)
        res = jax.block_until_ready(fleet(specs, cfg0, rmu, rtol))
        if first:
            first = False          # compile pass
        t0 = time.perf_counter()
        res = jax.block_until_ready(fleet(specs, cfg0, rmu, rtol))
        wall = time.perf_counter() - t0
        st = np.asarray(res.status)
        it = np.asarray(res.iters)
        print(json.dumps({
            **pt,
            "ms_per_step_fleet": round(wall / T * 1e3, 2),
            "step_conv": round(float((st == 0).mean()), 4),
            "iters_p50": float(np.median(it)),
            "iters_p90": float(np.percentile(it, 90)),
            "init_conv": round(float(
                (np.asarray(res.status0) == 0).mean()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
