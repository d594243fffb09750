"""One-shard config probe for the randomized parallel-family sweep
(r5: the reverse-tuned f32 config converged 54% and the canonical
parallel_fastpath config only ~36% on these cold randomized draws —
pick the sweep configuration from data, not from the golden-instance
tuning).

Solves ONE 128-lane shard (same generator/seed as the sweep) under
leaf-knob variants of the two compiled shapes:

  A: f32_solver_config statics (SOC off, m=4, ruiz 3)
  B: parallel_fastpath statics (SOC on, m=16, ruiz 4)

Leaf knobs (tol, mu_min, mu_init, delta_w) vary WITHOUT recompiling
(cfg is a jit argument).

    python tools/dbg_par_sweep_cfg.py [A|B|AB]
"""
import dataclasses
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
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"

    from obca_tpu.solver import ipm
    from obca_tpu.spec import (f32_solver_config,
                               parallel_fastpath_config,
                               parallel_parking_spec,
                               randomized_parallel_parking_specs)
    from obca_tpu.warmstart import geometric, lattice

    N = 80
    specs, layouts, _ = randomized_parallel_parking_specs(
        128, n_layouts=8, seed=0, N=N, Ts=24.0 / N,
        dtype=jnp.float32)
    base = parallel_parking_spec(N=N, Ts=24.0 / N, dtype=jnp.float32,
                                 max_obs=4, max_faces=5)
    lcfg = lattice.LatticeConfig.for_spec(base)

    @jax.jit
    def solve(specs, layouts, cfg):
        W0 = geometric.grouped_lattice_warm_start(
            specs, layouts, lcfg, dtype=jnp.float32)
        return ipm.solve_batch(specs, cfg, W0)

    shapes = {}
    if "A" in which:
        shapes["A_f32"] = f32_solver_config(max_iter=250)
    if "B" in which:
        shapes["B_fastpath"] = parallel_fastpath_config(max_iter=250)

    leaf_variants = {
        "mu1e-3": dict(mu_init=1e-3),
        "mu1e-3_dw4": dict(mu_init=1e-3, delta_w=1e-4),
        "mu1e-2": dict(mu_init=1e-2),
        "mu0.1": dict(mu_init=0.1),
        "mu1e-3_loose": dict(mu_init=1e-3, tol=3e-4, mu_min=3e-6),
    }
    for sname, cfg0 in shapes.items():
        for vname, kw in leaf_variants.items():
            cfg = dataclasses.replace(
                cfg0, **{k: jnp.asarray(v, jnp.float32)
                         for k, v in kw.items()})
            t0 = time.perf_counter()
            res = jax.block_until_ready(solve(specs, layouts, cfg))
            st = np.asarray(res.status)
            print(f"{sname} {vname}: {int((st == 0).sum())}/128 "
                  f"(nan {int((st == 2).sum())}) "
                  f"wall {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
