"""Debug the f32/mixed fast-path failure (VERDICT round 1 item 1)."""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", os.environ.get("DBG_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from obca_tpu.solver import ipm  # noqa: E402
from obca_tpu.spec import (SolverConfig, f32_solver_config,  # noqa: E402
                           mixed_solver_config, parallel_parking_spec,
                           reverse_parking_spec)
from obca_tpu.warmstart import geometric  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    which = sys.argv[2] if len(sys.argv) > 2 else "f32"
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    scen = sys.argv[4] if len(sys.argv) > 4 else "reverse"
    kw = {}
    if "dist" in scen:
        kw["signed"] = False
    if "free" in scen:
        kw["fix_time"] = False
    make = (parallel_parking_spec if scen.startswith("parallel")
            else reverse_parking_spec)
    spec = make(N=N, Ts=24.0 / N, **kw)
    if which == "f32":
        cfg = f32_solver_config()
    elif which == "mixed":
        cfg = mixed_solver_config()
    else:
        cfg = SolverConfig()
    dt = cfg.dtype
    W0 = geometric.lattice_warm_start(spec, dtype=dt)
    print("W0 dtype:", W0.dtype, " finite:", bool(jnp.all(jnp.isfinite(W0))))
    t0 = time.time()
    state = ipm.debug_iterate(spec, cfg, W0, n_iter=n_iter)
    print(f"wall={time.time()-t0:.1f}s converged={bool(state.converged)} "
          f"err={float(state.err):.3e}")


if __name__ == "__main__":
    main()
