"""Debug an MPC-style warm re-solve (mu_init=1e-3 from converged W)."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from obca_tpu.solver import ipm  # noqa: E402
from obca_tpu.spec import SolverConfig, reverse_parking_spec  # noqa: E402
from obca_tpu.warmstart import geometric  # noqa: E402


def main():
    spec = reverse_parking_spec(N=40, Ts=0.6)
    W0 = geometric.lattice_warm_start(spec)
    res = jax.jit(
        lambda sp: ipm.solve_single(sp, SolverConfig(max_iter=200), W0)
    )(spec)
    print("first solve:", int(res.status), int(res.iters),
          float(res.err))
    cfg = SolverConfig(max_iter=60, mu_init=jnp.asarray(1e-3))
    if len(sys.argv) > 1 and sys.argv[1] == "cold":
        ipm.debug_iterate(spec, cfg, res.W, n_iter=40)
    else:
        res2 = jax.jit(
            lambda sp, w, d: ipm.solve_single(sp, cfg, w, duals0=d)
        )(spec, res.W, res.duals)
        print("warm re-solve:", int(res2.status), int(res2.iters),
              float(res2.err))


if __name__ == "__main__":
    main()
