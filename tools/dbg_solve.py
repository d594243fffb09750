"""Interactive debug driver for the IPM (CPU, f64). Not part of the API."""
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

from obca_tpu import geometry, nlp  # noqa: E402
from obca_tpu.solver import ipm  # noqa: E402
from obca_tpu.spec import SolverConfig, reverse_parking_spec  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spec = reverse_parking_spec(N=N, Ts=0.3 * 80 / N)
    cfg = SolverConfig(max_iter=max_iter)
    t0 = time.time()
    solve = jax.jit(lambda sp: ipm.solve_single(sp, cfg))
    res = jax.block_until_ready(solve(spec))
    t1 = time.time()
    print(f"N={N} iters={int(res.iters)} status={int(res.status)} "
          f"err={float(res.err):.3e} mu={float(res.mu):.3e} "
          f"obj={float(res.obj):.6f} wall={t1-t0:.1f}s")
    X = np.asarray(res.X)
    U = np.asarray(res.U)
    print("x0 :", np.round(X[0], 4))
    print("xN :", np.round(X[-1], 4), " target:", np.asarray(spec.xF))
    print("U[:4]:", np.round(U[:4], 4).tolist())
    print("|v|max", np.abs(X[:, 3]).max(), " |delta|max", np.abs(U[:, 0]).max())
    # property check: geometric clearance along trajectory
    dmin = np.inf
    for k in range(0, N + 1, max(1, N // 20)):
        for m in range(spec.max_obs):
            d = geometry.ego_obstacle_distance(
                X[k], np.asarray(spec.ego_g), spec.obstacles.A[m],
                spec.obstacles.b[m], spec.obstacles.face_mask[m])
            dmin = min(dmin, d)
    print("min geometric clearance along traj:", round(dmin, 4),
          " (d_min =", float(spec.d_min), ")")


if __name__ == "__main__":
    main()
