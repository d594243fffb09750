"""CPU experiment: parallel-parking f32 parity vs the f64 golden under
candidate Ruiz variants (VERDICT r5 next #1 — the r4 single-apply
rewrite moved the f32 basin: 2e-6 -> 1.3e-2 CPU, 0.154 on-chip).

Runs each config in-process on the CPU backend and prints the control
parity gap.  Usage:

    python tools/dbg_parallel_parity.py [config ...]

configs: base pow2 pow2_m10 mixed freetime_base freetime_pow2
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from obca_tpu.solver import ipm  # noqa: E402
from obca_tpu.spec import (f32_solver_config, mixed_solver_config,  # noqa
                           parallel_fastpath_config,
                           parallel_parking_spec, reverse_parking_spec)


def run(name):
    free = name.startswith("freetime")
    golden = ("reverse_parking_freetime_N80" if free
              else "parallel_parking_N80")
    g = np.load(os.path.join(REPO, "oracle", "goldens",
                             f"{golden}.npz"))
    N, Ts = int(g["N"]), float(g["Ts"])
    if name == "base":
        cfg = parallel_fastpath_config()
    elif name == "pow2":
        cfg = parallel_fastpath_config(ruiz_pow2=True)
    elif name == "pow2_m10":
        cfg = parallel_fastpath_config(ruiz_pow2=True, refine_iters=10)
    elif name == "iter_r3":
        # The exact r3 configuration: iterative Ruiz apply, m=10,
        # 3 sweeps (r3 measured 2e-6 on this family).
        cfg = parallel_fastpath_config(refine_iters=10, ruiz_iters=3,
                                       ruiz_single_apply=False)
    elif name == "iter":
        cfg = parallel_fastpath_config(ruiz_single_apply=False)
    elif name == "r3_full":
        # Everything r4 changed on the solve path, reverted at once:
        # iterative Ruiz, m=10, 3 sweeps, 12-point line search.
        cfg = parallel_fastpath_config(refine_iters=10, ruiz_iters=3,
                                       ruiz_single_apply=False,
                                       ls_steps=12)
    elif name == "ls12":
        cfg = parallel_fastpath_config(ls_steps=12)
    elif name == "slow":
        cfg = parallel_fastpath_config(mu_kappa=jnp.asarray(0.5))
    elif name == "mixed_m16":
        cfg = mixed_solver_config(max_iter=300, refine_iters=16,
                                  ruiz_iters=4)
    elif name == "mixed":
        cfg = mixed_solver_config(max_iter=250)
    elif name == "freetime_base":
        cfg = f32_solver_config(max_iter=250)
    elif name == "freetime_pow2":
        cfg = f32_solver_config(max_iter=250, ruiz_pow2=True)
    else:
        raise ValueError(name)
    if free:
        spec = reverse_parking_spec(N=N, Ts=Ts, fix_time=False,
                                    dtype=cfg.dtype)
    else:
        spec = parallel_parking_spec(N=N, Ts=Ts, dtype=cfg.dtype)
    W0 = jnp.asarray(g["W0"]).astype(cfg.dtype)
    solve = ipm.solve_free_time if free else ipm.solve_single
    t0 = time.perf_counter()
    res = jax.block_until_ready(
        jax.jit(lambda sp: solve(sp, cfg, W0))(spec))
    wall = time.perf_counter() - t0
    gap = float(np.abs(np.asarray(res.U, np.float64) - g["U"]).max())
    print(f"{name:14s} status={int(res.status)} "
          f"iters={int(res.iters)} gap={gap:.3e} wall={wall:.0f}s",
          flush=True)


def run_pin(mu0):
    """Basin-pinning experiment: both the f64 oracle and the f32 fast
    path start the barrier at mu_init=mu0 from the golden W0 (the
    Ipopt warm-start-mode move: warm_start_init_point=yes +
    mu_init lowered).  Prints the f32-vs-f64 gap directly — if the
    lowered barrier start pins both paths into the same basin, this is
    the canonical parallel-family configuration and the golden gets
    re-recorded with it."""
    from obca_tpu.spec import SolverConfig

    g = np.load(os.path.join(REPO, "oracle", "goldens",
                             "parallel_parking_N80.npz"))
    N, Ts = int(g["N"]), float(g["Ts"])
    mu0j = jnp.asarray(mu0)

    cfg64 = SolverConfig(max_iter=300, mu_init=mu0j)
    spec64 = parallel_parking_spec(N=N, Ts=Ts, dtype=cfg64.dtype)
    W0 = jnp.asarray(g["W0"])
    t0 = time.perf_counter()
    r64 = jax.block_until_ready(
        jax.jit(lambda sp: ipm.solve_single(sp, cfg64, W0))(spec64))
    print(f"pin mu0={mu0:g} f64: status={int(r64.status)} "
          f"iters={int(r64.iters)} "
          f"gap_vs_stored_golden="
          f"{float(np.abs(np.asarray(r64.U) - g['U']).max()):.3e} "
          f"wall={time.perf_counter()-t0:.0f}s", flush=True)

    for label, cfg in [
        ("f32", parallel_fastpath_config(
            mu_init=jnp.asarray(mu0, jnp.float32))),
        ("mixed", mixed_solver_config(max_iter=300, refine_iters=16,
                                      ruiz_iters=4, mu_init=mu0j)),
    ]:
        spec = parallel_parking_spec(N=N, Ts=Ts, dtype=cfg.dtype)
        t0 = time.perf_counter()
        r = jax.block_until_ready(
            jax.jit(lambda sp: ipm.solve_single(
                sp, cfg, W0.astype(cfg.dtype)))(spec))
        gap = float(np.abs(np.asarray(r.U, np.float64)
                           - np.asarray(r64.U, np.float64)).max())
        print(f"pin mu0={mu0:g} {label}: status={int(r.status)} "
              f"iters={int(r.iters)} gap_vs_f64={gap:.3e} "
              f"wall={time.perf_counter()-t0:.0f}s", flush=True)


def main():
    names = sys.argv[1:] or ["base", "pow2", "mixed"]
    for n in names:
        if n.startswith("pin:"):
            run_pin(float(n.split(":")[1]))
        else:
            run(n)


if __name__ == "__main__":
    main()
