"""On-chip dynamic-knob sweep for the headline pipeline — NO recompile
per point: `SolverConfig`'s tolerances/barrier parameters are pytree
LEAVES, so passing the config as a jit *argument* (instead of closing
over it) lets every (mu_init, rescue_mu, tol, ...) combination reuse
one compiled executable.  Static fields (max_iter, ls_steps, dtype,
refine_iters, ruiz_iters) still recompile — sweep those with
tools/profile_solve.py instead.

    python tools/knob_sweep.py            # default mu_init sweep

Prints one JSON line per point: converged count, iters stats, wall,
and golden-parity gap.
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
    B = int(os.environ.get("BENCH_B", "128"))
    N = int(os.environ.get("BENCH_N", "80"))
    max_iter = int(os.environ.get("BENCH_ITERS", "70"))

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
    cfg0 = f32_solver_config(max_iter=max_iter)
    lcfg = lattice.LatticeConfig.for_spec(base)

    @jax.jit
    def pipeline(specs, base, cfg, rescue_mu):
        field = lattice.plan_field(base, lcfg)
        W0 = jax.vmap(
            lambda sp: geometric.lattice_warm_start(sp, dtype=dtype,
                                                    field=field)
        )(specs)
        return ipm.solve_batch_rescued(specs, cfg, W0,
                                       rescue_mu=rescue_mu)

    # golden parity check shares the executable across points too
    gold = np.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "oracle", "goldens", "reverse_parking_N80.npz"))
    gspec = reverse_parking_spec(N=int(gold["N"]), Ts=float(gold["Ts"]),
                                 dtype=dtype)
    gW0 = jnp.asarray(gold["W0"], dtype)[None]
    gspecs = jax.tree.map(lambda x: x[None], gspec)

    @jax.jit
    def parity(specs_, w0, cfg):
        return jax.vmap(
            lambda sp, w: ipm.solve_single(sp, cfg, w))(specs_, w0)

    points = json.loads(os.environ.get("KNOB_POINTS", "null")) or [
        {"mu_init": 0.1, "rescue_mu": 1e-5},
        {"mu_init": 0.05, "rescue_mu": 1e-5},
        {"mu_init": 0.02, "rescue_mu": 1e-5},
        {"mu_init": 0.01, "rescue_mu": 1e-5},
        {"mu_init": 0.02, "rescue_mu": 1e-6},
    ]

    first = True
    for pt in points:
        cfg = dataclasses.replace(
            cfg0,
            mu_init=jnp.asarray(pt.get("mu_init", 0.1), jnp.float32),
            tol=jnp.asarray(pt.get("tol", 1e-4), jnp.float32),
        )
        rmu = jnp.asarray(pt.get("rescue_mu", 1e-5), jnp.float32)
        res = jax.block_until_ready(pipeline(specs, base, cfg, rmu))
        if first:          # compile pass; re-run timed
            first = False
        t0 = time.perf_counter()
        res = jax.block_until_ready(pipeline(specs, base, cfg, rmu))
        wall = time.perf_counter() - t0
        gres = parity(gspecs, gW0, cfg)
        gap = float(np.abs(
            np.asarray(gres.U[0], np.float64) - gold["U"]).max())
        st = np.asarray(res.status)
        it = np.asarray(res.iters)
        print(json.dumps({
            **pt,
            "converged": int((st == 0).sum()),
            "wall_s": round(wall, 3),
            "solves_per_s": round(B / wall, 1),
            "iters_med": float(np.median(it)),
            "iters_max": int(it.max()),
            "parity_gap": gap,
        }), flush=True)


if __name__ == "__main__":
    main()
