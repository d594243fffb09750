"""Generate float64 oracle golden files for the canonical scenarios.

Writes `oracle/goldens/<name>.npz` with the solved trajectory, controls,
duals, and problem constants — the parity reference for the TPU fast
path (BASELINE.md: max |u - u_oracle| < 1e-3).

Run: python oracle/gen_goldens.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def scenarios():
    """(name, spec, cfg_overrides) triples.  The parallel family's
    canonical configuration pins the barrier start at mu_init = 1e-3
    (warm-start basin pinning — see spec.parallel_fastpath_config:
    this family has several near-optimal attractors and a 0.1 barrier
    start makes basin selection an fp coin flip; the oracle and the
    TPU fast path must share the pin for parity to be meaningful)."""
    from obca_tpu.spec import parallel_parking_spec, reverse_parking_spec

    yield "reverse_parking_N40", reverse_parking_spec(N=40, Ts=0.6), {}
    yield "reverse_parking_dist_N40", reverse_parking_spec(
        N=40, Ts=0.6, signed=False
    ), {}
    yield "reverse_parking_N80", reverse_parking_spec(N=80, Ts=0.3), {}
    yield "reverse_parking_dist_N80", reverse_parking_spec(
        N=80, Ts=0.3, signed=False
    ), {}
    yield "parallel_parking_N80", parallel_parking_spec(N=80, Ts=0.3), {
        "mu_init": 1e-3,
    }
    # The reference's headline free-time mode (fixTime=0): solved by the
    # fixed-then-free homotopy (ipm.solve_free_time).
    yield "reverse_parking_freetime_N80", reverse_parking_spec(
        N=80, Ts=0.3, fix_time=False
    ), {}


def main():
    from obca_tpu import nlp
    from obca_tpu.solver import ipm
    from obca_tpu.spec import SolverConfig
    from obca_tpu.warmstart import geometric

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
    os.makedirs(outdir, exist_ok=True)
    import dataclasses
    import jax.numpy as jnp

    only = set(sys.argv[1:])        # optional: regenerate a subset
    for name, spec, over in scenarios():
        if only and name not in only:
            continue
        cfg = SolverConfig(max_iter=300)
        if over:
            cfg = dataclasses.replace(
                cfg, **{k: jnp.asarray(v) for k, v in over.items()})
        W0 = geometric.lattice_warm_start(spec)
        if spec.fix_time:
            res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
        else:
            res = jax.jit(
                lambda sp: ipm.solve_free_time(sp, cfg, W0)
            )(spec)
        status = int(res.status)
        print(f"{name}: status={status} iters={int(res.iters)} "
              f"err={float(res.err):.2e} obj={float(res.obj):.6f}")
        if status != ipm.STATUS_CONVERGED:
            print(f"  !! skipping golden for unconverged {name}")
            continue
        L = nlp.layout_of(spec)
        np.savez(
            os.path.join(outdir, f"{name}.npz"),
            X=np.asarray(res.X), U=np.asarray(res.U),
            W=np.asarray(res.W), nu=np.asarray(res.nu),
            obj=float(res.obj), err=float(res.err),
            N=spec.N, Ts=float(spec.Ts),
            x0=np.asarray(spec.x0), xF=np.asarray(spec.xF),
            obstacle_A=np.asarray(spec.obstacles.A),
            obstacle_b=np.asarray(spec.obstacles.b),
            ego_g=np.asarray(spec.ego_g),
            d_min=float(spec.d_min),
            signed=int(spec.signed),
            fix_time=int(spec.fix_time),
            tau=float(res.tau),
            W0=np.asarray(W0),
        )
        print(f"  wrote {name}.npz")


if __name__ == "__main__":
    main()
