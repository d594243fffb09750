"""Instrument one MPC shifted re-solve (the 10 Hz latency driver —
VERDICT r5 next #2): full solve -> plant step -> stage shift ->
debug_iterate at the resolve config, with and without the warm dual-LS
correction, to see WHERE the ~20 re-centering iterations go.

    python tools/dbg_mpc_shift.py [ls|nols|both]
"""
import dataclasses
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from obca_tpu import dynamics, mpc, nlp  # noqa: E402
from obca_tpu.solver import ipm  # noqa: E402
from obca_tpu.spec import f32_solver_config, reverse_parking_spec  # noqa
from obca_tpu.warmstart import geometric  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    spec = reverse_parking_spec(N=80, Ts=0.3, dtype=jnp.float32)
    L = nlp.layout_of(spec)
    cfg = f32_solver_config(max_iter=70)
    W0 = geometric.lattice_warm_start(spec, dtype=jnp.float32)
    res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
    print("initial plan:", int(res.status), int(res.iters),
          float(res.err), flush=True)

    # One exact plant step + the MPC shift (mirrors mpc.run's body).
    u0 = res.U[0]
    x1 = dynamics.step(spec.x0.astype(jnp.float32), u0, res.tau,
                       spec.Ts, spec.wheelbase)
    spec1 = dataclasses.replace(
        spec, x0=x1.astype(spec.x0.dtype),
        u_prev=u0.astype(spec.u_prev.dtype))
    W_shift = mpc.shift_plan(res.W, L).at[0, L.sl_x].set(x1)
    duals_shift = mpc.shift_dual_state(res.duals, L)

    variants = {
        "base": dict(mu_init=1e-5),
        "ls": dict(mu_init=1e-5, dual_ls_warm=True),
        "nols": dict(mu_init=1e-5, dual_ls_warm=False),
        # The r5 trace shows the ~27-iteration resolve is dominated by
        # garbage f32 directions at mu=1e-5 (GCR lin residuals 33-140
        # -> rejected steps + delta_w churn), not by the shift's dual
        # defect.  Candidate stabilizers:
        "dw4": dict(mu_init=1e-5, delta_w=1e-4),
        "df3": dict(mu_init=1e-5, delta_factor=1e-3),
        "mu4": dict(mu_init=1e-4),
        "mu4dw4": dict(mu_init=1e-4, delta_w=1e-4),
    }
    names = [mode] if mode in variants else (
        ["ls", "nols"] if mode == "both" else list(variants))
    for name in names:
        kw = dict(variants[name])
        leaf = {k: jnp.asarray(v, jnp.float32)
                for k, v in kw.items() if k != "dual_ls_warm"}
        static = {k: v for k, v in kw.items() if k == "dual_ls_warm"}
        cfg_warm = dataclasses.replace(
            cfg, tol=jnp.asarray(1e-3, jnp.float32),
            max_iter=60, strict_steps=True, **leaf, **static,
        )
        print(f"--- resolve {name}: {kw}", flush=True)
        st = ipm.debug_iterate(spec1, cfg_warm, W_shift, n_iter=40,
                               duals0=duals_shift)
        print(f"    -> iters {int(st.iters)} err {float(st.err):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
