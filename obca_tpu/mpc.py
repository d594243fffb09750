"""Receding-horizon MPC driver (BASELINE config 5: 10 Hz replanning).

The reference has no MPC loop (solves are one-shot scripts); this is
the new framework's real-time execution layer (SURVEY.md §3.4 'MPC
entry'): at each control period the OCP is re-solved from the measured
state, warm-started by *shifting* the previous solution one stage
(primal and dual), and the first control is applied.  On solver failure
the previous solution's next control is used as a fallback (SURVEY.md
§5 failure detection — stateless degradation, no crash).

The whole closed loop is a `lax.scan`, so an entire MPC rollout — and,
vmapped, thousands of scenario rollouts — compiles to a single XLA
program.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from obca_tpu import dynamics, nlp
from obca_tpu.solver import ipm
from obca_tpu.spec import ProblemSpec, SolverConfig


class MpcResult(NamedTuple):
    states: jax.Array      # [T+1, 4] closed-loop states
    controls: jax.Array    # [T, 2] applied controls
    status: jax.Array      # [T] solver status per step
    iters: jax.Array       # [T]
    err: jax.Array         # [T]


def shift_warm_start(L, W, spec):
    """Shift a solved trajectory one stage for the next solve's warm
    start: stage k <- k+1, last stage duplicated (the classic MPC
    shift, including the OBCA duals — the reference's DualMultWS role
    is inherited from the previous solution)."""
    W_s = jnp.concatenate([W[1:], W[-1:]], axis=0)
    return W_s


def run(spec: ProblemSpec, cfg: SolverConfig, n_steps: int,
        W0=None, duals0=None, disturbance=None,
        resolve_mu: float = 1e-4, resolve_max_iter: int = 60):
    """Closed-loop MPC from spec.x0 for n_steps control periods.

    The *initial* plan solves with the caller's full barrier schedule;
    every subsequent 10 Hz re-solve starts from the shifted previous
    solution (primal + duals) at the near-final barrier ``resolve_mu``
    with the tight cap ``resolve_max_iter`` — the shifted plan is
    near-optimal for the one-step-advanced problem, so restarting the
    barrier at mu_init = 0.1 (the r3 failure: 572 ms/step, 73% step
    convergence) wastes ~40 iterations per step re-deriving what the
    previous solve already knew.

    W0/duals0: warm start; pass the previous plan's `SolveResult.W` and
    `SolveResult.duals` when available (full Ipopt-style dual warm
    start) — cold duals are derived from W0 otherwise.
    disturbance: optional [n_steps, 4] additive state perturbations
    (applied after the plant step — simulates model mismatch).
    """
    L = nlp.layout_of(spec)
    if W0 is None:
        from obca_tpu.warmstart import geometric

        W0 = geometric.lattice_warm_start(spec)
    dt = cfg.dtype
    W0 = W0.astype(dt)

    if disturbance is None:
        disturbance = jnp.zeros((n_steps, 4), dt)

    cfg_warm = dataclasses.replace(
        cfg, mu_init=jnp.asarray(resolve_mu, jnp.float32).astype(
            cfg.mu_init.dtype),
        max_iter=resolve_max_iter,
    )

    # Initial plan: full barrier from the caller's warm start.
    res0 = ipm.solve_single(spec, cfg, W0, duals0=duals0)
    ok0 = res0.status == ipm.STATUS_CONVERGED
    W_plan = jnp.where(ok0, res0.W, W0)

    def mpc_step(carry, dist_k):
        x, u_prev, W_prev, duals_prev, u_fallback = carry
        # u_prev is the control applied in the previous period — the
        # stage-0 input-rate rows must reference it, not the original
        # spec.u_prev (keeping the stale value made the shifted warm
        # start rate-infeasible after every step: the r3 MPC bench's
        # 20% step-failure tail).
        spec_k = dataclasses.replace(
            spec, x0=x.astype(spec.x0.dtype),
            u_prev=u_prev.astype(spec.u_prev.dtype),
        )
        # Re-anchor the shifted warm start's first state at the
        # measured state.
        W_ws = W_prev.at[0, L.sl_x].set(x)
        res = ipm.solve_single(spec_k, cfg_warm, W_ws,
                               duals0=duals_prev)
        ok = res.status == ipm.STATUS_CONVERGED
        u0 = jnp.where(ok, res.U[0], u_fallback)
        # plant step (same model; disturbance models mismatch)
        x_next = dynamics.step(
            x, u0, res.tau, spec.Ts, spec.wheelbase
        ) + dist_k

        def shift(arr):
            return jnp.concatenate([arr[1:], arr[-1:]], axis=0)

        W_next = jnp.where(ok, shift_warm_start(L, res.W, spec), W_prev)
        duals_next = jax.tree.map(
            lambda new, old: jnp.where(ok, shift(new), old),
            res.duals, duals_prev,
        )
        u_fb_next = jnp.where(ok, res.U[1], u_fallback)
        return (x_next, u0, W_next, duals_next, u_fb_next), (
            x_next, u0, res.status, res.iters, res.err
        )

    x0 = spec.x0.astype(dt)
    u_fb0 = W_plan[0, L.sl_u]
    duals_init = jax.tree.map(lambda a: a.astype(dt), res0.duals)
    (_, _, _, _, _), (xs, us, status, iters, err) = jax.lax.scan(
        mpc_step, (x0, spec.u_prev.astype(dt), W_plan, duals_init,
                   u_fb0), disturbance
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MpcResult(states=states, controls=us, status=status,
                     iters=iters, err=err)
