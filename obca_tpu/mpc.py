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


def _cold_duals(spec: ProblemSpec, cfg: SolverConfig, W0):
    """Cold dual state for the first re-solve: the solver's own warm-
    start initialization (incl. the least-squares equality-multiplier
    estimate), evaluated once."""
    state0, _step, _L, _fc = ipm._make_step(spec, cfg, W0)
    return ipm.DualState(nu=state0.nu, s=state0.s, zL=state0.zL,
                         zU=state0.zU)


def run(spec: ProblemSpec, cfg: SolverConfig, n_steps: int,
        W0=None, duals0=None, disturbance=None):
    """Closed-loop MPC from spec.x0 for n_steps control periods.

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

    def mpc_step(carry, dist_k):
        x, W_prev, duals_prev, u_fallback = carry
        spec_k = dataclasses.replace(spec, x0=x.astype(spec.x0.dtype))
        # Re-anchor the shifted warm start's first state at the
        # measured state.
        W_ws = W_prev.at[0, L.sl_x].set(x)
        res = ipm.solve_single(spec_k, cfg, W_ws, duals0=duals_prev)
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
        return (x_next, W_next, duals_next, u_fb_next), (
            x_next, u0, res.status, res.iters, res.err
        )

    x0 = spec.x0.astype(dt)
    u_fb0 = W0[0, L.sl_u]
    if duals0 is None:
        duals0 = _cold_duals(spec, cfg, W0)
    duals0 = jax.tree.map(lambda a: a.astype(dt), duals0)
    (_, _, _, _), (xs, us, status, iters, err) = jax.lax.scan(
        mpc_step, (x0, W0, duals0, u_fb0), disturbance
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MpcResult(states=states, controls=us, status=status,
                     iters=iters, err=err)
