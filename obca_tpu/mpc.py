"""Receding-horizon MPC driver (BASELINE config 5: 10 Hz replanning).

The reference has no MPC loop (solves are one-shot scripts); this is
the new framework's real-time execution layer (SURVEY.md §3.4 'MPC
entry'): at each control period the OCP is re-solved from the measured
state, warm-started by *shifting* the previous solution one stage
(primal and dual), and the first control is applied.  On solver failure
the loop degrades statelessly (SURVEY.md §5 failure detection — no
crash): the *stale plan's* control for the current period is applied
and the stale plan keeps being shifted so it stays time-aligned.  The
r3 design kept the un-shifted stale plan and replayed one frozen
fallback control forever, so a single failed re-solve drove the state
off every plan and the failure became sticky — the recorded 28%
step-failure tail (`bench/out/mpc_n80.json`, r3).

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
    status0: jax.Array     # [] initial full-barrier plan status
    iters0: jax.Array      # [] initial plan iterations


def shift_plan(W, L):
    """Shift a trajectory one stage for the next solve's warm start:
    stage k <- k+1, last stage duplicated (the classic MPC shift).
    The duplicated tail keeps the dummy u = 0 control: the plan ends
    parked (v = 0 at the goal), and f(goal, 0) = goal, so the new
    stage N-1 dynamics row is satisfied exactly — keeping the last
    real (braking) control instead left a measured 0.12 dynamics
    residual from applying it at the parked state."""
    return jnp.concatenate([W[1:], W[-1:]], axis=0)


def _shift_rows(a):
    """new[k] = old[k+1] for generic stages; new N-1 duplicates old
    N-1 (generic mask), the terminal stage keeps old N."""
    return jnp.concatenate([a[1:-1], a[-2:-1], a[-1:]], axis=0)


def shift_dual_state(d: ipm.DualState, L) -> ipm.DualState:
    """Mask-aware stage shift of the full dual state.

    Stages 0..N-1 share the generic constraint mask; stages 0 and N
    additionally carry boundary-condition equality rows, and stage N's
    control/rate rows are pinned (slack 1.0, duals 0).  The naive
    whole-row shift breaks at BOTH mask boundaries, measured on the
    N=80 re-solve warm start (r4):

      * tail: stage N's pinned rate rows landed on active stage N-1 —
        slack 1.0 against a 0.18 rate bound, a 0.82 primal residual;
      * front: the new stage 0 took old stage 1's MASKED (zero)
        boundary-condition multipliers — a 2.3 dual-stationarity
        residual on the heading column.

    Together these forced every 10 Hz re-solve into ~25 re-centering
    iterations from a warm start that should need ~10.  Generic rows
    shift; the bc multipliers stay (multiplier continuity: the
    anchored state moves one step, its multiplier varies smoothly);
    The duplicated tail stage keeps old stage N-1's generic-row
    multipliers: together with the kept terminal bc multiplier this
    preserves the x_N stationarity sum exactly (pasting the terminal
    shadow price onto the new dynamics row instead double-counts it —
    measured: a pi-sized dual residual on the terminal heading).  The
    remaining warm-start defect is a ~1 localized u-column residual at
    the tail (old approach-phase dynamics multipliers against the
    parked-stage control Jacobian), which Newton clears locally."""
    nu = _shift_rows(d.nu)
    nu = nu.at[0, L.r_bc].set(d.nu[0, L.r_bc])
    return ipm.DualState(nu=nu, s=_shift_rows(d.s),
                         zL=_shift_rows(d.zL), zU=_shift_rows(d.zU))


def run(spec: ProblemSpec, cfg: SolverConfig, n_steps: int,
        W0=None, duals0=None, disturbance=None,
        resolve_mu: float = 1e-4, resolve_max_iter: int = 60,
        resolve_tol: float | None = None,
        resolve_delta_w: float = 1e-4,
        res0: ipm.SolveResult | None = None):
    """Closed-loop MPC from spec.x0 for n_steps control periods.

    The *initial* plan solves with the caller's full barrier schedule
    (or is taken from ``res0`` — fleet drivers precompute it with the
    batched rescue pass, see :func:`run_fleet`); every subsequent 10 Hz
    re-solve starts from the shifted previous solution (primal + duals)
    at the near-final barrier ``resolve_mu`` with the cap
    ``resolve_max_iter``.  The shifted plan is near-optimal for the
    one-step-advanced problem — with an exact plant model most
    re-solves are 10-25 centering iterations at mu restarting from
    1e-5 (within the f32 convergence window ``mu <= 10 mu_min``), not
    at mu_init = 0.1 (the r3 failure: 572 ms/step re-deriving what the
    previous solve already knew).  Cusp-crossing steps (the gear
    switch changes the active rate/obstacle set) measurably need
    ~40 iterations, so the cap stays at 60: the convergence-gated
    while_loop exits early on easy steps, so the cap bounds only the
    worst step, not the average latency.

    W0/duals0: warm start for the initial plan.  If the initial plan
    fails, the loop starts from ``W0`` with the solver's *cold* dual
    initialization (a failed solve's duals paired with W0 is an
    inconsistent primal/dual pair — ADVICE r3); its status is surfaced
    as ``MpcResult.status0``.
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
        # Warm re-solves near the barrier floor reject steps that pass
        # no acceptance test (see SolverConfig.strict_steps).
        strict_steps=True,
        # Measured r5 (tools/dbg_mpc_shift.py): the ~26-iteration
        # re-solve tax was NOT the shift's dual defect (a guarded
        # equality-multiplier LS correction changed nothing) but
        # ill-conditioned f32 KKT systems right after the shift —
        # GCR residuals of 33-140 producing rejected garbage
        # directions and delta_w churn through ~10 iterations.  Two
        # leaf knobs fix it: start the re-solve barrier one decade
        # higher (mu 1e-4, still within 2 barrier stages of the
        # convergence window) and start the inertia regularization at
        # delta_w = 1e-4 instead of the cold 1e-8 (it decays on
        # healthy steps within ~6 iterations).  26 -> 12 iterations
        # on the instrumented shifted re-solve.
        delta_w=jnp.asarray(resolve_delta_w, jnp.float32).astype(
            cfg.delta_w.dtype),
    )
    if resolve_tol is not None:
        # Re-solve accuracy is a control-grade knob: the plan is
        # re-solved every period, so a slightly looser per-step tol
        # trades nothing observable for iterations.  A pytree leaf —
        # no recompile.
        cfg_warm = dataclasses.replace(
            cfg_warm, tol=jnp.asarray(resolve_tol, jnp.float32).astype(
                cfg.tol.dtype))

    # Initial plan: full barrier from the caller's warm start (unless
    # the fleet driver already solved it, rescue pass included).
    if res0 is None:
        res0 = ipm.solve_single(spec, cfg, W0, duals0=duals0)
    ok0 = res0.status == ipm.STATUS_CONVERGED
    W_plan = jnp.where(ok0, res0.W.astype(dt), W0)
    cold = ipm.cold_dual_state(spec, cfg, W0)
    duals_init = jax.tree.map(
        lambda a, b: jnp.where(ok0, a.astype(dt), b.astype(dt)),
        res0.duals, cold,
    )

    def mpc_step(carry, dist_k):
        x, u_prev, W_prev, duals_prev = carry
        # u_prev is the control applied in the previous period — the
        # stage-0 input-rate rows must reference it, not the original
        # spec.u_prev (keeping the stale value made the shifted warm
        # start rate-infeasible after every step: part of the r3 MPC
        # bench's step-failure tail).
        spec_k = dataclasses.replace(
            spec, x0=x.astype(spec.x0.dtype),
            u_prev=u_prev.astype(spec.u_prev.dtype),
        )
        # Re-anchor the shifted warm start's first state at the
        # measured state.
        W_ws = W_prev.at[0, L.sl_x].set(x)
        # (A barrier-escalating retry after a failed period was
        # measured and REJECTED r5: restarting the next re-solve at
        # mu = 1e-2 from the stale shifted plan needs ~5 barrier
        # stages to re-enter the convergence window, usually exceeds
        # the cap, and turns one stale period into a cascade —
        # single-rollout step convergence 0.967 -> 0.633.)
        res = ipm.solve_single(spec_k, cfg_warm, W_ws,
                               duals0=duals_prev)
        ok = res.status == ipm.STATUS_CONVERGED
        # Failure fallback: the stale plan's control for *this* period
        # (stage 0 of the time-aligned previous plan).
        u0 = jnp.where(ok, res.U[0], W_prev[0, L.sl_u])
        # plant step (same model; disturbance models mismatch)
        x_next = dynamics.step(
            x, u0, res.tau, spec.Ts, spec.wheelbase
        ) + dist_k

        # Shift whichever plan was executed — the fresh solution when
        # the re-solve converged, the stale plan otherwise — so the
        # carried plan always has stage 0 == next control period.
        W_next = shift_plan(jnp.where(ok, res.W, W_prev), L)
        duals_exec = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old),
            res.duals, duals_prev,
        )
        duals_next = shift_dual_state(duals_exec, L)
        return (x_next, u0, W_next, duals_next), (
            x_next, u0, res.status, res.iters, res.err
        )

    x0 = spec.x0.astype(dt)
    (_, _, _, _), (xs, us, status, iters, err) = jax.lax.scan(
        mpc_step, (x0, spec.u_prev.astype(dt), W_plan, duals_init),
        disturbance,
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MpcResult(states=states, controls=us, status=status,
                     iters=iters, err=err, status0=res0.status,
                     iters0=res0.iters)


def run_fleet(specs: ProblemSpec, cfg: SolverConfig, n_steps: int,
              W0, disturbance=None, resolve_mu: float = 1e-4,
              resolve_max_iter: int = 60,
              resolve_tol: float | None = None):
    """Fleet MPC: batched rescued initial plans + vmapped closed loops.

    The initial full-barrier solves run through
    :func:`ipm.solve_batch_rescued`, so the ~8% of randomized starts
    whose lattice warm start lands in a bad dual basin (the r3 MPC
    bench: those rollouts never produced a plan and failed all 30
    steps) get the neighbor-seeded second chance before any closed
    loop starts.  W0: [B, N+1, nw] stacked warm starts.
    """
    res0 = ipm.solve_batch_rescued(specs, cfg, W0)
    kw = dict(resolve_mu=resolve_mu, resolve_max_iter=resolve_max_iter,
              resolve_tol=resolve_tol)
    if disturbance is None:
        return jax.vmap(
            lambda sp, w, r0: run(sp, cfg, n_steps, W0=w, res0=r0,
                                  **kw)
        )(specs, W0, res0)
    return jax.vmap(
        lambda sp, w, r0, d: run(sp, cfg, n_steps, W0=w, res0=r0,
                                 disturbance=d, **kw)
    )(specs, W0, res0, disturbance)
