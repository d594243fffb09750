"""Receding-horizon MPC driver (BASELINE config 5 smoke, SURVEY.md
§4.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import mpc
from obca_tpu.spec import SolverConfig, reverse_parking_spec
from obca_tpu.warmstart import geometric


def _converged_plan(spec):
    """Initial plan: (W, duals) — the full Ipopt-style warm start the
    MPC driver carries between re-solves."""
    import jax as _jax
    from obca_tpu.solver import ipm as _ipm

    W0 = geometric.lattice_warm_start(spec)
    res = _jax.jit(
        lambda sp: _ipm.solve_single(sp, SolverConfig(max_iter=200), W0)
    )(spec)
    assert int(res.status) == 0
    return res.W, res.duals


def test_mpc_closed_loop_progresses():
    spec = reverse_parking_spec(N=40, Ts=0.6)
    # Warm-started re-solves start from a small barrier (the previous
    # solution is near-optimal), converging in ~20 iterations.
    cfg = SolverConfig(max_iter=80, mu_init=jnp.asarray(1e-3))
    W0, duals0 = _converged_plan(spec)
    n_steps = 6
    res = jax.jit(
        lambda sp, w, d: mpc.run(sp, cfg, n_steps, W0=w, duals0=d)
    )(spec, W0, duals0)
    status = np.asarray(res.status)
    # warm-started re-solves converge quickly
    assert np.all(status == 0)
    # well under the cold-start cost (and the 80-iteration cap); a
    # re-solve crossing a cusp occasionally needs ~50
    assert np.asarray(res.iters).max() <= 60
    # the car moves toward the goal
    d0 = np.linalg.norm(np.asarray(spec.x0[:2] - spec.xF[:2]))
    dT = np.linalg.norm(np.asarray(res.states[-1][:2] - spec.xF[:2]))
    assert dT < d0


def test_mpc_fleet_rescued_initial():
    """run_fleet: batched rescued initial plans + vmapped closed loops;
    initial-plan status is surfaced per rollout (ADVICE r3 medium)."""
    import dataclasses

    spec = reverse_parking_spec(N=40, Ts=0.6)
    cfg = SolverConfig(max_iter=200, mu_init=jnp.asarray(1e-3))
    W0_1, _ = _converged_plan(spec)
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(spec, x0=spec.x0.at[0].add(s))
          for s in (0.0, 0.05)],
    )
    W0 = jnp.stack([W0_1, W0_1])
    res = jax.jit(
        lambda sp, w: mpc.run_fleet(sp, cfg, 2, w)
    )(specs, W0)
    assert np.all(np.asarray(res.status0) == 0)
    assert np.all(np.asarray(res.status) == 0)
    assert res.states.shape == (2, 3, 4)


def test_mpc_disturbance_rejection():
    """Small state disturbances are absorbed; solver stays converged."""
    spec = reverse_parking_spec(N=40, Ts=0.6)
    cfg = SolverConfig(max_iter=80, mu_init=jnp.asarray(1e-3))
    W0, duals0 = _converged_plan(spec)
    key = jax.random.PRNGKey(0)
    dist = 0.01 * jax.random.normal(key, (5, 4), dtype=jnp.float64)
    res = jax.jit(
        lambda sp, w, d, dd: mpc.run(sp, cfg, 5, W0=w, duals0=d,
                                     disturbance=dd)
    )(spec, W0, duals0, dist)
    assert np.all(np.asarray(res.status) == 0)
