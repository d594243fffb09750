"""IPM solver tests (SURVEY.md §4.3, §4.6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import dynamics, geometry, nlp
from obca_tpu.solver import ipm
from obca_tpu.spec import SolverConfig, reverse_parking_spec


def _easy_spec(N=12, signed=True, fix_time=True):
    """Forward-driving scenario whose interpolated warm start is
    non-singular (v > 0 along the path) — obstacles present but far."""
    spec = reverse_parking_spec(N=N, Ts=20.0 / N, signed=signed,
                                fix_time=fix_time)
    return dataclasses.replace(
        spec,
        x0=jnp.asarray([-8.0, 7.0, 0.0, 0.5]),
        xF=jnp.asarray([8.0, 8.0, 0.0, 0.5]),
    )


def test_ipm_converges_easy_scenario():
    spec = _easy_spec()
    cfg = SolverConfig(max_iter=250)
    res = jax.jit(lambda s: ipm.solve_single(s, cfg))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED
    assert float(res.err) < 1e-6

    X = np.asarray(res.X)
    U = np.asarray(res.U)
    # Boundary conditions hit exactly (equality-constrained).
    np.testing.assert_allclose(X[0], np.asarray(spec.x0), atol=1e-6)
    np.testing.assert_allclose(X[-1], np.asarray(spec.xF), atol=1e-6)

    # Dynamic consistency: re-rollout of U reproduces X (SURVEY.md §4.6).
    Xr = dynamics.rollout(jnp.asarray(X[0]), jnp.asarray(U),
                          res.tau, spec.Ts, spec.wheelbase)
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-5)

    # Bounds respected.
    assert np.all(np.abs(U[:, 0]) <= 0.6 + 1e-8)
    assert np.all(np.abs(U[:, 1]) <= 0.4 + 1e-8)

    # Collision-free (geometric check, independent of the duals).
    for k in range(0, spec.N + 1, 3):
        for m in range(spec.max_obs):
            d = geometry.ego_obstacle_distance(
                X[k], np.asarray(spec.ego_g), spec.obstacles.A[m],
                spec.obstacles.b[m], spec.obstacles.face_mask[m])
            assert d >= float(spec.d_min) - 1e-6


def test_ipm_distance_variant_converges():
    spec = _easy_spec(signed=False)
    cfg = SolverConfig(max_iter=250)
    res = jax.jit(lambda s: ipm.solve_single(s, cfg))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED


def test_ipm_batch_vmap():
    """Batched solves: three slightly different instances, all converge,
    and each matches its own single solve to solver tolerance (the
    iteration paths differ numerically under vmap, the optimum does
    not)."""
    cfg = SolverConfig(max_iter=250)
    base = _easy_spec()
    shifts = jnp.asarray([-0.5, 0.0, 0.5])
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(base, x0=base.x0.at[1].add(s))
          for s in shifts],
    )
    res = jax.jit(lambda ss: ipm.solve_batch(ss, cfg))(specs)
    assert np.all(np.asarray(res.status) == ipm.STATUS_CONVERGED)
    single = jax.jit(lambda s: ipm.solve_single(s, cfg))(
        dataclasses.replace(base, x0=base.x0.at[1].add(-0.5))
    )
    np.testing.assert_allclose(
        np.asarray(res.U[0]), np.asarray(single.U), atol=1e-3
    )
