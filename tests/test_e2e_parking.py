"""End-to-end integration: full warm-start pipeline + IPM on the
canonical reverse-parking scenario (SURVEY.md §4.5, BASELINE config 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import dynamics, geometry
from obca_tpu.solver import ipm
from obca_tpu.spec import SolverConfig, reverse_parking_spec
from obca_tpu.warmstart import geometric


def test_reverse_parking_end_to_end():
    spec = reverse_parking_spec(N=40, Ts=0.6)
    cfg = SolverConfig(max_iter=200)
    f = jax.jit(
        lambda sp: ipm.solve_single(sp, cfg,
                                    geometric.lattice_warm_start(sp))
    )
    res = f(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED
    assert float(res.err) < 1e-6

    X = np.asarray(res.X)
    U = np.asarray(res.U)
    # Exact boundary conditions.
    np.testing.assert_allclose(X[0], np.asarray(spec.x0), atol=1e-8)
    np.testing.assert_allclose(X[-1], np.asarray(spec.xF), atol=1e-8)
    # Dynamic consistency (SURVEY.md §4.6).
    Xr = dynamics.rollout(jnp.asarray(X[0]), jnp.asarray(U), res.tau,
                          spec.Ts, spec.wheelbase)
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-6)
    # Collision-free with the d_min margin (geometric ground truth,
    # independent of the solver's dual certificates).
    dmin = min(
        geometry.ego_obstacle_distance(
            X[k], np.asarray(spec.ego_g), spec.obstacles.A[m],
            spec.obstacles.b[m], spec.obstacles.face_mask[m])
        for k in range(0, spec.N + 1) for m in range(3)
    )
    assert dmin >= float(spec.d_min) - 1e-6
    # Input bounds.
    assert np.abs(U[:, 0]).max() <= 0.6 + 1e-8
    assert np.abs(U[:, 1]).max() <= 0.4 + 1e-8
    # The maneuver must actually reverse into the slot.
    assert X[:, 3].min() < -0.05


def test_lattice_warm_start_collision_free():
    """The planner's warm start itself is collision-free for the
    reverse scenario (the solver is then a local polish)."""
    spec = reverse_parking_spec(N=40, Ts=0.6)
    from obca_tpu import nlp
    L = nlp.layout_of(spec)
    W0 = geometric.lattice_warm_start(spec)
    X = np.asarray(W0[:, L.sl_x])
    dmin = min(
        geometry.ego_obstacle_distance(
            X[k], np.asarray(spec.ego_g), spec.obstacles.A[m],
            spec.obstacles.b[m], spec.obstacles.face_mask[m])
        for k in range(0, spec.N + 1) for m in range(3)
    )
    assert dmin >= 0.0
    np.testing.assert_allclose(X[-1, :3], np.asarray(spec.xF)[:3],
                               atol=1e-6)
