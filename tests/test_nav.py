"""Point-mass navigation problem family (reference quadcopter-nav
example — SURVEY.md §2.2 C5): the generic IPM solves a second problem
module end-to-end and the solution is dynamically consistent and
collision-free."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu import nav
from obca_tpu.spec import SolverConfig


def _grazing_spec(N=30):
    # Obstacles offset from the straight start->goal line (the nav
    # default warm start is interpolation, as in the reference).
    verts = [
        [(-4.0, 0.5), (-2.0, 0.5), (-2.0, 5.0), (-4.0, 5.0)],
        [(2.0, -5.0), (4.0, -5.0), (4.0, -0.5), (2.0, -0.5)],
    ]
    return nav.nav_spec(N=N, vertex_lists=verts)


def test_nav_constraints_shape_and_masks():
    spec = _grazing_spec(N=10)
    L = nav.layout_of(spec)
    assert L.nw == 7 + spec.max_obs * spec.max_faces
    assert L.nc == 13 + 2 * spec.max_obs
    active, is_eq = nav.constraint_masks(L, spec)
    assert active.shape == (11, L.nc)
    # norm/dist rows are inequalities in the distance variant.
    assert float(is_eq[L.r_norm][0]) == 0.0
    assert float(is_eq[L.r_dist][0]) == 0.0
    assert float(is_eq[L.r_dyn][0]) == 1.0


def test_nav_rollout_matches_dynamics_rows():
    spec = _grazing_spec(N=8)
    L = nav.layout_of(spec)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.uniform(-0.5, 0.5, (L.N, 2)))
    X = nav.rollout(spec.x0, U, jnp.asarray(1.0), spec.Ts)
    W = jnp.zeros((L.N + 1, L.nw))
    W = W.at[:, L.sl_x].set(X)
    W = W.at[: L.N, L.sl_u].set(U)
    W = W.at[:, L.i_tau].set(1.0)
    c = nav.all_constraints(L, W, spec)
    active, _ = nav.constraint_masks(L, spec)
    # dynamics + tau rows vanish on a rolled-out trajectory.
    assert float(jnp.max(jnp.abs(c[:, L.r_dyn] * active[:, L.r_dyn]))) < 1e-12
    tl = L.i_taulink
    assert float(jnp.max(jnp.abs(c[:, tl] * active[:, tl]))) < 1e-12


def test_nav_end_to_end_collision_free():
    # N*Ts = 10 s: dynamically feasible for the 16 m transfer under
    # vmax = 3, |a| <= 1 (7.5 s is not -- bang-bang needs ~8.7 s).
    spec = _grazing_spec(N=40)
    res = nav.solve(spec, SolverConfig(max_iter=150))
    assert int(res.status) == 0, (res.status, res.err)
    # Boundary conditions.
    np.testing.assert_allclose(np.asarray(res.X[0]), np.asarray(spec.x0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.X[-1]), np.asarray(spec.xF),
                               atol=1e-5)
    # Geometric audit: no trajectory point inside any obstacle (the
    # dual certificate must correspond to true separation).
    P = np.asarray(res.X[:, :2])
    A = np.asarray(spec.obstacles.A)
    b = np.asarray(spec.obstacles.b)
    om = np.asarray(spec.obstacles.obs_mask)
    for p in P:
        for m in range(A.shape[0]):
            if om[m] < 1.0:
                continue
            margin = np.max(A[m] @ p - b[m])
            assert margin >= float(spec.d_min) - 1e-4, (p, m, margin)


def test_nav_batch_vmap():
    spec = _grazing_spec(N=48)  # N*Ts = 12 s: feasible with margin
    import dataclasses

    from obca_tpu.solver import ipm

    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(spec, x0=spec.x0.at[1].add(dy))
          for dy in (-0.4, -0.2, 0.2)],
    )
    res = ipm.solve_batch(specs, SolverConfig(max_iter=150), prob=nav)
    assert res.U.shape == (3, 48, 2)
    assert int((np.asarray(res.status) == 0).sum()) == 3
