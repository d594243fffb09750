"""Warm-start pipeline tests: Reeds-Shepp words, velocity smoothing,
dual warm start (SURVEY.md §4.2: 'Reeds-Shepp word lengths vs exhaustive
numeric shooting' — here vs closed-form endpoint integration)."""

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import nlp, obca
from obca_tpu.spec import reverse_parking_spec
from obca_tpu.warmstart import dual_ws, geometric, rs_path, velosmooth


def test_rs_known_lengths():
    solve = jax.jit(rs_path.solve)
    o = jnp.zeros(3)
    cases = [
        ([5.0, 0.0, 0.0], 5.0),            # straight
        ([-5.0, 0.0, 0.0], 5.0),           # straight reverse
        ([1.0, 1.0, np.pi / 2], np.pi / 2),  # quarter arc
        ([0.0, 0.0, np.pi], np.pi),        # in-place U turn
    ]
    for goal, expect in cases:
        _, _, tot = solve(o, jnp.asarray(goal), 1.0)
        np.testing.assert_allclose(float(tot), expect, atol=1e-9)


def test_rs_random_coverage_and_endpoints():
    rng = np.random.default_rng(0)
    n = 300
    S = np.zeros((n, 3))
    G = np.column_stack([
        rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
        rng.uniform(-np.pi, np.pi, n),
    ])
    solveb = jax.jit(jax.vmap(rs_path.solve, in_axes=(0, 0, None)))
    T, Lm, Tot = solveb(jnp.asarray(S), jnp.asarray(G), 1.0)
    Tot_np = np.asarray(Tot)
    # A valid word must exist for every configuration.
    assert np.all(np.isfinite(Tot_np))
    # Sampling at the total arclength must land exactly on the goal.
    samp = jax.jit(jax.vmap(
        lambda s, ty, ln, tot:
        rs_path.sample(s, 1.0, ty, ln, jnp.array([tot]))[0][0]
    ))
    P = np.asarray(samp(jnp.asarray(S), T, Lm, Tot))
    ang = np.arctan2(np.sin(P[:, 2] - G[:, 2]), np.cos(P[:, 2] - G[:, 2]))
    err = np.abs(P[:, 0] - G[:, 0]) + np.abs(P[:, 1] - G[:, 1]) + np.abs(ang)
    assert err.max() < 1e-9
    # Total length lower-bounded by the euclidean distance.
    eu = np.linalg.norm(G[:, :2], axis=1)
    assert np.all(Tot_np >= eu - 1e-9)


def test_rs_scaling_with_radius():
    """Radius-rho solutions are the rho-scaled unit solutions."""
    solve = jax.jit(rs_path.solve)
    _, _, t1 = solve(jnp.zeros(3), jnp.asarray([4.0, 2.0, 1.0]), 1.0)
    _, _, t2 = solve(jnp.zeros(3), jnp.asarray([8.0, 4.0, 1.0]), 2.0)
    np.testing.assert_allclose(2.0 * float(t1), float(t2), rtol=1e-9)


def test_velocity_profile_parking():
    spec = reverse_parking_spec(N=40, Ts=0.6)
    X, U = jax.jit(velosmooth.rs_time_sampled)(spec)
    X, U = np.asarray(X), np.asarray(U)
    # Endpoints anchored (v = 0 at both).
    np.testing.assert_allclose(X[0, :3], np.asarray(spec.x0)[:3],
                               atol=1e-9)
    np.testing.assert_allclose(X[-1, :3], np.asarray(spec.xF)[:3],
                               atol=1e-6)
    assert abs(X[0, 3]) < 1e-9 and abs(X[-1, 3]) < 1e-6
    # Bounds respected with margin.
    assert X[:, 3].min() >= float(spec.v_lo)
    assert X[:, 3].max() <= float(spec.v_hi)
    assert np.abs(U[:, 0]).max() <= float(spec.u_hi[0])
    # A reverse-parking maneuver must contain reverse motion.
    assert X[:, 3].min() < -0.1


def test_dual_ws_feasibility():
    """Geometric dual warm start satisfies the OBCA constraints to
    warm-start accuracy: unit norm, near-zero rotation equality,
    strictly positive duals."""
    spec = reverse_parking_spec(N=10)
    X = geometric.interpolated_states(spec)
    lam, mu = dual_ws.geometric_duals(spec, X)
    assert float(lam.min()) > 0.0
    assert float(mu.min()) > 0.0
    for k in range(0, 11, 5):
        eq, dist, norm_sq = obca.obca_terms(
            X[k], lam[k], mu[k], spec.obstacles.A, spec.obstacles.b,
            spec.ego_g,
        )
        np.testing.assert_allclose(np.asarray(norm_sq), 1.0, atol=0.1)
        np.testing.assert_allclose(np.asarray(eq), 0.0, atol=0.1)
