import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import minimize

from obca_tpu import dynamics, geometry, obca, spec


def test_rollout_matches_scipy_integration():
    """Rollout vs scipy ODE integration of the continuous bicycle
    (SURVEY.md §4.2). The discretization is midpoint-flavoured Euler, so
    agreement is O(Ts^2) per step — checked at loose tolerance over a
    short horizon with small Ts."""
    L = 2.7
    Ts = 0.02
    N = 50
    x0 = np.array([0.0, 0.0, 0.3, 1.0])
    rng = np.random.default_rng(0)
    U = np.column_stack(
        [0.3 * np.sin(np.linspace(0, 2, N)), 0.2 * np.cos(np.linspace(0, 3, N))]
    )

    X = dynamics.rollout(
        jnp.asarray(x0), jnp.asarray(U), jnp.asarray(1.0), Ts, L
    )

    def ode(t, x, u):
        d, a = u
        return [x[3] * np.cos(x[2]), x[3] * np.sin(x[2]),
                x[3] * np.tan(d) / L, a]

    x = x0.copy()
    for k in range(N):
        sol = solve_ivp(ode, (0, Ts), x, args=(U[k],), rtol=1e-10,
                        atol=1e-12)
        x = sol.y[:, -1]
    np.testing.assert_allclose(np.asarray(X[-1]), x, atol=2e-3)


def test_defects_zero_on_rollout():
    Ts, L = 0.3, 2.7
    U = jnp.asarray(np.random.default_rng(1).normal(size=(20, 2)) * 0.1)
    x0 = jnp.array([1.0, 2.0, 0.5, 0.3])
    X = dynamics.rollout(x0, U, jnp.asarray(1.0), Ts, L)
    d = dynamics.dynamics_defects(X, U, jnp.asarray(1.0), Ts, L)
    # XLA-CPU's vectorized (vmap) and scalar (scan) transcendentals differ
    # at ~1e-9; the solver only ever uses the defect form, so internal
    # consistency is what matters.
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)


def _solve_dual_problem(state, ego_g, A, b, equality_norm=False):
    """Independent check: maximize -g'mu + lam'(A t - b) over feasible
    duals with scipy SLSQP; at the optimum this equals dist(E(x), O)
    (OBCA paper Prop. 1 / SURVEY.md §2.1)."""
    V = A.shape[0]
    G = np.asarray(geometry.EGO_G)
    psi = state[2]
    R = np.array([[np.cos(psi), -np.sin(psi)], [np.sin(psi), np.cos(psi)]])
    t = state[:2]

    def neg_obj(z):
        lam, mu = z[:V], z[V:]
        return -(-ego_g @ mu + lam @ (A @ t - b))

    cons = [
        {"type": "eq",
         "fun": lambda z: G.T @ z[V:] + R.T @ (A.T @ z[:V])},
    ]
    if equality_norm:
        cons.append({"type": "eq",
                     "fun": lambda z: (A.T @ z[:V]) @ (A.T @ z[:V]) - 1.0})
    else:
        cons.append({"type": "ineq",
                     "fun": lambda z: 1.0 - (A.T @ z[:V]) @ (A.T @ z[:V])})
    best = None
    for seed in range(5):
        rng = np.random.default_rng(seed)
        z0 = np.abs(rng.normal(size=V + 4)) * 0.3
        r = minimize(neg_obj, z0, bounds=[(0, None)] * (V + 4),
                     constraints=cons, method="SLSQP",
                     options={"maxiter": 300, "ftol": 1e-12})
        if r.success and (best is None or r.fun < best):
            best = r.fun
    assert best is not None
    return -best


def test_dual_reformulation_matches_geometric_distance():
    obs = spec.obstacles_from_vertices(
        [[(6.0, 1.5), (4.0, 1.5), (4.0, -1.5), (6.0, -1.5)]]
    )
    ego_g = np.array([3.7, 1.0, 1.0, 1.0])
    rng = np.random.default_rng(42)
    for _ in range(4):
        state = np.array(
            [rng.uniform(-2, 1), rng.uniform(-2, 2),
             rng.uniform(-0.7, 0.7), 0.0]
        )
        d_geo = float(
            geometry.ego_obstacle_distance(
                jnp.asarray(state), jnp.asarray(ego_g),
                obs.A[0], obs.b[0], obs.face_mask[0]
            )
        )
        if d_geo < 1e-3:
            continue  # overlapping: plain-distance dual value is 0 there
        d_dual = _solve_dual_problem(
            state, ego_g, np.asarray(obs.A[0]), np.asarray(obs.b[0])
        )
        np.testing.assert_allclose(d_dual, d_geo, rtol=2e-3, atol=2e-3)


def test_obca_terms_shapes_and_feasible_point():
    """At a hand-built feasible dual pair the residual expressions are
    consistent: eq == 0, dist == geometric distance, norm == 1."""
    # Obstacle: halfplane-ish box far to the right; ego at origin axis-
    # aligned.  Separating direction is +x: lam picks the face x >= 4
    # (A row (-1, 0), b = -4), mu picks ego front face.
    obs = spec.obstacles_from_vertices(
        [[(6.0, 1.0), (4.0, 1.0), (4.0, -1.0), (6.0, -1.0)]]
    )
    A, b = np.asarray(obs.A[0]), np.asarray(obs.b[0])
    # Find the face with normal (-1, 0).
    i = int(np.argmin(A @ np.array([1.0, 0.0])))
    lam = np.zeros((1, 4))
    lam[0, i] = 1.0
    # eq: G'mu + A'lam = 0 with A'lam = (-1, 0) -> mu on ego face with
    # normal (1,0) (index 0 in EGO_G), weight 1.
    mu = np.zeros((1, 4))
    mu[0, 0] = 1.0
    x = jnp.array([0.0, 0.0, 0.0, 0.0])
    eq, dist, norm_sq = obca.obca_terms(
        x, jnp.asarray(lam), jnp.asarray(mu), obs.A, obs.b,
        jnp.array([3.7, 1.0, 1.0, 1.0])
    )
    np.testing.assert_allclose(np.asarray(eq), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(norm_sq[0]), 1.0, atol=1e-12)
    # -g'mu + lam'(At-b) = -3.7 + (0 - (-4)) = 0.3 = true gap.
    np.testing.assert_allclose(float(dist[0]), 0.3, atol=1e-12)


def test_point_obca_feasible():
    obs = spec.obstacles_from_vertices(
        [[(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)]]
    )
    p = jnp.array([3.0, 0.0])
    lam = np.zeros((1, 4))
    i = int(np.argmax(np.asarray(obs.A[0]) @ np.array([1.0, 0.0])))
    lam[0, i] = 1.0
    dist, norm_sq = obca.point_obca_terms(p, jnp.asarray(lam), obs.A, obs.b)
    np.testing.assert_allclose(float(dist[0]), 2.0, atol=1e-12)
    np.testing.assert_allclose(float(norm_sq[0]), 1.0, atol=1e-12)
