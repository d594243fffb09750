"""Verify the stage-block KKT assembly against dense AD of the total
Lagrangian (SURVEY.md §4.3: solver-core tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import nlp
from obca_tpu.spec import reverse_parking_spec


def _tiny_spec(**kw):
    import dataclasses
    from obca_tpu import spec as spec_mod

    obs = spec_mod.obstacles_from_vertices(
        [[(6.0, 1.0), (4.0, 1.0), (4.0, -1.0), (6.0, -1.0)]],
        max_obs=2, max_faces=4,
    )
    s = reverse_parking_spec(N=3, **kw)
    return dataclasses.replace(
        s, obstacles=obs, max_obs=2, max_faces=4,
        dual_ref=jnp.zeros((4, 2 * 4 + 4 * 2)),
        x0=jnp.asarray([0.0, 0.0, 0.1, 0.2]),
        xF=jnp.asarray([1.0, 0.5, 0.3, 0.0]),
    )


def _rand_point(L, key, scale=0.3):
    kW, knu = jax.random.split(key)
    W = jax.random.normal(kW, (L.N + 1, L.nw), dtype=jnp.float64) * scale
    # keep tau near 1 and duals positive-ish
    W = W.at[:, L.i_tau].add(1.0)
    W = W.at[:, L.sl_lam].add(0.5)
    W = W.at[:, L.sl_mu].add(0.5)
    nu = jax.random.normal(knu, (L.N + 1, L.nc), dtype=jnp.float64)
    return W, nu


def _dense_from_blocks(L, K, E):
    Np1 = L.N + 1
    nz = L.nz
    T = np.zeros((Np1 * nz, Np1 * nz))
    for k in range(Np1):
        T[k * nz:(k + 1) * nz, k * nz:(k + 1) * nz] = np.asarray(K[k])
    for k in range(Np1 - 1):
        T[k * nz:(k + 1) * nz, (k + 1) * nz:(k + 2) * nz] = np.asarray(E[k])
        T[(k + 1) * nz:(k + 2) * nz, k * nz:(k + 1) * nz] = np.asarray(E[k]).T
    return T


def _check_kkt_vs_ad(spec):
    L = nlp.layout_of(spec)
    active, _ = nlp.constraint_masks(L, spec)
    W, nu = _rand_point(L, jax.random.PRNGKey(0))

    zeros_w = jnp.zeros((L.N + 1, L.nw))
    zeros_c = jnp.zeros((L.N + 1, L.nc))
    K, E, _ = nlp.assemble_kkt(
        L, W, nu, zeros_w, zeros_c, zeros_w, zeros_c, spec, active,
        jnp.asarray(0.0),
    )
    T_blocks = _dense_from_blocks(L, K, E)

    def lag_flat(zeta):
        zeta = zeta.reshape(L.N + 1, L.nz)
        Wf = zeta[:, : L.nw]
        nuf = zeta[:, L.nw:]
        return nlp.total_lagrangian(L, Wf, nuf, spec, active)

    zeta0 = jnp.concatenate([W, nu], axis=-1).reshape(-1)
    T_ad = np.asarray(jax.hessian(lag_flat)(zeta0))

    np.testing.assert_allclose(T_blocks, T_ad, atol=1e-8)


def test_kkt_blocks_match_dense_ad_fixed_time():
    _check_kkt_vs_ad(_tiny_spec(fix_time=True, signed=True))


def test_kkt_blocks_match_dense_ad_free_time():
    _check_kkt_vs_ad(_tiny_spec(fix_time=False, signed=False))


def test_constraint_residuals_feasible_rollout():
    """Dynamics + bc rows vanish on a feasible rollout with tau = 1."""
    import dataclasses
    from obca_tpu import dynamics

    spec = _tiny_spec(fix_time=True)
    L = nlp.layout_of(spec)
    U = jnp.zeros((L.N, 2), jnp.float64)
    X = dynamics.rollout(spec.x0, U, jnp.asarray(1.0), spec.Ts,
                         spec.wheelbase)
    W = jnp.zeros((L.N + 1, L.nw), jnp.float64)
    W = W.at[:, L.sl_x].set(X)
    W = W.at[:, L.i_tau].set(1.0)
    c = nlp.all_constraints(L, W, spec)
    active, is_eq = nlp.constraint_masks(L, spec)
    c = np.asarray(c * active)
    # dynamics rows zero
    np.testing.assert_allclose(c[:, L.r_dyn], 0.0, atol=1e-7)
    # tau rows zero
    np.testing.assert_allclose(c[:, L.i_taulink], 0.0, atol=1e-12)
    # bc row at 0 zero (x0 matches); at N generally nonzero
    np.testing.assert_allclose(c[0, L.r_bc], 0.0, atol=1e-12)


def test_masks_structure():
    spec = _tiny_spec(fix_time=True, signed=True)
    L = nlp.layout_of(spec)
    active, is_eq = nlp.constraint_masks(L, spec)
    active = np.asarray(active)
    # Obstacle 2 is padding: its OBCA rows inactive.
    assert active[:, L.r_norm][:, 1].sum() == 0
    assert active[:, L.r_norm][:, 0].sum() == L.N + 1
    # dyn inactive at stage N.
    assert active[L.N, L.r_dyn].sum() == 0
    # signed: norm rows are equalities.
    assert np.asarray(is_eq)[L.r_norm][0] == 1.0
    spec2 = _tiny_spec(fix_time=True, signed=False)
    _, is_eq2 = nlp.constraint_masks(nlp.layout_of(spec2), spec2)
    assert np.asarray(is_eq2)[L.r_norm][0] == 0.0
    # accel-rate rows disabled by du_max[1] < 0.
    assert active[0, L.r_rate.start + 2] == 0.0
    assert active[0, L.r_rate.start] == 1.0


def test_objective_gradient_matches_fd():
    spec = _tiny_spec()
    L = nlp.layout_of(spec)
    W, _ = _rand_point(L, jax.random.PRNGKey(3))
    g = nlp.objective_gradient(L, W, spec)
    f0 = float(nlp.objective(L, W, spec))
    eps = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(5):
        d = rng.normal(size=W.shape)
        d /= np.linalg.norm(d)
        f1 = float(nlp.objective(L, W + eps * jnp.asarray(d), spec))
        fd = (f1 - f0) / eps
        np.testing.assert_allclose(
            fd, float(jnp.sum(g * d)), rtol=1e-4, atol=1e-7
        )
