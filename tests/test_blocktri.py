"""Block-tridiagonal solver vs dense numpy (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.solver import blocktri


def _random_quasidefinite(S, nw, nc, key):
    """Random block-tridiagonal KKT-shaped quasidefinite system."""
    nz = nw + nc
    ks = jax.random.split(key, 4)
    A = jax.random.normal(ks[0], (S, nw, nw), dtype=jnp.float64)
    H = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(nw)
    J = jax.random.normal(ks[1], (S, nc, nw), dtype=jnp.float64)
    D = -0.5 - jax.random.uniform(ks[2], (S, nc), dtype=jnp.float64)
    K = jnp.zeros((S, nz, nz), jnp.float64)
    K = K.at[:, :nw, :nw].set(H)
    K = K.at[:, nw:, :nw].set(J)
    K = K.at[:, :nw, nw:].set(jnp.swapaxes(J, -1, -2))
    K = K.at[:, nw:, nw:].set(jax.vmap(jnp.diag)(D))
    E = jax.random.normal(ks[3], (S - 1, nz, nz), dtype=jnp.float64) * 0.3
    return K, E


def test_factor_solve_matches_dense():
    K, E = _random_quasidefinite(7, 5, 4, jax.random.PRNGKey(0))
    r = jax.random.normal(jax.random.PRNGKey(1), (7, 9), dtype=jnp.float64)
    fac = blocktri.factor(K, E)
    x = blocktri.solve(fac, r)
    T = np.asarray(blocktri.dense_from_blocks(K, E))
    x_dense = np.linalg.solve(T, np.asarray(r).reshape(-1)).reshape(7, 9)
    np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8, atol=1e-9)


def test_spd_inv():
    key = jax.random.PRNGKey(11)
    for n in (1, 2, 3, 8, 17, 31):
        A = jax.random.normal(key, (n, n), dtype=jnp.float64)
        A = A @ A.T + n * jnp.eye(n)
        Ainv = blocktri.spd_inv(A)
        np.testing.assert_allclose(
            np.asarray(A @ Ainv), np.eye(n), atol=1e-10
        )


def test_qd_inv_and_qd_factor():
    """qd_inv inverts KKT-shaped quasidefinite blocks, and factor(nw=..)
    matches the dense solve (this is the TPU code path)."""
    K, E = _random_quasidefinite(6, 5, 4, jax.random.PRNGKey(12))
    S0 = K[0]
    Sinv = blocktri.qd_inv(S0, 5)
    np.testing.assert_allclose(
        np.asarray(S0 @ Sinv), np.eye(9), atol=1e-9
    )
    r = jax.random.normal(jax.random.PRNGKey(13), (6, 9),
                          dtype=jnp.float64)
    # NOTE: E blocks here are random, so intermediate Schur complements
    # are not guaranteed quasidefinite; scale E down to keep them QD.
    E = E * 0.1
    fac = blocktri.factor(K, E, nw=5)
    x = blocktri.solve(fac, r)
    T = np.asarray(blocktri.dense_from_blocks(K, E))
    ref = np.linalg.solve(T, np.asarray(r).reshape(-1)).reshape(6, 9)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-7, atol=1e-8)


def test_matvec_matches_dense():
    K, E = _random_quasidefinite(5, 3, 2, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 5), dtype=jnp.float64)
    out = blocktri.matvec(K, E, x)
    T = np.asarray(blocktri.dense_from_blocks(K, E))
    ref = (T @ np.asarray(x).reshape(-1)).reshape(5, 5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-10)


def test_refinement_recovers_f64_from_f32_factor():
    """f32 factorization + f64 residual refinement reaches ~f64 accuracy
    on a well-conditioned system (SURVEY.md §7 hard part 1)."""
    K, E = _random_quasidefinite(6, 4, 3, jax.random.PRNGKey(4))
    r = jax.random.normal(jax.random.PRNGKey(5), (6, 7), dtype=jnp.float64)
    fac32 = blocktri.factor(K.astype(jnp.float32), E.astype(jnp.float32))
    fac32 = blocktri.BlockTriFactor(
        Sinv=fac32.Sinv.astype(jnp.float64),
        W=fac32.W.astype(jnp.float64),
        E=E,
    )
    x0 = blocktri.solve(fac32, r)
    x3 = blocktri.solve_refined(K, E, fac32, r, iters=3)
    T = np.asarray(blocktri.dense_from_blocks(K, E))
    x_ref = np.linalg.solve(T, np.asarray(r).reshape(-1)).reshape(6, 7)
    err0 = np.abs(np.asarray(x0) - x_ref).max()
    err3 = np.abs(np.asarray(x3) - x_ref).max()
    assert err3 < err0 * 1e-3
    assert err3 < 1e-9


def test_batched_vmap():
    def make(key):
        return _random_quasidefinite(4, 3, 2, key)

    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    K, E = jax.vmap(make)(keys)
    r = jax.random.normal(jax.random.PRNGKey(7), (3, 4, 5),
                          dtype=jnp.float64)
    xs = jax.vmap(lambda k, e, rr: blocktri.solve(blocktri.factor(k, e), rr))(
        K, E, r
    )
    for i in range(3):
        T = np.asarray(blocktri.dense_from_blocks(K[i], E[i]))
        ref = np.linalg.solve(T, np.asarray(r[i]).reshape(-1)).reshape(4, 5)
        np.testing.assert_allclose(np.asarray(xs[i]), ref, rtol=1e-7,
                                   atol=1e-8)
