"""Native (C++) oracle components: block-tridiag solver and the
independent trajectory certifier (SURVEY.md §2.2 C9'/C10' native
accounting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle import native


def _random_quasidefinite(S, nw, nc, key):
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


def test_cpp_blocktri_matches_dense():
    from obca_tpu.solver import blocktri

    K, E = _random_quasidefinite(7, 5, 4, jax.random.PRNGKey(0))
    rhs = jax.random.normal(jax.random.PRNGKey(1), (7, 9),
                            dtype=jnp.float64)
    x_cpp = native.blocktri_solve(np.asarray(K), np.asarray(E),
                                  np.asarray(rhs))
    T = np.asarray(blocktri.dense_from_blocks(K, E))
    x_ref = np.linalg.solve(T, np.asarray(rhs).reshape(-1)).reshape(7, 9)
    np.testing.assert_allclose(x_cpp, x_ref, rtol=1e-9, atol=1e-10)


def test_cpp_blocktri_matches_jax_solver():
    from obca_tpu.solver import blocktri

    K, E = _random_quasidefinite(6, 4, 3, jax.random.PRNGKey(5))
    rhs = jax.random.normal(jax.random.PRNGKey(6), (6, 7),
                            dtype=jnp.float64)
    x_cpp = native.blocktri_solve(np.asarray(K), np.asarray(E),
                                  np.asarray(rhs))
    x_jax = blocktri.solve(blocktri.factor(K, E), rhs)
    np.testing.assert_allclose(x_cpp, np.asarray(x_jax), rtol=1e-7,
                               atol=1e-8)


def test_cpp_certifier_on_golden():
    """The C++ certifier (independent dynamics + SAT collision math)
    validates the committed oracle golden."""
    import os

    from obca_tpu.spec import reverse_parking_spec

    golden = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "oracle", "goldens",
        "reverse_parking_N40.npz")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    g = np.load(golden)
    spec = reverse_parking_spec(N=int(g["N"]), Ts=float(g["Ts"]))
    out = native.verify_trajectory(spec, g["X"], g["U"])
    assert out["max_dyn_defect"] < 1e-6
    assert out["max_bc_err"] < 1e-6
    assert out["max_u_violation"] < 1e-8
    assert out["max_v_violation"] < 1e-8
    assert out["max_xy_violation"] < 1e-8
    assert out["min_clearance"] >= float(spec.d_min) - 1e-6


def test_cpp_certifier_catches_bad_trajectory():
    """A corrupted trajectory must fail certification."""
    import os

    from obca_tpu.spec import reverse_parking_spec

    golden = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "oracle", "goldens",
        "reverse_parking_N40.npz")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    g = np.load(golden)
    spec = reverse_parking_spec(N=int(g["N"]), Ts=float(g["Ts"]))
    X = g["X"].copy()
    X[10:20, 0] = 0.0
    X[10:20, 1] = 3.0   # teleport into the slot walls
    out = native.verify_trajectory(spec, X, g["U"])
    assert out["min_clearance"] < 0.0 or out["max_dyn_defect"] > 1e-3
