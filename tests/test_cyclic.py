"""Cyclic-reduction long-horizon solver vs the sequential block-Thomas
reference (SURVEY.md §5 long-context; VERDICT r2 missing #8).

Random quasidefinite block-tridiagonal systems (the KKT structure the
IPM produces) and a real N=320 parking KKT shape: the CR solve must
match `blocktri` to f64 roundoff, including under vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu.solver import blocktri, cyclic


def _random_qd_system(rng, S, nw, nc, coupling=0.3):
    nz = nw + nc
    Ks, Es = [], []
    for _ in range(S):
        R = rng.standard_normal((nw, nw))
        A = R @ R.T / nw + np.eye(nw)
        Q = rng.standard_normal((nc, nc))
        D = -(Q @ Q.T / nc + np.eye(nc))
        B = rng.standard_normal((nw, nc))
        Ks.append(np.block([[A, B], [B.T, D]]))
    for _ in range(S - 1):
        Es.append(coupling * rng.standard_normal((nz, nz)))
    return jnp.asarray(np.stack(Ks)), jnp.asarray(np.stack(Es))


@pytest.mark.parametrize("S,nw,nc", [(5, 3, 2), (16, 4, 3), (81, 5, 4)])
def test_cr_matches_blocktri(S, nw, nc):
    rng = np.random.default_rng(0)
    K, E = _random_qd_system(rng, S, nw, nc)
    nz = nw + nc
    r = jnp.asarray(rng.standard_normal((S, nz)))

    x_ref = blocktri.solve(blocktri.factor(K, E, nw=nw), r)
    x_cr = cyclic.solve(cyclic.factor(K, E, nw=nw), r)
    np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)
    # And both actually solve the system.
    res = blocktri.matvec(K, E, x_cr) - r
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_cr_long_horizon_n320():
    """The long-horizon case CR exists for: S = 321 stages (N=320)."""
    rng = np.random.default_rng(1)
    S, nw, nc = 321, 6, 5
    K, E = _random_qd_system(rng, S, nw, nc, coupling=0.2)
    r = jnp.asarray(rng.standard_normal((S, nw + nc)))
    x_ref = blocktri.solve(blocktri.factor(K, E, nw=nw), r)
    x_cr = cyclic.solve(cyclic.factor(K, E, nw=nw), r)
    np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-7)


def test_cr_vmap_batch():
    """CR is vmappable over scenarios (each level is batched matmuls)."""
    rng = np.random.default_rng(2)
    S, nw, nc, B = 9, 3, 2, 4
    systems = [_random_qd_system(rng, S, nw, nc) for _ in range(B)]
    K = jnp.stack([k for k, _ in systems])
    E = jnp.stack([e for _, e in systems])
    r = jnp.asarray(rng.standard_normal((B, S, nw + nc)))

    def one(Kb, Eb, rb):
        return cyclic.solve(cyclic.factor(Kb, Eb, nw=nw), rb)

    xb = jax.jit(jax.vmap(one))(K, E, r)
    for i in range(B):
        x_ref = one(K[i], E[i], r[i])
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(x_ref),
                                   rtol=1e-8, atol=1e-8)
