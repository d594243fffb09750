"""Pallas batch-in-lanes kernels vs the XLA blocktri reference
(SURVEY.md §4.3 solver-core tests; kernels validated with
interpret=True per §5 sanitizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu.solver import blocktri, kkt
from obca_tpu.solver.pallas import blocktri_kernel as bk

S, NW, NC, B = 7, 6, 5, 4
NZ = NW + NC


def _random_qd_system(rng, S=S, nw=NW, nc=NC):
    """A well-conditioned quasidefinite block-tridiagonal system."""
    nz = nw + nc
    Ks, Es = [], []
    for k in range(S):
        M = rng.standard_normal((nw, nz))
        A = M[:, :nw] @ M[:, :nw].T + 3 * np.eye(nw)
        J = rng.standard_normal((nc, nw))
        K = np.zeros((nz, nz))
        K[:nw, :nw] = A
        K[nw:, :nw] = J
        K[:nw, nw:] = J.T
        K[nw:, nw:] = -0.5 * np.eye(nc)
        Ks.append(K)
        if k < S - 1:
            Es.append(0.3 * rng.standard_normal((nz, nz)))
    return np.array(Ks), np.array(Es)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    Kb = np.zeros((S, NZ, NZ, B))
    Eb = np.zeros((S - 1, NZ, NZ, B))
    rb = rng.standard_normal((S, NZ, B))
    for b in range(B):
        K1, E1 = _random_qd_system(rng)
        Kb[..., b] = K1
        Eb[..., b] = E1
    return Kb, Eb, rb


def test_factor_solve_matches_xla(batch):
    Kb, Eb, rb = batch
    Sinv, W = bk.factor_batched(jnp.asarray(Kb), jnp.asarray(Eb), NW,
                                interpret=True)
    x = bk.solve_batched(Sinv, W, jnp.asarray(Eb), jnp.asarray(rb),
                         interpret=True)
    for b in range(B):
        fac = blocktri.factor(jnp.asarray(Kb[..., b]),
                              jnp.asarray(Eb[..., b]), nw=NW)
        xr = np.asarray(blocktri.solve(fac, jnp.asarray(rb[..., b])))
        np.testing.assert_allclose(np.asarray(x)[..., b], xr,
                                   rtol=1e-8, atol=1e-8)


def test_pad_system_solution_unchanged(batch):
    """nz / B padding must not perturb the unpadded solution block."""
    Kb, Eb, rb = batch
    nzp, Bp = NZ + 5, B + 3
    Kp, Ep, (rp,) = bk.pad_system(jnp.asarray(Kb), jnp.asarray(Eb),
                                  [jnp.asarray(rb)], nzp, Bp, nw=NW)
    Sinv, W = bk.factor_batched(Kp, Ep, NW, interpret=True)
    x = bk.solve_batched(Sinv, W, Ep, rp, interpret=True)
    Sinv0, W0 = bk.factor_batched(jnp.asarray(Kb), jnp.asarray(Eb), NW,
                                  interpret=True)
    x0 = bk.solve_batched(Sinv0, W0, jnp.asarray(Eb), jnp.asarray(rb),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(x)[:, :NZ, :B],
                               np.asarray(x0), rtol=1e-8, atol=1e-8)
    # padded rows/lanes decouple exactly
    assert np.abs(np.asarray(x)[:, NZ:, :]).max() == 0.0


def test_kkt_dispatch_batched_matches_unbatched(batch):
    """The custom_vmap Pallas route must agree with the per-scenario
    XLA route (forced on CPU via interpret kernels)."""
    Kb, Eb, rb = batch
    K = jnp.asarray(np.transpose(Kb, (3, 0, 1, 2)))
    E = jnp.asarray(np.transpose(Eb, (3, 0, 1, 2)))
    r = jnp.asarray(np.transpose(rb, (2, 0, 1)))
    reg = jnp.broadcast_to(
        jnp.concatenate([jnp.full((NW,), 1e-6),
                         jnp.full((NC,), -1e-6)]), (B, NZ))

    solver_xla = kkt.make_kkt_solver(NW, 4, jnp.float64, jnp.float64,
                                     force_pallas=False)
    solver_pls = kkt.make_kkt_solver(NW, 4, jnp.float64, jnp.float64,
                                     force_pallas=True, interpret=True)
    d_x, lin_x = jax.vmap(solver_xla)(K, E, reg, r)
    d_p, lin_p = jax.vmap(solver_pls)(K, E, reg, r)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lin_p), np.asarray(lin_x),
                               rtol=1e-4, atol=1e-10)
