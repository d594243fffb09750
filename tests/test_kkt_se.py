"""Structured-coupling (sparse-E) KKT solver: the hot path must agree
with the dense reference everywhere — unbatched XLA, batched Pallas
(interpret mode), and composed inside the production IPM
(custom_vmap under vmap + lax.while_loop, ADVICE r2 finding #4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu import nlp
from obca_tpu.solver import blocktri, ipm, kkt
from obca_tpu.spec import SolverConfig, reverse_parking_spec

S, NW, NC, B = 7, 5, 4, 3
NZ = NW + NC
NNZ = 6


def _system(rng):
    Ks = []
    for _ in range(S):
        R = rng.standard_normal((NW, NW))
        A = R @ R.T / NW + np.eye(NW)
        Q = rng.standard_normal((NC, NC))
        D = -(Q @ Q.T / NC + np.eye(NC))
        Bm = rng.standard_normal((NW, NC))
        Ks.append(np.block([[A, Bm], [Bm.T, D]]))
    ev = 0.4 * rng.standard_normal((S - 1, NNZ))
    r = rng.standard_normal((S, NZ))
    return np.stack(Ks), ev, r


def test_se_rejects_duplicate_pattern():
    """Duplicate (row, col) pairs would make the XLA (.set) and Pallas
    (accumulate) routes silently disagree; the builder must refuse
    them (ADVICE r3)."""
    rows = np.array([0, 1, 2, 0])
    cols = np.array([3, 4, 5, 3])   # (0, 3) twice
    with pytest.raises(ValueError, match="duplicate"):
        kkt.make_kkt_solver_se(NW, 4, jnp.float64, jnp.float64,
                               rows, cols, force_pallas=False)


def test_se_unbatched_matches_dense():
    rng = np.random.default_rng(0)
    K, ev, r = _system(rng)
    reg = np.concatenate([np.full(NW, 1e-6), np.full(NC, -1e-6)])

    dense = kkt.make_kkt_solver(NW, 4, jnp.float64, jnp.float64,
                                force_pallas=False)
    rows2 = np.arange(NNZ)
    cols2 = np.arange(NNZ)[::-1].copy()
    se2 = kkt.make_kkt_solver_se(NW, 4, jnp.float64, jnp.float64,
                                 rows2, cols2, force_pallas=False)
    E2 = np.zeros((S - 1, NZ, NZ))
    E2[:, rows2, cols2] = ev
    d_ref2, lin_ref2 = dense(jnp.asarray(K), jnp.asarray(E2),
                             jnp.asarray(reg), jnp.asarray(r))
    d_se, lin_se = se2(jnp.asarray(K), jnp.asarray(ev),
                       jnp.asarray(reg), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(d_se), np.asarray(d_ref2),
                               rtol=1e-9, atol=1e-10)


def test_se_batched_pallas_matches_xla():
    """custom_vmap Pallas branch (interpret) vs per-scenario XLA."""
    rows = np.arange(NNZ)
    cols = np.arange(NNZ)[::-1].copy()
    rng = np.random.default_rng(1)
    systems = [_system(rng) for _ in range(B)]
    K = jnp.asarray(np.stack([s[0] for s in systems]))
    ev = jnp.asarray(np.stack([s[1] for s in systems]))
    r = jnp.asarray(np.stack([s[2] for s in systems]))
    reg = jnp.broadcast_to(
        jnp.concatenate([jnp.full((NW,), 1e-6),
                         jnp.full((NC,), -1e-6)]), (B, NZ))

    s_xla = kkt.make_kkt_solver_se(NW, 4, jnp.float64, jnp.float64,
                                   rows, cols, force_pallas=False)
    s_pls = kkt.make_kkt_solver_se(NW, 4, jnp.float64, jnp.float64,
                                   rows, cols, force_pallas=True,
                                   interpret=True)
    d_x, lin_x = jax.vmap(s_xla)(K, ev, reg, r)
    d_p, lin_p = jax.vmap(s_pls)(K, ev, reg, r)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lin_p), np.asarray(lin_x),
                               rtol=1e-4, atol=1e-10)


def test_ipm_vmap_whileloop_pallas_interpret(monkeypatch):
    """The production composition — make_kkt_solver_se dispatching to
    the Pallas kernels inside lax.while_loop under jax.vmap — run in
    interpret mode and compared against the XLA route (ADVICE r2 #4:
    this composition previously had no hardware-independent test)."""
    from obca_tpu.warmstart import geometric, lattice

    spec = reverse_parking_spec(N=40, Ts=0.6)
    lcfg = lattice.LatticeConfig.for_spec(spec)
    field = lattice.plan_field(spec, lcfg)
    shifts = [-0.05, 0.0, 0.05]
    specs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(spec, x0=spec.x0.at[0].add(s))
          for s in shifts],
    )
    W0 = jax.vmap(
        lambda sp: geometric.lattice_warm_start(sp, field=field)
    )(specs)
    # Per-call the two routes agree to the conditioning-limited level
    # (~1e-7 rel, verified by test_se_batched_pallas_matches_xla); a
    # full nonconvex IPM trajectory amplifies that through discrete
    # line-search choices, so the meaningful composition invariant is
    # *convergence equivalence*: both routes must converge every lane
    # to the same optimum (controls agree to well below the 1e-3
    # parity budget).
    cfg = SolverConfig(max_iter=120)

    res_xla = jax.jit(
        lambda sp, w: ipm.solve_batch(sp, cfg, w)
    )(specs, W0)

    orig = kkt.make_kkt_solver_se

    def forced(*args, **kw):
        kw["force_pallas"] = True
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(kkt, "make_kkt_solver_se", forced)
    res_pls = jax.jit(
        lambda sp, w: ipm.solve_batch(sp, cfg, w)
    )(specs, W0)

    assert np.all(np.asarray(res_xla.status) == ipm.STATUS_CONVERGED)
    assert np.all(np.asarray(res_pls.status) == ipm.STATUS_CONVERGED)
    np.testing.assert_allclose(np.asarray(res_pls.U),
                               np.asarray(res_xla.U),
                               rtol=0, atol=1e-5)
