"""Independent oracle cross-check: the same NLP solved by scipy
`trust-constr` must agree with the interior-point solver's solution
(SURVEY.md §4.1 — the defense against a self-consistent-but-wrong
solver/formulation pair)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import LinearConstraint, NonlinearConstraint, minimize

from obca_tpu import nlp
from obca_tpu.solver import ipm
from obca_tpu.spec import SolverConfig, reverse_parking_spec
from obca_tpu.warmstart import geometric


def _build_scipy_problem(spec, W0):
    L = nlp.layout_of(spec)
    active, is_eq = nlp.constraint_masks(L, spec)
    active = np.asarray(active)
    is_eq = np.asarray(is_eq)
    lo, hi, has_lo, has_hi, _pin = nlp.bound_arrays(L, spec)

    shape = (L.N + 1, L.nw)

    # dual_ref must be anchored the same way the solver anchors it.
    spec = dataclasses.replace(
        spec,
        dual_ref=jnp.concatenate(
            [W0[:, L.sl_lam], W0[:, L.sl_mu]], axis=-1
        ),
    )

    obj = jax.jit(lambda w: nlp.objective(L, w.reshape(shape), spec))
    obj_grad = jax.jit(jax.grad(
        lambda w: nlp.objective(L, w.reshape(shape), spec)
    ))
    cons_f = jax.jit(
        lambda w: nlp.all_constraints(L, w.reshape(shape), spec).reshape(-1)
    )
    cons_j = jax.jit(jax.jacrev(
        lambda w: nlp.all_constraints(L, w.reshape(shape), spec).reshape(-1)
    ))

    act = active.reshape(-1) > 0
    eq_mask = (active * is_eq[None, :]).reshape(-1) > 0
    in_mask = act & ~eq_mask

    lb = np.where(eq_mask, 0.0, np.where(in_mask, 0.0, -np.inf))
    ub = np.where(eq_mask, 0.0, np.inf)
    # inactive rows unconstrained
    lb = np.where(act, lb, -np.inf)

    nlc = NonlinearConstraint(
        lambda w: np.asarray(cons_f(jnp.asarray(w))),
        lb, ub,
        jac=lambda w: np.asarray(cons_j(jnp.asarray(w))),
    )

    lo_full = np.where(np.asarray(has_lo) > 0, np.asarray(lo), -np.inf)
    hi_full = np.where(np.asarray(has_hi) > 0, np.asarray(hi), np.inf)
    bounds = list(zip(np.tile(lo_full, L.N + 1),
                      np.tile(hi_full, L.N + 1)))

    return obj, obj_grad, nlc, bounds, L


@pytest.mark.slow
def test_trust_constr_agrees_with_ipm_n40():
    """Independent full-NLP check at production-adjacent scale
    (VERDICT r3 next #7: the only non-self-referential check was
    N=10).  N=40 on the signed reverse scenario: ~1.3k variables,
    ~1.7k constraints through scipy trust-constr from the same warm
    start — same basin, independent solver."""
    spec = reverse_parking_spec(N=40, Ts=0.6)
    W0 = geometric.lattice_warm_start(spec)
    cfg = SolverConfig(max_iter=300)
    res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED

    obj, obj_grad, nlc, bounds, L = _build_scipy_problem(spec, W0)
    r = minimize(
        lambda w: float(obj(jnp.asarray(w))),
        np.asarray(W0).reshape(-1),
        jac=lambda w: np.asarray(obj_grad(jnp.asarray(w))),
        constraints=[nlc], bounds=bounds, method="trust-constr",
        options={"maxiter": 3000, "gtol": 1e-8, "xtol": 1e-12},
    )
    assert r.constr_violation < 1e-7
    W_sp = r.x.reshape(L.N + 1, L.nw)
    np.testing.assert_allclose(np.asarray(res.U),
                               W_sp[: L.N, L.sl_u], atol=5e-4)
    np.testing.assert_allclose(np.asarray(res.X),
                               W_sp[:, L.sl_x], atol=5e-4)


@pytest.mark.slow
def test_trust_constr_agrees_with_ipm():
    spec = reverse_parking_spec(N=10, Ts=2.4)
    W0 = geometric.lattice_warm_start(spec)
    cfg = SolverConfig(max_iter=300)
    res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED

    obj, obj_grad, nlc, bounds, L = _build_scipy_problem(spec, W0)
    r = minimize(
        lambda w: float(obj(jnp.asarray(w))),
        np.asarray(W0).reshape(-1),
        jac=lambda w: np.asarray(obj_grad(jnp.asarray(w))),
        constraints=[nlc], bounds=bounds, method="trust-constr",
        options={"maxiter": 1000, "gtol": 1e-8, "xtol": 1e-12},
    )
    assert r.constr_violation < 1e-8
    W_sp = r.x.reshape(L.N + 1, L.nw)
    U_sp = W_sp[: L.N, L.sl_u]
    X_sp = W_sp[:, L.sl_x]
    # Same basin, independent solvers: the trajectory solution agrees to
    # solver tolerances.  (The dual variables may differ — slack
    # obstacle constraints admit a family of certificates and the two
    # solvers settle the proximal regularization differently — so total
    # objectives are not compared.)
    np.testing.assert_allclose(np.asarray(res.U), U_sp, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.X), X_sp, atol=2e-4)
