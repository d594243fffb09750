"""Stage-structured OBCA NLP: variables, constraints, objective, KKT blocks.

TPU-native equivalent of the reference's JuMP model construction inside
`ParkingSignedDist.jl` / `ParkingDist.jl` (`@variable x,u,lam,mu,tau;
@NLconstraint dynamics / OBCA duals / bounds; @NLobjective` — SURVEY.md
§2.2 C3/C4, §3.1) plus the derivative layer that JuMP's AD provided
(SURVEY.md §2.2 C11).  Instead of a sparse general-purpose NLP, the
problem is laid out *stage-wise* so the KKT system is block-tridiagonal
with a constant off-diagonal block:

  per-stage primal variables  w_k = [x(4), u(2), tau(1), lam(M*V), mu(4M)]
  per-stage constraints  c_k = [bc(4), dyn(4), tau-link(1), obca_eq(2M),
                                norm(M), dist(M), rate(4)]

Design notes:
  * tau (the reference's global free-time scaling) is made per-stage with
    consensus equalities tau_{k+1} = tau_k, preserving tridiagonality.
    With fix_time the stage-N link row pins tau_N = 1 instead.
  * All inter-stage couplings are *linear with constant coefficients*
    (dynamics' identity on x_{k+1}, the tau link, the input-rate rows and
    the rate-cost cross term), so the KKT off-diagonal block E is a
    constant matrix assembled once per scenario.
  * Inequality rows carry slacks handled by the interior-point layer; row
    classification (equality / inequality / inactive per stage) is static
    given the spec's static fields.
  * Padded dual entries (beyond real obstacle/face counts) are pinned to
    zero by a unit quadratic penalty and excluded from barriers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import dynamics, obca
from obca_tpu.spec import ProblemSpec

PIN_KAPPA = 1.0  # quadratic pin strength for padded/dummy variables


@dataclasses.dataclass(frozen=True)
class Layout:
    """Static index layout derived from the spec's static fields."""

    N: int
    M: int
    V: int
    signed: bool
    fix_time: bool

    # --- primal variable slices in w_k ---
    @property
    def sl_x(self):
        return slice(0, 4)

    @property
    def sl_u(self):
        return slice(4, 6)

    @property
    def i_tau(self):
        return 6

    @property
    def sl_lam(self):
        return slice(7, 7 + self.M * self.V)

    @property
    def sl_mu(self):
        return slice(7 + self.M * self.V, 7 + self.M * self.V + 4 * self.M)

    @property
    def nw(self):
        return 7 + self.M * self.V + 4 * self.M

    # --- constraint row slices in c_k ---
    @property
    def r_bc(self):
        return slice(0, 4)

    @property
    def r_dyn(self):
        return slice(4, 8)

    @property
    def i_taulink(self):
        return 8

    @property
    def r_obca_eq(self):
        return slice(9, 9 + 2 * self.M)

    @property
    def r_norm(self):
        return slice(9 + 2 * self.M, 9 + 3 * self.M)

    @property
    def r_dist(self):
        return slice(9 + 3 * self.M, 9 + 4 * self.M)

    @property
    def r_rate(self):
        return slice(9 + 4 * self.M, 13 + 4 * self.M)

    @property
    def nc(self):
        return 13 + 4 * self.M

    @property
    def nz(self):
        return self.nw + self.nc


def layout_of(spec: ProblemSpec) -> Layout:
    return Layout(
        N=spec.N, M=spec.max_obs, V=spec.max_faces,
        signed=spec.signed, fix_time=spec.fix_time,
    )


def unpack_w(L: Layout, w):
    """Split one stage vector (or [..., nw] batch) into components."""
    x = w[..., L.sl_x]
    u = w[..., L.sl_u]
    tau = w[..., L.i_tau]
    lam = w[..., L.sl_lam].reshape(w.shape[:-1] + (L.M, L.V))
    mu = w[..., L.sl_mu].reshape(w.shape[:-1] + (L.M, 4))
    return x, u, tau, lam, mu


def pack_w(L: Layout, x, u, tau, lam, mu):
    lead = x.shape[:-1]
    return jnp.concatenate(
        [
            x,
            u,
            tau[..., None],
            lam.reshape(lead + (L.M * L.V,)),
            mu.reshape(lead + (4 * L.M,)),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Constraints.
# ---------------------------------------------------------------------------


def stage_constraints_local(L: Layout, w, aux, spec: ProblemSpec, k):
    """Constraint vector c_k treating next-stage couplings as constants.

    aux = (x_next [4], tau_next [], u_prev [2]); for stage N the dyn /
    tau-link rows are masked by the caller.  `k` is a traced scalar stage
    index (used only to select bc target and the k=0 rate source).
    """
    x, u, tau, lam, mu = unpack_w(L, w)
    x_next, tau_next, u_prev = aux
    dt = w.dtype

    is0 = (k == 0).astype(dt)
    bc_target = is0 * spec.x0 + (1.0 - is0) * spec.xF
    c_bc = x - bc_target

    if spec.fix_time:
        # Fixed-time problems: tau is NOT threaded through the dynamics
        # (constant 1.0) and each stage carries the local equality
        # tau_k - 1 = 0.  The earlier consensus-chain formulation
        # (tau_{k+1} = tau_k plus a stage-N pin) is mathematically
        # equivalent but *numerically degenerate*: the tau-dual chain
        # coupled through d f/d tau forms a near-singular "drifting
        # multiplier" mode that stalls the interior-point method (seen
        # in the nav problem; dense SVD shows sigma_min ~ delta_c with
        # an inconsistent RHS).  Local pins are diagonal and full-rank.
        c_dyn = x_next - dynamics.step(x, u, jnp.ones((), dt), spec.Ts,
                                       spec.wheelbase)
        c_tau = tau - 1.0
    else:
        c_dyn = x_next - dynamics.step(x, u, tau, spec.Ts,
                                       spec.wheelbase)
        c_tau = tau_next - tau  # stage-N row masked; tau floats w/ bounds

    eq, dist, norm_sq = obca.obca_terms(
        x, lam, mu, spec.obstacles.A, spec.obstacles.b, spec.ego_g
    )
    c_obca_eq = eq.reshape(-1)
    if spec.signed:
        c_norm = norm_sq - 1.0
    else:
        c_norm = 1.0 - norm_sq          # >= 0 inequality
    c_dist = dist - spec.d_min          # >= 0 inequality

    du = u - u_prev
    lim = spec.du_max * spec.Ts
    # rows: [hi_0, lo_0, hi_1, lo_1] >= 0
    c_rate = jnp.stack(
        [lim[0] - du[0], lim[0] + du[0], lim[1] - du[1], lim[1] + du[1]]
    )

    return jnp.concatenate(
        [c_bc, c_dyn, c_tau[None], c_obca_eq, c_norm, c_dist, c_rate]
    )


def constraint_masks(L: Layout, spec: ProblemSpec):
    """Static-structure masks.

    Returns:
      active [N+1, nc]  — 1.0 where the row exists at that stage
      is_eq  [nc]       — 1.0 equality / 0.0 inequality (where active)
    """
    N, M = L.N, L.M
    nc = L.nc
    dt = spec.x0.dtype
    # Traceable construction (specs may be vmapped batches).
    active = jnp.zeros((N + 1, nc), dt)
    # bc at stages 0 and N.
    active = active.at[0, L.r_bc].set(1.0)
    active = active.at[N, L.r_bc].set(1.0)
    # dynamics for k < N.
    active = active.at[:N, L.r_dyn].set(1.0)
    # tau link: k < N consensus; stage N pin (tau_N = 1) iff fix_time.
    active = active.at[:N, L.i_taulink].set(1.0)
    if spec.fix_time:
        active = active.at[N, L.i_taulink].set(1.0)
    obs_mask = spec.obstacles.obs_mask.astype(dt)
    # OBCA rows masked by obstacle padding (same at every stage).
    eq_mask = jnp.repeat(obs_mask, 2, total_repeat_length=2 * M)
    active = active.at[:, L.r_obca_eq].set(
        jnp.broadcast_to(eq_mask[None, :], (N + 1, 2 * M))
    )
    active = active.at[:, L.r_norm].set(
        jnp.broadcast_to(obs_mask[None, :], (N + 1, M))
    )
    active = active.at[:, L.r_dist].set(
        jnp.broadcast_to(obs_mask[None, :], (N + 1, M))
    )
    # rate rows: stages 0..N-1; input i enabled iff du_max[i] >= 0.
    du_on = (spec.du_max >= 0).astype(dt)
    rate_on = jnp.stack([du_on[0], du_on[0], du_on[1], du_on[1]])
    active = active.at[:N, L.r_rate].set(
        jnp.broadcast_to(rate_on[None, :], (N, 4))
    )

    is_eq = np.zeros((nc,))
    is_eq[L.r_bc] = 1.0
    is_eq[L.r_dyn] = 1.0
    is_eq[L.i_taulink] = 1.0
    is_eq[L.r_obca_eq] = 1.0
    is_eq[L.r_norm] = 1.0 if spec.signed else 0.0
    # dist and rate rows are inequalities.
    return active, jnp.asarray(is_eq, dt)


def stage_aux(L: Layout, W, spec: ProblemSpec):
    """Build aux tuples for all stages from the trajectory W [N+1, nw].

    x_next / tau_next for stage N are dummies (stage-N dyn row is masked;
    tau_next = 1 makes the masked/pinned tau row read (1 - tau_N), which
    is exactly the fix_time pin).
    """
    x = W[:, L.sl_x]
    u = W[:, L.sl_u]
    tau = W[:, L.i_tau]
    one = jnp.ones((1,), W.dtype)
    x_next = jnp.concatenate([x[1:], x[-1:]], axis=0)
    tau_next = jnp.concatenate([tau[1:], one], axis=0)
    u_prev = jnp.concatenate([spec.u_prev[None], u[:-1]], axis=0)
    return x_next, tau_next, u_prev


def all_constraints(L: Layout, W, spec: ProblemSpec):
    """Full constraint residual array [N+1, nc] (unmasked rows included,
    caller applies `active`)."""
    x_next, tau_next, u_prev = stage_aux(L, W, spec)
    ks = jnp.arange(L.N + 1)

    def one(w, xn, tn, up, k):
        return stage_constraints_local(L, w, (xn, tn, up), spec, k)

    return jax.vmap(one)(W, x_next, tau_next, u_prev, ks)


# ---------------------------------------------------------------------------
# Objective.
# ---------------------------------------------------------------------------


def objective(L: Layout, W, spec: ProblemSpec):
    """Reference-shaped objective (SURVEY.md §2.1 'Objective'):

      sum_{k<N} r_u . u_k^2
      + sum_{k=0..N-1} r_du . ((u_k - u_{k-1})/Ts)^2      (u_{-1} = u_prev)
      + (q1 tau + q2 tau^2)      (spread over stages; tau consensus-equal)
      + pin terms (padded duals, dummy u_N)
    """
    N = L.N
    u = W[:, L.sl_u]
    tau = W[:, L.i_tau]
    lam = W[:, L.sl_lam]
    mu = W[:, L.sl_mu]

    # Elementwise, not `** 2 @ r`: a [N, 2] @ [2] dot inside the
    # merit's double vmap gets tile-padded by XLA (see obca.obca_terms).
    c_u = jnp.sum(u[:N] ** 2 * spec.r_u)
    du = jnp.diff(u, axis=0, prepend=spec.u_prev[None])[:N] / spec.Ts
    c_du = jnp.sum(du ** 2 * spec.r_du)
    c_t = jnp.sum(spec.q_time[0] * tau + spec.q_time[1] * tau ** 2) / (N + 1)

    # Pins: padded dual entries and the dummy stage-N input.
    fmask = spec.obstacles.face_mask.reshape(-1)
    omask = jnp.repeat(spec.obstacles.obs_mask, 4, total_repeat_length=4 * L.M)
    pin = (
        jnp.sum((lam ** 2) * (1.0 - fmask)[None, :])
        + jnp.sum((mu ** 2) * (1.0 - omask)[None, :])
        + jnp.sum(u[N] ** 2)
    )
    # Proximal dual selection (see ProblemSpec.w_reg / dual_ref).
    nlam = L.M * L.V
    ref_lam = spec.dual_ref[:, :nlam]
    ref_mu = spec.dual_ref[:, nlam:]
    reg = (
        jnp.sum(((lam - ref_lam) ** 2) * fmask[None, :])
        + jnp.sum(((mu - ref_mu) ** 2) * omask[None, :])
    )
    return c_u + c_du + c_t + 0.5 * PIN_KAPPA * pin + 0.5 * spec.w_reg * reg


def total_lagrangian(L: Layout, W, nu, spec: ProblemSpec, active):
    """f(W) + sum_k nu_k . (active_k * c_k(W)) — reference function for
    derivative tests and for the exact dual-gradient RHS via jax.grad."""
    c = all_constraints(L, W, spec) * active
    return objective(L, W, spec) + jnp.sum(nu * c)


# ---------------------------------------------------------------------------
# Bounds.
# ---------------------------------------------------------------------------


def bound_arrays(L: Layout, spec: ProblemSpec):
    """Elementwise bounds on w entries.

    Returns (lo [nw], hi [nw], has_lo [nw], has_hi [nw], pin [nw]):
    `pin` marks padded dual entries handled by quadratic penalty (no
    barrier).  psi is free; X, Y, v, u, tau are boxed; real lam/mu >= 0.
    """
    dt = spec.x0.dtype
    nw = L.nw
    lo = jnp.full((nw,), -1.0, dt)
    hi = jnp.full((nw,), 1.0, dt)
    has_lo = jnp.zeros((nw,), dt)
    has_hi = jnp.zeros((nw,), dt)

    # x = (X, Y, psi, v)
    lo = lo.at[0].set(spec.xy_lo[0]).at[1].set(spec.xy_lo[1])
    hi = hi.at[0].set(spec.xy_hi[0]).at[1].set(spec.xy_hi[1])
    has_lo = has_lo.at[0].set(1.0).at[1].set(1.0)
    has_hi = has_hi.at[0].set(1.0).at[1].set(1.0)
    lo = lo.at[3].set(spec.v_lo)
    hi = hi.at[3].set(spec.v_hi)
    has_lo = has_lo.at[3].set(1.0)
    has_hi = has_hi.at[3].set(1.0)
    # u
    lo = lo.at[L.sl_u].set(spec.u_lo)
    hi = hi.at[L.sl_u].set(spec.u_hi)
    has_lo = has_lo.at[L.sl_u].set(1.0)
    has_hi = has_hi.at[L.sl_u].set(1.0)
    # tau
    lo = lo.at[L.i_tau].set(spec.tau_lo)
    hi = hi.at[L.i_tau].set(spec.tau_hi)
    has_lo = has_lo.at[L.i_tau].set(1.0)
    has_hi = has_hi.at[L.i_tau].set(1.0)
    # lam >= 0 on real faces, mu >= 0 on real obstacles.
    fmask = spec.obstacles.face_mask.reshape(-1)
    omask = jnp.repeat(
        spec.obstacles.obs_mask, 4, total_repeat_length=4 * L.M
    )
    lo = lo.at[L.sl_lam].set(0.0)
    lo = lo.at[L.sl_mu].set(0.0)
    has_lo = has_lo.at[L.sl_lam].set(fmask)
    has_lo = has_lo.at[L.sl_mu].set(omask)

    pin = jnp.zeros((nw,), dt)
    pin = pin.at[L.sl_lam].set(1.0 - fmask)
    pin = pin.at[L.sl_mu].set(1.0 - omask)
    return lo, hi, has_lo, has_hi, pin


# ---------------------------------------------------------------------------
# KKT block assembly.
# ---------------------------------------------------------------------------


def objective_stage_hessians(L: Layout, spec: ProblemSpec):
    """Analytic Hessian of the (purely quadratic) objective.

    Returns (Hdiag [N+1, nw, nw], Ocross [nw, nw]): the stage-diagonal
    blocks and the constant cross block between u_k and u_{k+1} (rate
    cost), verified against AD in tests/test_nlp.py.
    """
    N = L.N
    dt = spec.x0.dtype
    nw = L.nw
    base = jnp.zeros((nw, nw), dt)

    # tau quadratic (every stage).
    base = base.at[L.i_tau, L.i_tau].add(2.0 * spec.q_time[1] / (N + 1))
    # padded-dual pins + minimum-norm dual regularization.
    _, _, _, _, pin = bound_arrays(L, spec)
    dual_sel = jnp.zeros((nw,), dt)
    dual_sel = dual_sel.at[L.sl_lam].set(1.0)
    dual_sel = dual_sel.at[L.sl_mu].set(1.0)
    base = base + jnp.diag(PIN_KAPPA * pin
                           + spec.w_reg * (dual_sel - pin))

    iu = np.arange(L.sl_u.start, L.sl_u.stop)
    r_u2 = 2.0 * spec.r_u
    r_du2 = 2.0 * spec.r_du / spec.Ts ** 2

    ks = jnp.arange(N + 1)
    in_cost = (ks < N).astype(dt)            # r_u . u^2 stages
    pair_prev = (ks <= N - 1).astype(dt)     # rate pair (k-1, k) at stage k
    pair_next = (ks <= N - 2).astype(dt)     # rate pair (k, k+1)
    dummy = (ks == N).astype(dt)             # u_N pin

    def per_stage(icost, pprev, pnext, dum):
        H = base
        d_u = (
            icost * r_u2
            + (pprev + pnext) * r_du2
            + dum * PIN_KAPPA * jnp.ones((2,), dt)
        )
        H = H.at[iu, iu].add(d_u)
        return H

    Hdiag = jax.vmap(per_stage)(in_cost, pair_prev, pair_next, dummy)

    Ocross = jnp.zeros((nw, nw), dt)
    Ocross = Ocross.at[iu, iu].add(-r_du2)
    return Hdiag, Ocross


def objective_gradient(L: Layout, W, spec: ProblemSpec):
    return jax.grad(lambda Wf: objective(L, Wf, spec))(W)


def constraint_blocks(L: Layout, W, nu, spec: ProblemSpec,
                      c_fn=None):
    """Per-stage constraint Jacobians J [N+1, nc, nw] and multiplier-
    weighted constraint Hessians Hc [N+1, nw, nw] via per-stage AD.

    `c_fn(L, w, aux, spec, k)` defaults to this module's parking-problem
    stage constraints; other problem families (`obca_tpu.nav`) pass
    their own while reusing the identical block structure."""
    c_fn = c_fn or stage_constraints_local
    x_next, tau_next, u_prev = stage_aux(L, W, spec)
    ks = jnp.arange(L.N + 1)

    def c_local(w, xn, tn, up, k):
        return c_fn(L, w, (xn, tn, up), spec, k)

    def jac_one(w, xn, tn, up, k):
        return jax.jacfwd(c_local)(w, xn, tn, up, k)

    def hess_one(w, nu_k, xn, tn, up, k):
        scalar = lambda ww: jnp.dot(nu_k, c_local(ww, xn, tn, up, k))
        return jax.hessian(scalar)(w)

    J = jax.vmap(jac_one)(W, x_next, tau_next, u_prev, ks)
    Hc = jax.vmap(hess_one)(W, nu, x_next, tau_next, u_prev, ks)
    return J, Hc


def coupling_block(L: Layout, spec: ProblemSpec, active):
    """The constant off-diagonal KKT blocks E_k = T[zeta_k, zeta_{k+1}],
    k = 0..N-1, shape [N, nz, nz] (identical up to edge masking).

    Nonzeros (all constant — see module docstring):
      (nu_k dyn rows,  w_{k+1} x cols)   = I4
      (nu_k tau row,   w_{k+1} tau col)  = 1
      (w_k u rows,     nu_{k+1} rate cols) = [-1, +1] per input
      (w_k u rows,     w_{k+1} u cols)   = -2 r_du / Ts^2   (rate cost)
    """
    dt = spec.x0.dtype
    nw, nc, nz = L.nw, L.nc, L.nz
    E = jnp.zeros((nz, nz), dt)

    # nu rows sit after w rows inside a stage block.
    dyn_rows = nw + np.arange(L.r_dyn.start, L.r_dyn.stop)
    x_cols = np.arange(0, 4)
    E = E.at[dyn_rows, x_cols].set(1.0)
    if not L.fix_time:
        # Free-time consensus row tau_{k+1} - tau_k couples stages;
        # fixed-time uses local tau pins (no coupling).
        E = E.at[nw + L.i_taulink, L.i_tau].set(1.0)

    iu = np.arange(L.sl_u.start, L.sl_u.stop)
    rate_cols = nw + np.arange(L.r_rate.start, L.r_rate.stop)
    # c_rate_{k+1} = [lim - du0, lim + du0, lim - du1, lim + du1],
    # du = u_{k+1} - u_k  =>  d c / d u_k = [+1, -1] per input.
    rate_sign = jnp.asarray([1.0, -1.0, 1.0, -1.0], dt)
    rate_in = np.array([0, 0, 1, 1])
    du_on = (spec.du_max >= 0).astype(dt)
    E = E.at[iu[rate_in], rate_cols].set(rate_sign * du_on[rate_in])

    r_du2 = 2.0 * spec.r_du / spec.Ts ** 2
    E = E.at[iu, iu].add(-r_du2)

    # Edge masking: E_{N-1} has no rate/rate-cost coupling (stage N is the
    # dummy-input stage) — zero those entries in the last block.
    ks = jnp.arange(L.N)
    last = (ks == L.N - 1).astype(dt)

    E_last_fix = jnp.zeros((nz, nz), dt)
    E_last_fix = E_last_fix.at[iu[rate_in], rate_cols].set(
        rate_sign * du_on[rate_in]
    )
    E_last_fix = E_last_fix.at[iu, iu].add(-r_du2)

    return E[None] - last[:, None, None] * E_last_fix[None]


def coupling_structure(L: Layout):
    """Static sparsity of the constant off-diagonal block E
    (:func:`coupling_block`): E has ~11 nonzeros of nz^2 — dynamics
    identity (4), free-time tau link (1), rate rows (4), rate-cost
    cross term (2).  The hot path never materializes the dense E: the
    Ruiz scaling, the GCR matvec, and the Pallas kernels all work on
    `(rows, cols, values)` directly (the round-3 traffic fix: dense E
    streams were ~half the per-iteration HBM bytes).

    Returns (rows [nnz], cols [nnz]) as static numpy int arrays.
    """
    nw = L.nw
    rows, cols = [], []
    # dynamics: (nu_k dyn rows, w_{k+1} x cols) = I4
    for i in range(4):
        rows.append(nw + L.r_dyn.start + i)
        cols.append(i)
    # free-time tau consensus row (value 0 when fix_time).
    rows.append(nw + L.i_taulink)
    cols.append(L.i_tau)
    # rate rows: (w_k u rows, nu_{k+1} rate cols).
    iu = [L.sl_u.start, L.sl_u.start + 1]
    rate_in = [0, 0, 1, 1]
    for j in range(4):
        rows.append(iu[rate_in[j]])
        cols.append(nw + L.r_rate.start + j)
    # rate-cost cross term: (u_k, u_{k+1}) diagonal.
    for i in range(2):
        rows.append(iu[i])
        cols.append(iu[i])
    return np.asarray(rows), np.asarray(cols)


def coupling_values(L: Layout, spec: ProblemSpec):
    """Values of E at :func:`coupling_structure` positions, [N, nnz].
    Identical content to `coupling_block` (asserted in tests)."""
    dt = spec.x0.dtype
    one = jnp.ones((), dt)
    du_on = (spec.du_max >= 0).astype(dt)
    rate_sign = jnp.asarray([1.0, -1.0, 1.0, -1.0], dt)
    rate_in = np.array([0, 0, 1, 1])
    r_du2 = 2.0 * spec.r_du / spec.Ts ** 2
    vals = jnp.concatenate([
        jnp.ones((4,), dt),                       # dynamics I4
        (jnp.zeros((), dt) if L.fix_time else one)[None],
        rate_sign * du_on[rate_in],               # rate rows
        -r_du2,                                   # rate cost
    ])
    # Edge masking: stage N-1 keeps only the dynamics/tau entries.
    ks = jnp.arange(L.N)
    last = (ks == L.N - 1).astype(dt)[:, None]
    edge = jnp.concatenate([jnp.ones((5,), dt), jnp.zeros((6,), dt)])
    return vals[None, :] * (1.0 - last * (1.0 - edge[None, :]))


def assemble_kkt_structured(L: Layout, W, nu, sigma_w, sigma_c, rhs_w,
                            rhs_c, spec: ProblemSpec, active, delta_w):
    """Hot-path KKT assembly: like :func:`assemble_kkt` but returns the
    coupling as sparse values `(K, e_vals [N, nnz], rhs)` — the dense E
    is never built."""
    K, rhs = _assemble_k_rhs(L, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                             spec, active, delta_w)
    return K, coupling_values(L, spec), rhs


def constraint_blocks_analytic(L: Layout, W, nu, spec: ProblemSpec):
    """Hand-structured constraint Jacobians/Hessians (SURVEY.md §2.2
    C11): identical output to :func:`constraint_blocks` (the AD
    reference, kept for tests), ~20-50x cheaper on TPU because the only
    AD left is over the 7 dynamics inputs (x, u, tau) — everything else
    (OBCA dual rows, norm, dist, bc, tau-link, rate) is written as
    closed-form sparse blocks assembled with vectorized scatters.
    """
    from obca_tpu.geometry import EGO_G, rotation

    Np1, nw, nc = L.N + 1, L.nw, L.nc
    M, V = L.M, L.V
    dt = W.dtype
    x = W[:, L.sl_x]                         # [K, 4]
    lam = W[:, L.sl_lam].reshape(Np1, M, V)  # [K, M, V]
    psi = x[:, 2]
    t = x[:, :2]
    A = spec.obstacles.A                     # [M, V, 2]
    b = spec.obstacles.b                     # [M, V]
    G = jnp.asarray(EGO_G, dt)               # [4, 2]
    sgn = 1.0 if spec.signed else -1.0       # c_norm = sgn*(norm_sq - 1)

    cth, sth = jnp.cos(psi), jnp.sin(psi)
    # R = [[c, -s], [s, c]]; R_p = dR/dpsi; R_pp = -R.
    R = jnp.stack([jnp.stack([cth, -sth], -1),
                   jnp.stack([sth, cth], -1)], -2)          # [K, 2, 2]
    R_p = jnp.stack([jnp.stack([-sth, -cth], -1),
                     jnp.stack([cth, -sth], -1)], -2)

    s = jnp.einsum("mvd,kmv->kmd", A, lam)                  # A'lam [K,M,2]
    Rt_s = jnp.einsum("kde,kmd->kme", R, s)                 # R's   [K,M,2]
    Rpt_s = jnp.einsum("kde,kmd->kme", R_p, s)              # R_p's
    Rt_A = jnp.einsum("kde,mvd->kmve", R, A)                # R'a_v [K,M,V,2]
    Rpt_A = jnp.einsum("kde,mvd->kmve", R_p, A)

    # ---- Jacobian -------------------------------------------------------
    J = jnp.zeros((Np1, nc, nw), dt)
    i_bc = np.arange(L.r_bc.start, L.r_bc.stop)
    J = J.at[:, i_bc, i_bc].set(1.0)

    # Dynamics rows: c = x_next - f(x, u, tau) -> -df/d(x,u,tau),
    # via AD over just the 7 dynamics inputs (cheap, exact).  Fixed-time
    # dynamics use constant tau = 1 (see stage_constraints_local).
    def f7(z):
        tau_eff = jnp.ones((), dt) if L.fix_time else z[6]
        return dynamics.step(z[:4], z[4:6], tau_eff, spec.Ts,
                             spec.wheelbase)

    Jf = jax.vmap(jax.jacfwd(f7))(W[:, :7])                 # [K, 4, 7]
    J = J.at[:, L.r_dyn, :7].set(-Jf)
    # Fixed-time: local pin tau - 1 (d/dtau = +1); free-time consensus
    # tau_next - tau (d/dtau = -1).
    J = J.at[:, L.i_taulink, L.i_tau].set(
        1.0 if L.fix_time else -1.0)

    # OBCA equality rows (m-major pairs): d/dpsi, d/dlam, d/dmu.
    eq0 = L.r_obca_eq.start
    eq_rows = eq0 + np.arange(2 * M)                        # [2M]
    J = J.at[:, eq_rows, 2].set(Rpt_s.reshape(Np1, 2 * M))
    lam0 = L.sl_lam.start
    # rows (m, d) x cols lam (m, v): block-diagonal in m.
    rr = (eq0 + 2 * np.arange(M)[:, None, None]
          + np.arange(2)[None, :, None])                    # [M, 2, 1]
    cc = (lam0 + V * np.arange(M)[:, None, None]
          + np.arange(V)[None, None, :])                    # [M, 1, V]
    J = J.at[:, jnp.broadcast_to(rr, (M, 2, V)),
             jnp.broadcast_to(cc, (M, 2, V))].set(
        jnp.swapaxes(Rt_A, -1, -2))                         # [K, M, 2, V]
    mu0 = L.sl_mu.start
    rm = (eq0 + 2 * np.arange(M)[:, None, None]
          + np.arange(2)[None, :, None])
    cm = (mu0 + 4 * np.arange(M)[:, None, None]
          + np.arange(4)[None, None, :])
    J = J.at[:, jnp.broadcast_to(rm, (M, 2, 4)),
             jnp.broadcast_to(cm, (M, 2, 4))].set(
        jnp.broadcast_to(G.T[None, None], (Np1, M, 2, 4)))

    # Norm rows: d/dlam(m,v) = sgn * 2 (a_v . s_m).
    n0 = L.r_norm.start
    rn = (n0 + np.arange(M))[:, None]                       # [M, 1]
    cn = (lam0 + V * np.arange(M)[:, None] + np.arange(V)[None, :])
    J = J.at[:, rn, cn].set(
        sgn * 2.0 * jnp.einsum("mvd,kmd->kmv", A, s))
    # Dist rows: d/dt = s_m, d/dlam = a_v.t - b_v, d/dmu = -g.
    d0 = L.r_dist.start
    rd = (d0 + np.arange(M))[:, None]
    J = J.at[:, rd[:, 0], 0].set(s[..., 0])
    J = J.at[:, rd[:, 0], 1].set(s[..., 1])
    face_val = jnp.einsum("mvd,kd->kmv", A, t) - b[None]    # [K, M, V]
    J = J.at[:, rd, cn].set(face_val)
    cmu = (mu0 + 4 * np.arange(M)[:, None] + np.arange(4)[None, :])
    J = J.at[:, rd, cmu].set(
        jnp.broadcast_to(-spec.ego_g[None, None], (Np1, M, 4)))

    # Rate rows: [lim - du0, lim + du0, lim - du1, lim + du1],
    # du = u - u_prev -> d/du = [-1, +1] per input.
    g0 = L.r_rate.start
    iu = np.arange(L.sl_u.start, L.sl_u.stop)
    J = J.at[:, g0 + np.arange(4),
             iu[np.array([0, 0, 1, 1])]].set(
        jnp.asarray([-1.0, 1.0, -1.0, 1.0], dt))

    # ---- nu-weighted constraint Hessian --------------------------------
    nu_dyn = nu[:, L.r_dyn]                                 # [K, 4]
    nu_eq = nu[:, L.r_obca_eq].reshape(Np1, M, 2)
    nu_nrm = nu[:, L.r_norm]                                # [K, M]
    nu_dst = nu[:, L.r_dist]

    def hess7(z, nu4):
        return jax.hessian(lambda zz: jnp.dot(nu4, f7(zz)))(z)

    H7 = -jax.vmap(hess7)(W[:, :7], nu_dyn)                 # [K, 7, 7]
    Hc = jnp.zeros((Np1, nw, nw), dt)
    Hc = Hc.at[:, :7, :7].set(H7)

    # eq rows: psi-psi (R_pp = -R) and psi-lam cross terms.
    Hc = Hc.at[:, 2, 2].add(-jnp.einsum("kmd,kmd->k", nu_eq, Rt_s))
    h_psilam = jnp.einsum("kmd,kmvd->kmv", nu_eq, Rpt_A)    # [K, M, V]
    flat = h_psilam.reshape(Np1, M * V)
    lam_cols = lam0 + np.arange(M * V)
    Hc = Hc.at[:, 2, lam_cols].add(flat)
    Hc = Hc.at[:, lam_cols, 2].add(flat)
    # norm rows: 2*sgn*nu_m * A A' per obstacle (block-diag in m).
    AAt = jnp.einsum("mvd,mwd->mvw", A, A)                  # [M, V, V]
    h_ll = 2.0 * sgn * nu_nrm[..., None, None] * AAt[None]  # [K, M, V, V]
    rl = (lam0 + V * np.arange(M)[:, None, None]
          + np.arange(V)[None, :, None])                    # [M, V, 1]
    cl = (lam0 + V * np.arange(M)[:, None, None]
          + np.arange(V)[None, None, :])                    # [M, 1, V]
    Hc = Hc.at[:, jnp.broadcast_to(rl, (M, V, V)),
               jnp.broadcast_to(cl, (M, V, V))].add(h_ll)
    # dist rows: t-lam cross terms nu_m * a_v.
    h_tl = nu_dst[..., None, None] * A[None]                # [K, M, V, 2]
    for d in range(2):
        h_d = h_tl[..., d].reshape(Np1, M * V)
        Hc = Hc.at[:, d, lam_cols].add(h_d)
        Hc = Hc.at[:, lam_cols, d].add(h_d)
    return J, Hc


def default_init(spec: ProblemSpec, dtype=None):
    """Cold-start warm start for the parking problem: interpolated
    states + geometric duals (SURVEY.md §2.2 C8)."""
    from obca_tpu.warmstart import geometric

    return geometric.warm_start(spec, dtype=dtype)


def _assemble_k_rhs(L: Layout, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                    spec: ProblemSpec, active, delta_w):
    """Diagonal blocks + RHS (shared by the dense and structured
    assemblers)."""
    J, Hc = constraint_blocks_analytic(L, W, nu * active, spec)
    Hobj, _ = objective_stage_hessians(L, spec)
    Jm = J * active[:, :, None]

    H = Hobj + Hc + jax.vmap(jnp.diag)(sigma_w)
    H = H + delta_w[..., None, None] * jnp.eye(L.nw, dtype=W.dtype)

    # Assemble the [nz, nz] blocks with concatenates, NOT `.at[].set`
    # on a zeros array: each block-set lowers to a dynamic-update-slice
    # that rewrites the whole 130 MB K buffer — three of them were
    # ~2 ms of the r4 per-iteration device trace.  A nested
    # concatenate is one fused write.
    top = jnp.concatenate([H, jnp.swapaxes(Jm, -1, -2)], axis=-1)
    bot = jnp.concatenate([Jm, jax.vmap(jnp.diag)(sigma_c)], axis=-1)
    K = jnp.concatenate([top, bot], axis=-2)

    rhs = jnp.concatenate([rhs_w, rhs_c], axis=-1)
    return K, rhs


def assemble_kkt(L: Layout, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                 spec: ProblemSpec, active, delta_w):
    """Assemble the per-stage KKT diagonal blocks and RHS.

    Args:
      W        [N+1, nw]   primal iterate
      nu       [N+1, nc]   constraint multipliers
      sigma_w  [N+1, nw]   diagonal primal terms (bound barrier Sigma)
      sigma_c  [N+1, nc]   diagonal dual terms (negative: -delta_c for
                           equalities, -(s/y) - delta_c for inequalities,
                           -1 for masked rows)
      rhs_w    [N+1, nw]   negative dual residual (-r_w)
      rhs_c    [N+1, nc]   negative primal residual rows
    Returns (K [N+1, nz, nz], E [N, nz, nz], rhs [N+1, nz]).
    """
    K, rhs = _assemble_k_rhs(L, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                             spec, active, delta_w)
    E = coupling_block(L, spec, active)
    return K, E, rhs
