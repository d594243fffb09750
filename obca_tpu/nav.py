"""Point-mass navigation OBCA problem (the reference's quadcopter-nav
example — SURVEY.md §2.2 C5, §3.3).

The reference ships a second, simpler OCP family alongside parking: a
point mass navigating convex obstacles with the *distance* variant of
the dual reformulation and lambda-only duals (no ego polytope, so no mu
and no rotation-equality rows):

    dist(p, O_m) >= d_min  <=>  exists lam_m >= 0:
        (A_m p - b_m)' lam_m >= d_min,   ||A_m' lam_m||_2 <= 1

This module implements the same stage-structured NLP interface as
:mod:`obca_tpu.nlp` (the parking problem) so the whole batched
interior-point stack — `ipm.solve_single(spec, cfg, prob=nav)`,
blocktri KKT solves, vmapped scenario sweeps, shard_map scale-out —
is shared verbatim.  Stage layout (indices deliberately mirror the
parking layout so all constant-coupling machinery is reused):

  w_k = [p(2) v(2) | u(2) | tau(1) | lam(M*V)]          nw = 7 + M*V
  c_k = [bc(4) dyn(4) taulink(1) norm(M) dist(M) rate(4)]  nc = 13 + 2M

Dynamics: 2-D double integrator (midpoint Euler, optional free-time
scaling tau, matching the parking discretization style):

    p+ = p + tau*Ts * (v + tau*Ts/2 * a),   v+ = v + tau*Ts * a
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import nlp, obca
from obca_tpu.spec import Obstacles, obstacles_from_vertices, _register

PIN_KAPPA = nlp.PIN_KAPPA

_META = ("N", "fix_time", "max_obs", "max_faces")


@partial(_register, meta_fields=_META)
@dataclasses.dataclass(frozen=True)
class NavSpec:
    """One point-mass navigation instance (state x = (X, Y, vx, vy),
    input u = (ax, ay)).  Field names shared with ProblemSpec wherever
    the generic solver machinery touches them (Ts, du_max, u_prev, r_u,
    r_du, q_time, w_reg, dual_ref, tau bounds)."""

    x0: jax.Array                 # [4] (X, Y, vx, vy)
    xF: jax.Array                 # [4]
    Ts: jax.Array                 # []
    obstacles: Obstacles
    u_lo: jax.Array               # [2] accel bounds
    u_hi: jax.Array               # [2]
    v_lo: jax.Array               # [2] velocity bounds
    v_hi: jax.Array               # [2]
    xy_lo: jax.Array              # [2]
    xy_hi: jax.Array              # [2]
    du_max: jax.Array             # [2] accel-rate bound (< 0 disables)
    u_prev: jax.Array             # [2]
    d_min: jax.Array              # []
    r_u: jax.Array                # [2]
    r_du: jax.Array               # [2]
    q_time: jax.Array             # [2]
    w_reg: jax.Array              # []
    dual_ref: jax.Array           # [N+1, M*V]
    tau_lo: jax.Array             # []
    tau_hi: jax.Array             # []
    N: int = 60
    fix_time: bool = True
    max_obs: int = 4
    max_faces: int = 4


@dataclasses.dataclass(frozen=True)
class NavLayout:
    """Static index layout (API-compatible subset of nlp.Layout)."""

    N: int
    M: int
    V: int
    fix_time: bool

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
        # No ego-face duals in the point-mass variant; empty slice keeps
        # the generic solver's dual_ref concatenation valid.
        return slice(7 + self.M * self.V, 7 + self.M * self.V)

    @property
    def nw(self):
        return 7 + self.M * self.V

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
    def r_norm(self):
        return slice(9, 9 + self.M)

    @property
    def r_dist(self):
        return slice(9 + self.M, 9 + 2 * self.M)

    @property
    def r_rate(self):
        return slice(9 + 2 * self.M, 13 + 2 * self.M)

    @property
    def nc(self):
        return 13 + 2 * self.M

    @property
    def nz(self):
        return self.nw + self.nc


def layout_of(spec: NavSpec) -> NavLayout:
    return NavLayout(N=spec.N, M=spec.max_obs, V=spec.max_faces,
                     fix_time=spec.fix_time)


def point_step(x, u, tau, Ts):
    """Double-integrator step (midpoint Euler, free-time scaling tau)."""
    p, v = x[:2], x[2:]
    h = tau * Ts
    return jnp.concatenate([p + h * (v + 0.5 * h * u), v + h * u])


def rollout(x0, U, tau, Ts):
    def body(x, u):
        xn = point_step(x, u, tau, Ts)
        return xn, xn

    _, xs = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None], xs], axis=0)


# ---------------------------------------------------------------------------
# Stage constraints (same aux convention as the parking problem, so
# nlp.stage_aux / nlp.constraint_blocks are reused directly).
# ---------------------------------------------------------------------------


def stage_constraints_local(L: NavLayout, w, aux, spec: NavSpec, k):
    x = w[L.sl_x]
    u = w[L.sl_u]
    tau = w[L.i_tau]
    lam = w[L.sl_lam].reshape(L.M, L.V)
    x_next, tau_next, u_prev = aux
    dt = w.dtype

    is0 = (k == 0).astype(dt)
    c_bc = x - (is0 * spec.x0 + (1.0 - is0) * spec.xF)
    if spec.fix_time:
        # Local tau pin + constant-tau dynamics (see nlp module: the
        # consensus-chain formulation is numerically degenerate).
        c_dyn = x_next - point_step(x, u, jnp.ones((), dt), spec.Ts)
        c_tau = tau - 1.0
    else:
        c_dyn = x_next - point_step(x, u, tau, spec.Ts)
        c_tau = tau_next - tau

    dist, norm_sq = obca.point_obca_terms(
        x[:2], lam, spec.obstacles.A, spec.obstacles.b
    )
    c_norm = 1.0 - norm_sq              # >= 0 (distance variant)
    c_dist = dist - spec.d_min          # >= 0

    du = u - u_prev
    lim = spec.du_max * spec.Ts
    c_rate = jnp.stack(
        [lim[0] - du[0], lim[0] + du[0], lim[1] - du[1], lim[1] + du[1]]
    )
    return jnp.concatenate([c_bc, c_dyn, c_tau[None], c_norm, c_dist,
                            c_rate])


def all_constraints(L: NavLayout, W, spec: NavSpec):
    x_next, tau_next, u_prev = nlp.stage_aux(L, W, spec)
    ks = jnp.arange(L.N + 1)
    return jax.vmap(
        lambda w, xn, tn, up, k:
        stage_constraints_local(L, w, (xn, tn, up), spec, k)
    )(W, x_next, tau_next, u_prev, ks)


def constraint_masks(L: NavLayout, spec: NavSpec):
    N, M = L.N, L.M
    dt = spec.x0.dtype
    active = jnp.zeros((N + 1, L.nc), dt)
    active = active.at[0, L.r_bc].set(1.0)
    active = active.at[N, L.r_bc].set(1.0)
    active = active.at[:N, L.r_dyn].set(1.0)
    active = active.at[:N, L.i_taulink].set(1.0)
    if spec.fix_time:
        active = active.at[N, L.i_taulink].set(1.0)
    obs_mask = spec.obstacles.obs_mask.astype(dt)
    active = active.at[:, L.r_norm].set(
        jnp.broadcast_to(obs_mask[None, :], (N + 1, M))
    )
    active = active.at[:, L.r_dist].set(
        jnp.broadcast_to(obs_mask[None, :], (N + 1, M))
    )
    du_on = (spec.du_max >= 0).astype(dt)
    rate_on = jnp.stack([du_on[0], du_on[0], du_on[1], du_on[1]])
    active = active.at[:N, L.r_rate].set(
        jnp.broadcast_to(rate_on[None, :], (N, 4))
    )

    is_eq = np.zeros((L.nc,))
    is_eq[L.r_bc] = 1.0
    is_eq[L.r_dyn] = 1.0
    is_eq[L.i_taulink] = 1.0
    # norm / dist / rate rows are inequalities (distance variant).
    return active, jnp.asarray(is_eq, dt)


def bound_arrays(L: NavLayout, spec: NavSpec):
    dt = spec.x0.dtype
    nw = L.nw
    lo = jnp.full((nw,), -1.0, dt)
    hi = jnp.full((nw,), 1.0, dt)
    has_lo = jnp.zeros((nw,), dt)
    has_hi = jnp.zeros((nw,), dt)

    lo = lo.at[0].set(spec.xy_lo[0]).at[1].set(spec.xy_lo[1])
    hi = hi.at[0].set(spec.xy_hi[0]).at[1].set(spec.xy_hi[1])
    lo = lo.at[2].set(spec.v_lo[0]).at[3].set(spec.v_lo[1])
    hi = hi.at[2].set(spec.v_hi[0]).at[3].set(spec.v_hi[1])
    has_lo = has_lo.at[:4].set(1.0)
    has_hi = has_hi.at[:4].set(1.0)
    lo = lo.at[L.sl_u].set(spec.u_lo)
    hi = hi.at[L.sl_u].set(spec.u_hi)
    has_lo = has_lo.at[L.sl_u].set(1.0)
    has_hi = has_hi.at[L.sl_u].set(1.0)
    lo = lo.at[L.i_tau].set(spec.tau_lo)
    hi = hi.at[L.i_tau].set(spec.tau_hi)
    has_lo = has_lo.at[L.i_tau].set(1.0)
    has_hi = has_hi.at[L.i_tau].set(1.0)
    fmask = spec.obstacles.face_mask.reshape(-1)
    lo = lo.at[L.sl_lam].set(0.0)
    has_lo = has_lo.at[L.sl_lam].set(fmask)

    pin = jnp.zeros((nw,), dt)
    pin = pin.at[L.sl_lam].set(1.0 - fmask)
    return lo, hi, has_lo, has_hi, pin


# ---------------------------------------------------------------------------
# Objective (same family as the parking objective, minus mu terms).
# ---------------------------------------------------------------------------


def objective(L: NavLayout, W, spec: NavSpec):
    N = L.N
    u = W[:, L.sl_u]
    tau = W[:, L.i_tau]
    lam = W[:, L.sl_lam]

    c_u = jnp.sum(u[:N] ** 2 @ spec.r_u)
    du = jnp.diff(u, axis=0, prepend=spec.u_prev[None])[:N] / spec.Ts
    c_du = jnp.sum(du ** 2 @ spec.r_du)
    c_t = jnp.sum(spec.q_time[0] * tau + spec.q_time[1] * tau ** 2) / (N + 1)

    fmask = spec.obstacles.face_mask.reshape(-1)
    pin = (jnp.sum((lam ** 2) * (1.0 - fmask)[None, :])
           + jnp.sum(u[N] ** 2))
    reg = jnp.sum(((lam - spec.dual_ref) ** 2) * fmask[None, :])
    return c_u + c_du + c_t + 0.5 * PIN_KAPPA * pin + 0.5 * spec.w_reg * reg


def total_lagrangian(L: NavLayout, W, nu, spec: NavSpec, active):
    c = all_constraints(L, W, spec) * active
    return objective(L, W, spec) + jnp.sum(nu * c)


def objective_stage_hessians(L: NavLayout, spec: NavSpec):
    """Analytic Hessian of the (quadratic) nav objective — mirrors
    nlp.objective_stage_hessians with lambda-only dual terms."""
    N = L.N
    dt = spec.x0.dtype
    nw = L.nw
    base = jnp.zeros((nw, nw), dt)
    base = base.at[L.i_tau, L.i_tau].add(2.0 * spec.q_time[1] / (N + 1))
    _, _, _, _, pin = bound_arrays(L, spec)
    dual_sel = jnp.zeros((nw,), dt).at[L.sl_lam].set(1.0)
    base = base + jnp.diag(PIN_KAPPA * pin
                           + spec.w_reg * (dual_sel - pin))

    iu = np.arange(L.sl_u.start, L.sl_u.stop)
    r_u2 = 2.0 * spec.r_u
    r_du2 = 2.0 * spec.r_du / spec.Ts ** 2

    ks = jnp.arange(N + 1)
    in_cost = (ks < N).astype(dt)
    pair_prev = (ks <= N - 1).astype(dt)
    pair_next = (ks <= N - 2).astype(dt)
    dummy = (ks == N).astype(dt)

    def per_stage(icost, pprev, pnext, dum):
        d_u = (icost * r_u2 + (pprev + pnext) * r_du2
               + dum * PIN_KAPPA * jnp.ones((2,), dt))
        return base.at[iu, iu].add(d_u)

    Hdiag = jax.vmap(per_stage)(in_cost, pair_prev, pair_next, dummy)
    Ocross = jnp.zeros((nw, nw), dt).at[iu, iu].add(-r_du2)
    return Hdiag, Ocross


def assemble_kkt(L: NavLayout, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                 spec: NavSpec, active, delta_w):
    """Stage-wise KKT blocks; identical structure to the parking
    problem's (nlp.assemble_kkt), with nav constraint derivatives."""
    J, Hc = nlp.constraint_blocks(L, W, nu * active, spec,
                                  c_fn=stage_constraints_local)
    Hobj, _ = objective_stage_hessians(L, spec)
    Jm = J * active[:, :, None]

    H = Hobj + Hc + jax.vmap(jnp.diag)(sigma_w)
    H = H + delta_w[..., None, None] * jnp.eye(L.nw, dtype=W.dtype)

    nzs = L.nz
    Np1 = L.N + 1
    K = jnp.zeros((Np1, nzs, nzs), W.dtype)
    K = K.at[:, : L.nw, : L.nw].set(H)
    K = K.at[:, L.nw:, : L.nw].set(Jm)
    K = K.at[:, : L.nw, L.nw:].set(jnp.swapaxes(Jm, -1, -2))
    K = K.at[:, L.nw:, L.nw:].set(jax.vmap(jnp.diag)(sigma_c))

    # The constant inter-stage coupling (dynamics identity, tau link,
    # rate rows + rate-cost cross term) has the same index structure as
    # the parking problem; reuse its assembly.
    E = nlp.coupling_block(L, spec, active)
    rhs = jnp.concatenate([rhs_w, rhs_c], axis=-1)
    return K, E, rhs


def coupling_structure(L: NavLayout):
    """Same constant-coupling sparsity as the parking problem."""
    return nlp.coupling_structure(L)


def assemble_kkt_structured(L: NavLayout, W, nu, sigma_w, sigma_c,
                            rhs_w, rhs_c, spec: NavSpec, active,
                            delta_w):
    """Hot-path assembly: K/rhs as :func:`assemble_kkt`, coupling as
    sparse values (the dense E is never built)."""
    K, _, rhs = assemble_kkt(L, W, nu, sigma_w, sigma_c, rhs_w, rhs_c,
                             spec, active, delta_w)
    return K, nlp.coupling_values(L, spec), rhs


# ---------------------------------------------------------------------------
# Warm start.
# ---------------------------------------------------------------------------


def default_init(spec: NavSpec, dtype=None):
    """Interpolated positions + consistent velocities + geometric
    lambda warm start (one-hot on the most-separating face — the
    point-mass analog of the reference's DualMultWS, SURVEY.md §2.2 C8)."""
    dt = dtype or spec.x0.dtype
    L = layout_of(spec)
    N = L.N
    alpha = jnp.linspace(0.0, 1.0, N + 1, dtype=dt)[:, None]
    P = (1.0 - alpha) * spec.x0[None, :2] + alpha * spec.xF[None, :2]
    V = jnp.diff(P, axis=0) / spec.Ts
    V = jnp.concatenate([V, V[-1:]], axis=0)
    X = jnp.concatenate([P, V.astype(dt)], axis=-1)

    A = spec.obstacles.A
    fm = spec.obstacles.face_mask
    om = spec.obstacles.obs_mask
    eps = 1e-2

    def lam_of(p):
        face_val = jnp.einsum("mvd,d->mv", A, p) - spec.obstacles.b
        face_val = jnp.where(fm > 0, face_val, -1e9)
        i_star = jnp.argmax(face_val, axis=-1)
        lam = jax.nn.one_hot(i_star, A.shape[1], dtype=p.dtype) * fm
        # Scale to strict norm-inequality interior (||A'lam|| <= 1).
        return (0.9 * lam + eps) * fm * om[:, None]

    lam = jax.vmap(lam_of)(P.astype(dt))
    W = jnp.zeros((N + 1, L.nw), dt)
    W = W.at[:, L.sl_x].set(X.astype(dt))
    W = W.at[:, L.i_tau].set(1.0)
    W = W.at[:, L.sl_lam].set(lam.reshape(N + 1, -1))
    return W


# ---------------------------------------------------------------------------
# Canonical scenario (reference quadcopter-nav shaped: fly from start
# to goal through a slalom of convex obstacles).
# ---------------------------------------------------------------------------


def nav_spec(x0=(-8.0, 0.0, 0.0, 0.0), xF=(8.0, 0.0, 0.0, 0.0),
             vertex_lists=None, N=60, Ts=0.25, d_min=0.2,
             fix_time=True, max_obs=4, max_faces=4,
             dtype=jnp.float64) -> NavSpec:
    """Build a point-mass navigation instance.  Default scenario: two
    staggered boxes forcing an S-shaped path (the planar analog of the
    reference quadcopter example's obstacle course)."""
    if vertex_lists is None:
        vertex_lists = [
            [(-4.0, -6.0), (-2.0, -6.0), (-2.0, 1.5), (-4.0, 1.5)],
            [(2.0, -1.5), (4.0, -1.5), (4.0, 6.0), (2.0, 6.0)],
        ]
    obstacles = obstacles_from_vertices(
        vertex_lists, max_obs=max_obs, max_faces=max_faces, dtype=dtype
    )
    arr = lambda v: jnp.asarray(v, dtype)
    return NavSpec(
        x0=arr(x0), xF=arr(xF), Ts=arr(Ts), obstacles=obstacles,
        u_lo=arr([-1.0, -1.0]), u_hi=arr([1.0, 1.0]),
        v_lo=arr([-3.0, -3.0]), v_hi=arr([3.0, 3.0]),
        xy_lo=arr([-12.0, -8.0]), xy_hi=arr([12.0, 8.0]),
        du_max=arr([-1.0, -1.0]),      # rate bound disabled by default
        u_prev=arr([0.0, 0.0]),
        d_min=arr(d_min),
        # Mild rate/time quadratics keep every primal variable positively
        # curved — the fixed-order quasidefinite elimination needs
        # nonvanishing primal pivots (zero tau/u-rate curvature makes the
        # stage blocks near-singular and the Newton directions garbage).
        r_u=arr([0.5, 0.5]), r_du=arr([0.05, 0.05]),
        q_time=arr([0.1, 0.5]),
        w_reg=arr(1e-2),
        dual_ref=jnp.zeros((N + 1, max_obs * max_faces), dtype),
        tau_lo=arr(0.2), tau_hi=arr(3.0),
        N=N, fix_time=fix_time, max_obs=max_obs, max_faces=max_faces,
    )


def solve(spec: NavSpec, cfg=None, W0=None):
    """Convenience wrapper: ipm.solve_single with this problem module."""
    from obca_tpu.solver import ipm
    from obca_tpu.spec import SolverConfig

    return ipm.solve_single(spec, cfg or SolverConfig(), W0, prob=_self())


def _self():
    import obca_tpu.nav as nav

    return nav
