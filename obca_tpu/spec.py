"""Problem and solver specifications as JAX pytrees.

Capability parity with the reference driver layer (`main.jl` scenario
constants + the positional argument lists of `ParkingSignedDist.jl` /
`ParkingDist.jl` — see SURVEY.md §2.2 C1/C3/C4): everything the reference
passes positionally (x0, xF, N, Ts, ego dims, XY bounds, obstacle
H-representations, fixTime, d_min) lives in a single frozen
:class:`ProblemSpec` pytree, so whole *batches* of problems are just
stacked pytrees that `vmap`/`shard_map` over the leading axis.

Shapes are static (padded) by design: obstacle counts and face counts are
padded to (M, V) with explicit masks so that a single compiled XLA program
serves every scenario in a sweep.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, meta_fields):
    data_fields = [
        f.name for f in dataclasses.fields(cls) if f.name not in meta_fields
    ]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta_fields)
    )
    return cls


@partial(_register, meta_fields=("num_obs", "num_faces"))
@dataclasses.dataclass(frozen=True)
class Obstacles:
    """Padded batch of convex polytope obstacles O_m = {y : A_m y <= b_m}.

    Mirrors the output of the reference's `obstHrep.jl` (vertex lists ->
    halfspaces), but with static padding: ``A`` is [M, V, 2], ``b`` [M, V];
    ``face_mask`` [M, V] marks real faces, ``obs_mask`` [M] real obstacles.
    Padded faces are (A=0, b=0): the constraint 0'y <= 0 is trivially true and its
    dual component is pinned to zero by the solver.
    """

    A: jax.Array          # [M, V, 2]
    b: jax.Array          # [M, V]
    face_mask: jax.Array  # [M, V] float (1.0 real / 0.0 padded)
    obs_mask: jax.Array   # [M]    float
    center: jax.Array     # [M, 2] vertex centroid (dual warm start aid)
    vertices: jax.Array   # [M, V, 2] CCW vertices (padded: repeat last;
    #                       used by exact in-graph separation tests)
    num_obs: int = 0      # static: padded obstacle count M
    num_faces: int = 0    # static: padded face count V


_META = (
    "N",
    "fix_time",
    "signed",
    "max_obs",
    "max_faces",
)


@partial(_register, meta_fields=_META)
@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """One OBCA parking problem instance (or a batch, when leaves carry a
    leading batch axis).

    Field provenance: reconstructed from the reference's
    `ParkingSignedDist(x0, xF, N, Ts, L, ego, XYbounds, nOb, vOb, A, b,
    fixTime, xWS, uWS, timeWS)` signature and `main.jl` constants
    (SURVEY.md §2.1-2.2; reference mount empty, values re-derived from the
    OBCA papers).
    """

    # Boundary conditions: state = (X, Y, psi, v).
    x0: jax.Array                 # [4]
    xF: jax.Array                 # [4]
    # Discretization.
    Ts: jax.Array                 # [] sampling time
    wheelbase: jax.Array          # [] bicycle wheelbase L
    # Ego polytope B = {y : G y <= g}, G fixed axis-aligned box in body
    # frame anchored at the rear axle: g = (front, rear, half_w, half_w).
    ego_g: jax.Array              # [4]
    # Obstacles.
    obstacles: Obstacles
    # Bounds.
    u_lo: jax.Array               # [2] (delta, a) lower
    u_hi: jax.Array               # [2]
    v_lo: jax.Array               # []
    v_hi: jax.Array               # []
    xy_lo: jax.Array              # [2]
    xy_hi: jax.Array              # [2]
    # Steering-rate bound |delta_k - delta_{k-1}| <= du_max * Ts (and accel
    # rate analogously); du_max[i] < 0 disables the bound.
    du_max: jax.Array             # [2]
    u_prev: jax.Array             # [2] input at k = -1 (for rate terms)
    # Minimum separation for the collision constraints.
    d_min: jax.Array              # []
    # Objective weights.
    r_u: jax.Array                # [2]   input quadratics (delta, a)
    r_du: jax.Array               # [2]   input-rate quadratics
    q_time: jax.Array             # [2]   (linear, quadratic) time penalty
    # Tiny Tikhonov weight on the OBCA duals: selects a unique
    # (lam, mu) certificate when obstacle constraints are slack (far
    # obstacles leave the duals non-unique — the separating-direction
    # "ring" — which stalls Newton).  The regularization is *proximal*:
    # 0.5 * w_reg * ||dual - dual_ref||^2 anchored at the warm-start
    # duals (`dual_ref`, set by the solver from W0), mirroring how the
    # reference relies on Ipopt staying near DualMultWS's init.  Part of
    # the canonical problem definition — oracle and TPU solves share it,
    # so control parity is unaffected.
    w_reg: jax.Array              # []
    dual_ref: jax.Array           # [N+1, M*V + 4M] proximal centers
    # Free-time scaling bounds (only used when fix_time=False).
    tau_lo: jax.Array             # []
    tau_hi: jax.Array             # []
    # --- static structure ---
    N: int = 80                   # horizon (N steps, N+1 knots)
    fix_time: bool = True         # True: tau == 1 fixed
    signed: bool = True           # True: ||A'lam|| = 1 (signed distance)
    max_obs: int = 4              # padded obstacle count M
    max_faces: int = 4            # padded face count V


@partial(_register,
         meta_fields=("max_iter", "ls_steps", "refine_iters", "dtype",
                      "residual_dtype", "factor_dtype", "dual_init_ls",
                      "dual_ls_warm", "watchdog", "ruiz_iters",
                      "ruiz_pow2", "ruiz_single_apply", "soc",
                      "strict_steps"))
@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Interior-point solver configuration (Ipopt-shaped defaults --
    SURVEY.md §2.1 'Solver').

    All tolerances are pytree leaves so a batch can in principle carry
    per-scenario settings; iteration caps and dtype are static.
    """

    tol: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-6)
    )
    mu_init: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.1)
    )
    mu_min: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-7)
    )
    # Fiacco-McCormick monotone decrease: mu <- max(mu_min, min(kappa*mu,
    # mu^theta)) when the inner problem is solved to kappa_eps * mu.
    mu_kappa: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.2)
    )
    mu_theta: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1.5)
    )
    kappa_eps: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(10.0)
    )
    # Fraction-to-boundary.
    tau_ftb: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.995)
    )
    # Regularization (quasidefinite KKT): primal delta_w, dual delta_c.
    delta_w: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-8)
    )
    delta_c: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-8)
    )
    # Merit-function penalty parameter.
    merit_rho: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(100.0)
    )
    # The KKT factorization regularizes diagonals to +-delta_factor (a
    # well-scaled, pivoting-free quasidefinite factor) and recovers the
    # true-system solution by iterative refinement — the TPU-native
    # substitute for MUMPS' Bunch-Kaufman pivoting (SURVEY.md §2.2 C10).
    delta_factor: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4)
    )
    # Primal step cap (inf-norm): weakly-determined dual directions (far
    # obstacles' separating-direction ring has curvature ~ w_reg) produce
    # huge tangential Newton excursions; capping the step keeps the merit
    # line search effective without affecting local convergence.
    step_max: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(5.0)
    )
    max_iter: int = 100
    ls_steps: int = 12
    refine_iters: int = 3
    dtype: Any = jnp.float64
    # Refinement residuals may use a wider dtype than the iterate (the
    # f32 fast path refines against f64 matvecs — elementwise only, so
    # cheap even where f64 is emulated).  None = same as `dtype`.
    residual_dtype: Any = None
    # The KKT factorization (all the nz^3 matmuls — the FLOPs hot spot)
    # may run narrower than the iterate: f32 factor + f64 iterate is
    # the TPU fast path (MXU-speed factor, f64-accurate directions via
    # refinement).  None = same as `dtype`.
    factor_dtype: Any = None
    # Least-squares initialization of the equality multipliers at the
    # warm start (Ipopt's dual LS init): one extra factor+solve that
    # typically saves tens of first-barrier iterations.
    dual_init_ls: bool = True
    # Apply the equality-multiplier LS as a *correction* on top of
    # caller-provided warm duals (guarded — kept only when it halves
    # the dual residual).  Off by default, and measured to be a NO-OP
    # on the MPC shifted re-solve (r5, tools/dbg_mpc_shift.py:
    # identical iteration traces with/without — the shift's residual
    # dual defect was not the re-solve tax; ill-conditioned f32
    # systems at the barrier floor were, fixed by resolve_mu/delta_w
    # instead).  Retained for callers with genuinely poor warm
    # equality multipliers.
    dual_ls_warm: bool = False
    # Accept the full fraction-to-boundary step whenever it strictly
    # reduces the KKT error, bypassing the merit test (a cheap watchdog;
    # see ipm.step).
    watchdog: bool = True
    # Ruiz equilibration sweeps on the KKT before factoring.
    ruiz_iters: int = 3
    # Round the accumulated Ruiz scale to the nearest power of two
    # before applying it.  Powers of two make the scaling EXACT in
    # floating point — K_s = dsc_i K_ij dsc_j introduces zero rounding
    # error, so the scaled system carries exactly the unscaled
    # system's information and the solve direction cannot depend on
    # how the scaling was computed (the r4 single-apply reordering
    # moved the parallel-parking f32 basin by exactly such noise —
    # VERDICT r4 missing #1).  Cost: the factor sees an up-to-2x
    # less-equilibrated system (harmless at f32 with refinement).
    ruiz_pow2: bool = False
    # True (default): accumulate the Ruiz scale and apply it once —
    # half the equilibration HBM traffic (the r4 fast path).  False:
    # the r3 iterative rescale-per-sweep semantics; mathematically the
    # same, different fp roundings — the parallel-parking family's
    # basin tracking needs these exact roundings (see ipm.step).
    ruiz_single_apply: bool = True
    # Second-order (Maratos) correction solve per iteration.
    soc: bool = True
    # Reject steps that pass NO acceptance test (merit, watchdog, SOC)
    # instead of taking the smallest line-search alpha on faith.  ON
    # for warm re-solves near the barrier floor (MPC): a garbage
    # ill-conditioned direction taken blind blows up the duals
    # (measured: dual residual 0.1 -> 46 in one rejected-by-everything
    # step).  OFF for cold solves: early-barrier progress on the
    # nonconvex basin measurably relies on desperation steps (parallel
    # parking stalls at err ~3.9 with strict steps on).
    strict_steps: bool = False


def mixed_solver_config(max_iter: int = 100, tol: float = 1e-6,
                        **overrides) -> "SolverConfig":
    """Accuracy-grade mixed-precision configuration: float64 iterate
    (residuals, merit, step control) with the factorization's nz^3
    matmuls in float32, recovered to f64 accuracy by iterative
    refinement.  Reproduces the f64 oracle to ~1e-6-class control
    parity (measured ON-CHIP r5: 2.7e-6 on the dist-family golden —
    bench/out/parity_onchip.json) and backs the dist-family parity
    tests.  The r4 Mosaic crash (`layout.h` CHECK `bitwidth <= 32`)
    was a 64-bit leak into the kernels under jax_enable_x64 —
    `jnp.eye`'s i64 iotas and a weak-f64 literal — fixed in r5
    (blocktri_kernel._eye).  `f32_solver_config` remains the
    throughput path (emulated-f64 elementwise ops are ~10x slower on
    this part); mixed is the accuracy-grade configuration."""
    kw = dict(
        dtype=jnp.float64,
        factor_dtype=jnp.float32,
        residual_dtype=jnp.float64,
        tol=jnp.asarray(tol),
        delta_factor=jnp.asarray(1e-4),
        refine_iters=4,
        max_iter=max_iter,
    )
    kw.update(overrides)
    return SolverConfig(**kw)


def f32_solver_config(max_iter: int = 150, tol: float = 1e-4,
                      **overrides) -> "SolverConfig":
    """Tuned single-precision solver configuration (the TPU fast path):
    heavier factor regularization (the pivoting-free Schur chain
    amplifies f32 roundoff), more GCR steps, and a barrier floor
    matched to f32 conditioning.  Pure f32 end to end — no emulated
    f64 anywhere on the chip."""
    kw = dict(
        dtype=jnp.float32,
        residual_dtype=jnp.float32,
        # The Maratos correction never fires on the reverse-parking
        # family (measured: identical iteration counts with/without),
        # so its per-iteration re-factor+solve is skipped; families
        # whose basin depends on it (parallel parking) use
        # parallel_fastpath_config, which turns it back on.
        soc=False,
        tol=jnp.asarray(tol),
        mu_min=jnp.asarray(1e-6),
        delta_w=jnp.asarray(1e-7),
        delta_c=jnp.asarray(1e-7),
        delta_factor=jnp.asarray(1e-4),
        # GCR depth 4: measured on-chip (r3 knob sweep) — m=10 and m=4
        # both converge 128/128 with identical ~8e-4 golden parity;
        # m=4 is ~18% faster end to end (103.9 vs 84.5 solves/s).
        refine_iters=4,
        # 8 line-search points: the merit sweep costs a measured
        # 0.31 ms/point on-chip (r4 profile_phase); 12 -> 8 saves
        # ~1.2 ms/iter and the bench converges identically (the
        # fallback step only rises from a/2048 to a/128, and failed
        # searches trigger the delta_w bump either way).
        ls_steps=8,
        max_iter=max_iter,
    )
    kw.update(overrides)
    return SolverConfig(**kw)


def parallel_fastpath_config(max_iter: int = 250,
                             **overrides) -> "SolverConfig":
    """f32 fast path for the parallel-parking family (canonical
    config 2).  Deviations from `f32_solver_config`:

    * SOC stays ON (the f64 oracle accepts Maratos-corrected steps on
      this family; without it the f32 iterate drifts into a different
      local optimum — gap 4e-2, r3 measurement);
    * the barrier runs to mu_min = 1e-7 / tol 3e-5, the measured f32
      floor (3e-8 NaN-guards);
    * **mu_init = 1e-3 — warm-start basin pinning.**  This family's
      NLP has several near-optimal attractors, and starting the
      barrier at 0.1 re-centers so far from the warm start that basin
      selection becomes an fp coin flip: ANY reordering (the r4 Ruiz
      rewrite; an f32 factor under an f64 iterate; an elementwise
      rewrite of the constraint evaluation) measurably lands f64/f32/
      mixed in different optima 1e-2..5e-1 apart (r5 experiment log,
      tools/dbg_parallel_parity.py).  Starting at mu_init = 1e-3
      keeps every path in the basin the warm start selects — measured
      r5 (CPU): f32 vs f64 gap 2.1e-5, mixed vs f64 2.7e-8.  This is
      exactly how the reference pipeline behaves: Ipopt with
      warm_start_init_point=yes + a lowered mu_init trusts
      DualMultWS's basin choice (SURVEY.md §2.1 warm start: "parity
      requires reproducing this warm start").  The f64 oracle golden
      is generated with the SAME family configuration
      (oracle/gen_goldens.py), so parity stays a real f32-vs-f64 test
      of the production path.
    """
    kw = dict(
        soc=True,
        tol=3e-5,
        mu_min=jnp.asarray(1e-7),
        mu_init=jnp.asarray(1e-3),
        # Deeper GCR + one extra Ruiz sweep than the reverse default:
        # at the f32 barrier floor this family's basin tracking needs
        # the most faithful directions available (r4 knob sweep).
        refine_iters=16,
        ruiz_iters=4,
        max_iter=max_iter,
    )
    kw.update(overrides)
    return f32_solver_config(**kw)


# ---------------------------------------------------------------------------
# Canonical scenarios.
#
# Reconstructions of the reference's `main.jl` scenarios (reverse / "back-
# wards" parking and parallel parking).  The reference mount was empty at
# survey time (SURVEY.md §0) so the exact constants are re-derived from the
# OBCA / H-OBCA papers: ego ~ (front 3.7, rear 1, half-width 1), wheelbase
# 2.7, |delta| <= 0.6, |a| <= 0.4 (paper-era values); slot geometry chosen
# so the canonical maneuvers are feasible with sensible margins.
# ---------------------------------------------------------------------------


def obstacles_from_vertices(vertex_lists, max_obs=None, max_faces=None,
                            dtype=jnp.float64) -> Obstacles:
    """CCW vertex lists -> padded halfspace representation.

    TPU-native equivalent of the reference's `obstHrep.jl` (SURVEY.md §2.2
    C2).  Pure numpy here (host-side scenario construction); the batched
    in-graph variant lives in :mod:`obca_tpu.geometry`.
    """
    from obca_tpu import geometry

    M = max_obs if max_obs is not None else len(vertex_lists)
    V = max_faces if max_faces is not None else max(
        (len(v) for v in vertex_lists), default=1
    )
    A = np.zeros((M, V, 2))
    # Padded faces are (A = 0, b = 0): the halfspace 0'y <= 0 is
    # trivially true (set unchanged) AND the padded row contributes
    # exactly nothing to the dual OBCA terms.  b = 1 here was an r5
    # correctness bug: the dist row's lam'(A t - b) term turns a
    # padded-face lam into a free "distance coupon" — lam_pad = -0.1
    # buys +0.1 of fake clearance against the soft quadratic pin
    # (measured: a converged topology-varying lane clipped a block
    # corner by 4.9 cm while its model dist row read +0.05).
    b = np.zeros((M, V))
    fmask = np.zeros((M, V))
    omask = np.zeros((M,))
    center = np.zeros((M, 2))
    vertices = np.zeros((M, V, 2))
    for m, verts in enumerate(vertex_lists):
        va = np.asarray(verts, float)
        Am, bm = geometry.hrep_from_ccw_vertices(va)
        k = Am.shape[0]
        A[m, :k] = Am
        b[m, :k] = bm
        fmask[m, :k] = 1.0
        omask[m] = 1.0
        center[m] = va.mean(axis=0)
        vertices[m, :k] = va
        vertices[m, k:] = va[-1]
    return Obstacles(
        A=jnp.asarray(A, dtype),
        b=jnp.asarray(b, dtype),
        face_mask=jnp.asarray(fmask, dtype),
        obs_mask=jnp.asarray(omask, dtype),
        center=jnp.asarray(center, dtype),
        vertices=jnp.asarray(vertices, dtype),
        num_obs=M,
        num_faces=V,
    )


def _base_spec(x0, xF, obstacles, *, N, Ts, xy_lo, xy_hi, d_min, fix_time,
               signed, dtype) -> ProblemSpec:
    f = lambda v: jnp.asarray(v, dtype)
    n_dual = obstacles.num_obs * obstacles.num_faces + 4 * obstacles.num_obs
    return ProblemSpec(
        dual_ref=jnp.zeros((N + 1, n_dual), dtype),
        x0=f(x0),
        xF=f(xF),
        Ts=f(Ts),
        wheelbase=f(2.7),
        ego_g=f([3.7, 1.0, 1.0, 1.0]),
        obstacles=obstacles,
        u_lo=f([-0.6, -0.4]),
        u_hi=f([0.6, 0.4]),
        v_lo=f(-1.0),
        v_hi=f(2.0),
        xy_lo=f(xy_lo),
        xy_hi=f(xy_hi),
        du_max=f([0.6, -1.0]),   # steering-rate bound on; accel rate off
        u_prev=f([0.0, 0.0]),
        d_min=f(d_min),
        r_u=f([0.5, 0.5]),
        r_du=f([0.1, 0.1]),
        q_time=f([0.5, 1.0]),
        w_reg=f(1e-2),
        tau_lo=f(0.3),
        tau_hi=f(2.5),
        N=N,
        fix_time=fix_time,
        signed=signed,
        max_obs=obstacles.num_obs,
        max_faces=obstacles.num_faces,
    )


def reverse_parking_spec(N=80, Ts=0.3, fix_time=True, signed=True,
                         d_min=0.05, max_obs=None, max_faces=None,
                         dtype=jnp.float64) -> ProblemSpec:
    """Reverse (back-in) parking between two blocks plus an upper wall.

    Reconstruction of the reference "backwards" scenario (SURVEY.md
    §2.1 Scenarios item 1): slot of width 2.6 m between two large blocks,
    car starts on the road facing +x and backs into the slot heading -y.
    """
    slot_half = 1.3
    obs = obstacles_from_vertices(
        [
            [(-20.0, 5.0), (-slot_half, 5.0), (-slot_half, -5.0),
             (-20.0, -5.0)],
            [(slot_half, 5.0), (20.0, 5.0), (20.0, -5.0), (slot_half, -5.0)],
            [(-20.0, 15.0), (20.0, 15.0), (20.0, 11.0), (-20.0, 11.0)],
        ],
        max_obs=max_obs, max_faces=max_faces, dtype=dtype,
    )
    x0 = [-6.0, 9.0, 0.0, 0.0]
    xF = [0.0, 1.3, np.pi / 2.0, 0.0]
    return _base_spec(
        x0, xF, obs, N=N, Ts=Ts, xy_lo=[-15.0, 1.0], xy_hi=[15.0, 10.0],
        d_min=d_min, fix_time=fix_time, signed=signed, dtype=dtype,
    )


def _np_sat_clearance(px, py, h, ego_g, verts_list):
    """Exact SAT clearance (numpy, host-side) of the ego rectangle at
    poses (px, py, h) [n] vs convex polygons given as CCW vertex
    arrays: min-over-obstacles separation gap (negative = overlap).
    Numpy twin of `geometry.ego_clearance_flat` for spec *generation*
    (construction must stay off-device — eager per-lane device ops
    here land inside the caller's next timed solve)."""
    px, py, h = (np.asarray(a, np.float64) for a in (px, py, h))
    c, s = np.cos(h), np.sin(h)
    front, rear, wl, wr = (float(v) for v in ego_g)
    body = np.asarray(
        [(front, wl), (front, -wr), (-rear, -wr), (-rear, wl)])
    ex = px[:, None] + c[:, None] * body[:, 0] - s[:, None] * body[:, 1]
    ey = py[:, None] + s[:, None] * body[:, 0] + c[:, None] * body[:, 1]
    P = np.stack([ex, ey], axis=-1)                     # [n, 4, 2]
    axes_ego = np.stack(
        [np.stack([c, s], -1), np.stack([-s, c], -1)], axis=1)
    out = np.full(px.shape, np.inf)
    for V in verts_list:
        V = np.asarray(V, np.float64)                   # [v, 2]
        edges = np.roll(V, -1, axis=0) - V
        nrm = np.stack([edges[:, 1], -edges[:, 0]], -1)
        nrm = nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)
        ax = np.concatenate(
            [axes_ego,
             np.broadcast_to(nrm[None], (len(px),) + nrm.shape)],
            axis=1)                                     # [n, a, 2]
        projP = np.einsum("nkd,nad->nka", P, ax)
        projQ = np.einsum("vd,nad->nva", V, ax)
        gap1 = projQ.min(1) - projP.max(1)
        gap2 = projP.min(1) - projQ.max(1)
        out = np.minimum(out, np.maximum(gap1, gap2).max(-1))
    return out


def randomized_reverse_parking_specs(B, n_layouts=8, seed=0, N=80,
                                     Ts=0.3, pose_spread=0.5,
                                     psi_spread=0.15,
                                     vary_topology=False,
                                     dtype=jnp.float64):
    """Randomized-pose AND randomized-obstacle reverse-parking batch
    (BASELINE config 4: "randomized initial poses/obstacles" — the r3
    sweeps randomized poses only, VERDICT r3 missing #2/#3).

    Geometry is drawn per *layout* (slot half-width 1.25-1.6 m, slot
    center +-0.8 m, block-top height 4.7-5.3 m, upper-wall depth
    10.8-12 m; the goal pose moves with the slot) and each of the
    ``n_layouts`` layouts serves a contiguous block of ``B/n_layouts``
    lanes — contiguous so the lattice planner computes one `PlanField`
    per layout instead of per lane (the field depends only on
    (obstacles, goal); see `warmstart.geometric.
    grouped_lattice_warm_start`).  Poses are drawn per lane.  The
    returned spec batch carries fully per-lane obstacle arrays — the
    solver and the property checks see B independent geometries.

    The slot range keeps every instance feasible with margin: minimum
    slot width 2.5 m vs ego width 2.0 m + 2 x d_min = 2.1 m, and at
    least one passable lattice-grid column (cell size 0.23 m) through
    the slot.

    Returns ``(specs, layouts, group_size)``: ``specs`` stacked [B],
    ``layouts`` stacked [n_layouts] (x0 fields are placeholders —
    layout specs exist for PlanField computation), ``group_size`` =
    B // n_layouts.
    """
    if B % n_layouts:
        raise ValueError(f"B={B} must be a multiple of "
                         f"n_layouts={n_layouts}")
    rng = np.random.default_rng(seed)
    # The whole batch (and its dual_ref layout) must share one padded
    # obstacle shape; topology variation pads everything to (4, 5).
    base = reverse_parking_spec(
        N=N, Ts=Ts, dtype=dtype,
        max_obs=4 if vary_topology else None,
        max_faces=5 if vary_topology else None)
    layout_list = []
    layout_verts = []
    # Topology variation (VERDICT r4 weak #6: 4-scalar randomization on
    # a fixed 3-rectangle topology never stressed the padded-face
    # masking): per layout, the upper wall may be absent (2 obstacles),
    # a parked-car box may stand on the right block top (4 obstacles),
    # and the slot-entrance corners may be beveled (5-vertex blocks).
    # Bevels REMOVE block material (the entrance widens), and the box
    # sits x >= slot + 3.5 m, so every variation preserves the layout
    # feasibility margin.  All layouts pad to (max_obs, max_faces) =
    # (4, 5) with masked rows — the real padded-face stress test.
    mo, mf = (4, 5) if vary_topology else (None, None)
    for _ in range(n_layouts):
        sh = rng.uniform(1.25, 1.6)       # slot half-width
        xc = rng.uniform(-0.8, 0.8)       # slot center
        yt = rng.uniform(4.7, 5.3)        # block-top height
        yw = rng.uniform(10.8, 12.0)      # upper wall bottom edge
        if vary_topology and rng.random() < 0.5:
            bw, bh = rng.uniform(0.15, 0.45, size=2)
            left = [(-20.0, yt), (xc - sh - bw, yt),
                    (xc - sh, yt - bh), (xc - sh, -5.0), (-20.0, -5.0)]
        else:
            left = [(-20.0, yt), (xc - sh, yt), (xc - sh, -5.0),
                    (-20.0, -5.0)]
        if vary_topology and rng.random() < 0.5:
            bw, bh = rng.uniform(0.15, 0.45, size=2)
            right = [(xc + sh, yt - bh), (xc + sh + bw, yt),
                     (20.0, yt), (20.0, -5.0), (xc + sh, -5.0)]
        else:
            right = [(xc + sh, yt), (20.0, yt), (20.0, -5.0),
                     (xc + sh, -5.0)]
        vlist = [left, right]
        if not vary_topology or rng.random() < 0.75:
            vlist.append([(-20.0, yw + 4.0), (20.0, yw + 4.0),
                          (20.0, yw), (-20.0, yw)])
        if vary_topology and rng.random() < 0.5:
            # Parked-car box on the right block top, clear of the slot.
            x0b = xc + sh + rng.uniform(3.5, 6.0)
            wb, hb = rng.uniform(1.8, 2.4), rng.uniform(1.4, 2.0)
            vlist.append([(x0b, yt + hb), (x0b + wb, yt + hb),
                          (x0b + wb, yt), (x0b, yt)])
        layout_verts.append(vlist)
        obs = obstacles_from_vertices(vlist, max_obs=mo, max_faces=mf,
                                      dtype=dtype)
        # Park flush: ego front (3.7 ahead of the rear axle) at the
        # block-top line, as in the canonical scenario.
        xF = jnp.asarray([xc, yt - 3.7, np.pi / 2.0, 0.0], dtype)
        layout_list.append(dataclasses.replace(
            base, obstacles=obs, xF=xF))
    layouts = jax.tree.map(lambda *xs: jnp.stack(xs), *layout_list)

    group = B // n_layouts

    # Numpy construction, one device transfer per leaf: per-lane eager
    # device ops here would complete inside the caller's next timed
    # solve (see bench/_common.scenario_batch).
    def rep(a):
        a = np.asarray(a)
        return jnp.asarray(np.repeat(a, group, axis=0))

    specs = jax.tree.map(rep, layouts)
    x0 = np.repeat(np.asarray(layouts.x0), group, axis=0)
    dpose = np.zeros((B, 4))
    dpose[:, :2] = rng.uniform(-pose_spread, pose_spread, size=(B, 2))
    dpose[:, 2] = rng.uniform(-psi_spread, psi_spread, size=B)

    # Start-pose feasibility: stage 0 is PINNED at x0, so a draw whose
    # start pose clears an obstacle by less than d_min is infeasible
    # by construction, not "hard" (the r4 sweep shipped 7/1024 such
    # draws — 2 in outright collision with the upper wall —
    # bench/out/failed_lane_diagnosis.json).  Rejection-sample each
    # lane's pose draw against the exact SAT clearance with a small
    # extra margin; after `tries` rounds fall back to the layout's
    # base pose (always feasible: >= 0.5 m clearance by layout
    # construction).
    ego_g = np.asarray(base.ego_g, np.float64)
    margin = float(np.asarray(base.d_min)) + 0.02
    tries = 40
    for li in range(n_layouts):
        sl = np.arange(li * group, (li + 1) * group)
        for _ in range(tries):
            cand = x0[sl] + dpose[sl]
            clr = _np_sat_clearance(cand[:, 0], cand[:, 1], cand[:, 2],
                                    ego_g, layout_verts[li])
            bad = np.flatnonzero(clr < margin)
            if not bad.size:
                break
            idx = sl[bad]
            dpose[idx, :2] = rng.uniform(-pose_spread, pose_spread,
                                         size=(bad.size, 2))
            dpose[idx, 2] = rng.uniform(-psi_spread, psi_spread,
                                        size=bad.size)
        else:
            cand = x0[sl] + dpose[sl]
            clr = _np_sat_clearance(cand[:, 0], cand[:, 1], cand[:, 2],
                                    ego_g, layout_verts[li])
            dpose[sl[clr < margin]] = 0.0

    specs = dataclasses.replace(
        specs, x0=jnp.asarray(x0 + dpose, dtype))
    return specs, layouts, group


def parallel_parking_spec(N=80, Ts=0.3, fix_time=True, signed=True,
                          d_min=0.05, max_obs=None, max_faces=None,
                          dtype=jnp.float64) -> ProblemSpec:
    """Parallel parking into a curbside slot (3 obstacles).

    Reconstruction of the reference "parallel" scenario (SURVEY.md §2.1
    Scenarios item 2).
    """
    obs = obstacles_from_vertices(
        [
            [(-15.0, 5.0), (-4.0, 5.0), (-4.0, 0.0), (-15.0, 0.0)],
            [(4.0, 5.0), (15.0, 5.0), (15.0, 0.0), (4.0, 0.0)],
            [(-15.0, 2.5), (15.0, 2.5), (15.0, 0.0), (-15.0, 0.0)],
        ],
        max_obs=max_obs, max_faces=max_faces, dtype=dtype,
    )
    # Slot between the two blocks (x in [-4, 4]: an 8 m slot for the
    # 4.7 m car — 1.65 m margin per side, so a d_min-clearing swing
    # exists; the exact reference constants are unrecoverable, see
    # SURVEY.md §0); the third obstacle is the curb spanning the full
    # street at y <= 2.5, so the parked car sits just above it (ego
    # spans y in [2.6, 4.6] at xF, centred in the slot).
    # Parked 0.2 m off the curb (ego bottom 2.7 vs curb 2.5): a full-
    # lock exit swing dips the rear inner corner ~0.095 m below the
    # parked clearance, so a 0.1 m gap would force the escape corridor
    # through < d_min clearance (geometrically unavoidable, not a
    # solver artifact).
    x0 = [-7.0, 7.0, 0.0, 0.0]
    xF = [-1.35, 3.7, 0.0, 0.0]
    return _base_spec(
        x0, xF, obs, N=N, Ts=Ts, xy_lo=[-12.0, 2.6], xy_hi=[12.0, 10.0],
        d_min=d_min, fix_time=fix_time, signed=signed, dtype=dtype,
    )


def randomized_parallel_parking_specs(B, n_layouts=8, seed=0, N=80,
                                      Ts=0.3, pose_spread=0.4,
                                      psi_spread=0.1,
                                      vary_topology=True,
                                      dtype=jnp.float64):
    """Randomized-pose AND randomized-obstacle PARALLEL-parking batch —
    the second scenario family of the config-4 sweep (VERDICT r4 weak
    #6: 'randomized obstacles' that never vary family or topology).

    Per layout: slot half-length 3.85-4.4 m (canonical 4.0 — the
    4.7 m car keeps >= 1.5 m of swing margin per side at the minimum;
    a measured 3.79 draw defeats even the f64 oracle, see the draw
    comment below), slot
    center +-0.6 m, curb top 2.3-2.7 m, block tops 4.8-5.2 m; with
    ``vary_topology`` the slot-entrance corners may be beveled
    (5-vertex blocks) and a parked-car box may stand on the right
    block (4 obstacles), padded to (max_obs, max_faces) = (4, 5) with
    masked rows.  The goal pose parks centered in the drawn slot,
    0.2 m off the drawn curb (same clearance argument as the canonical
    scenario).  Start poses are rejection-sampled to >= d_min + 0.02
    exact-SAT clearance (stage 0 is pinned — see the reverse
    generator).

    Returns ``(specs, layouts, group_size)`` with the same contract as
    :func:`randomized_reverse_parking_specs`.
    """
    if B % n_layouts:
        raise ValueError(f"B={B} must be a multiple of "
                         f"n_layouts={n_layouts}")
    rng = np.random.default_rng(seed)
    mo, mf = (4, 5) if vary_topology else (None, None)
    base = parallel_parking_spec(N=N, Ts=Ts, dtype=dtype,
                                 max_obs=mo, max_faces=mf)
    layout_list = []
    layout_verts = []
    for _ in range(n_layouts):
        # Slot half-length: >= 3.85 keeps >= 1.5 m of total swing
        # margin per side for the 4.7 m car (canonical: 1.65 m).  A
        # measured 3.79 draw (1.25 m/side) is beyond the single-swing
        # maneuver family — the f64 oracle itself fails it from the
        # lattice warm start in 250 iterations — so tighter slots
        # would need a multi-point maneuver planner, not a solver fix.
        gh = rng.uniform(3.85, 4.4)       # slot half-length
        xs = rng.uniform(-0.6, 0.6)       # slot center
        yc = rng.uniform(2.3, 2.7)        # curb top
        yb = rng.uniform(4.8, 5.2)        # block tops
        xl, xr = xs - gh, xs + gh         # slot edges
        if vary_topology and rng.random() < 0.5:
            bw, bh = rng.uniform(0.15, 0.4, size=2)
            left = [(-15.0, yb), (xl - bw, yb), (xl, yb - bh),
                    (xl, 0.0), (-15.0, 0.0)]
        else:
            left = [(-15.0, yb), (xl, yb), (xl, 0.0), (-15.0, 0.0)]
        if vary_topology and rng.random() < 0.5:
            bw, bh = rng.uniform(0.15, 0.4, size=2)
            right = [(xr, yb - bh), (xr + bw, yb), (15.0, yb),
                     (15.0, 0.0), (xr, 0.0)]
        else:
            right = [(xr, yb), (15.0, yb), (15.0, 0.0), (xr, 0.0)]
        vlist = [
            left, right,
            [(-15.0, yc), (15.0, yc), (15.0, 0.0), (-15.0, 0.0)],
        ]
        if vary_topology and rng.random() < 0.5:
            # Opposite-side parked car: a box at the TOP of the street
            # (y >= 9), leaving the y ~ [block top, 9] driving lane
            # free.  (The r5 first cut put this box ON the right block
            # top — inside the pull-out corridor the maneuver swings
            # through; measured: shard convergence 105/128 with the
            # box there vs 127/128 without.  A car parked on top of
            # the parked row is also not a street.)
            x0b = rng.uniform(-2.0, 6.0)
            wb = rng.uniform(4.0, 7.0)
            y0b = rng.uniform(8.9, 9.3)
            vlist.append([(x0b, 10.0), (x0b + wb, 10.0),
                          (x0b + wb, y0b), (x0b, y0b)])
        layout_verts.append(vlist)
        obs = obstacles_from_vertices(vlist, max_obs=mo, max_faces=mf,
                                      dtype=dtype)
        # Park centered in the slot (rear axle 1.35 m left of the car
        # center), 0.2 m above the drawn curb (canonical clearance).
        xF = jnp.asarray([xs - 1.35, yc + 1.2, 0.0, 0.0], dtype)
        # The state box must track the drawn curb (parked y - 1.1).
        layout_list.append(dataclasses.replace(
            base, obstacles=obs, xF=xF,
            xy_lo=jnp.asarray([-12.0, yc + 0.1], dtype)))
    layouts = jax.tree.map(lambda *xs: jnp.stack(xs), *layout_list)

    group = B // n_layouts

    def rep(a):
        a = np.asarray(a)
        return jnp.asarray(np.repeat(a, group, axis=0))

    specs = jax.tree.map(rep, layouts)
    x0 = np.repeat(np.asarray(layouts.x0), group, axis=0)
    dpose = np.zeros((B, 4))
    dpose[:, :2] = rng.uniform(-pose_spread, pose_spread, size=(B, 2))
    dpose[:, 2] = rng.uniform(-psi_spread, psi_spread, size=B)

    ego_g = np.asarray(base.ego_g, np.float64)
    margin = float(np.asarray(base.d_min)) + 0.02
    for li in range(n_layouts):
        sl = np.arange(li * group, (li + 1) * group)
        for _ in range(40):
            cand = x0[sl] + dpose[sl]
            clr = _np_sat_clearance(cand[:, 0], cand[:, 1], cand[:, 2],
                                    ego_g, layout_verts[li])
            bad = np.flatnonzero(clr < margin)
            if not bad.size:
                break
            idx = sl[bad]
            dpose[idx, :2] = rng.uniform(-pose_spread, pose_spread,
                                         size=(bad.size, 2))
            dpose[idx, 2] = rng.uniform(-psi_spread, psi_spread,
                                        size=bad.size)
        else:
            cand = x0[sl] + dpose[sl]
            clr = _np_sat_clearance(cand[:, 0], cand[:, 1], cand[:, 2],
                                    ego_g, layout_verts[li])
            dpose[sl[clr < margin]] = 0.0

    specs = dataclasses.replace(
        specs, x0=jnp.asarray(x0 + dpose, dtype))
    return specs, layouts, group
