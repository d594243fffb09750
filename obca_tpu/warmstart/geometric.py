"""Primal warm start: interpolation / no-obstacle trajectory.

TPU-native counterpart of the reference's `WarmStart.jl` (a no-obstacle
OCP warm start — SURVEY.md §2.1 step 1 note): provides an initial
(X, U, tau) guess; the collision-aware path stage lives in
`lattice.py` (SE(2) value iteration) and is wired in by
`lattice_warm_start`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from obca_tpu import nlp
from obca_tpu.spec import ProblemSpec
from obca_tpu.warmstart import dual_ws


def interpolated_states(spec: ProblemSpec, dtype=None):
    """Linear state interpolation x0 -> xF over the horizon [N+1, 4]."""
    dt = dtype or spec.x0.dtype
    N = spec.N
    alpha = jnp.linspace(0.0, 1.0, N + 1, dtype=dt)[:, None]
    return ((1.0 - alpha) * spec.x0[None, :].astype(dt)
            + alpha * spec.xF[None, :].astype(dt))


def warm_start(spec: ProblemSpec, X=None, U=None, tau=None, dtype=None,
               dual_eps: float = 1e-2):
    """Packed warm-start trajectory W [N+1, nw].

    Any of X [N+1,4] / U [N,2] / tau [] may be supplied (e.g. from
    Hybrid A* + velocity smoothing); missing pieces fall back to
    interpolation / zeros / 1, and duals always come from the geometric
    dual warm start (`dual_ws`).
    """
    L = nlp.layout_of(spec)
    dt = dtype or spec.x0.dtype
    if X is None:
        X = interpolated_states(spec, dt)
    W = jnp.zeros((L.N + 1, L.nw), dt)
    W = W.at[:, L.sl_x].set(X.astype(dt))
    if U is not None:
        W = W.at[: L.N, L.sl_u].set(U.astype(dt))
    W = W.at[:, L.i_tau].set(1.0 if tau is None else tau)
    return dual_ws.apply_dual_ws(spec, W, eps=dual_eps)


def lattice_warm_start(spec, dtype=None, dual_eps=1e-2, cfg=None,
                       field=None):
    """Full collision-aware warm start: SE(2) lattice plan (C6) +
    staging-goal analytic expansion + velocity profile (C7) + geometric
    duals (C8).  Falls back to the Reeds-Shepp warm start when the
    lattice does not reach the goal.

    `field`: optional precomputed `lattice.PlanField` — start-pose
    independent, so batched sweeps over one scenario geometry compute
    it once and share it across every vmap lane."""
    from obca_tpu.warmstart import lattice as lattice_mod
    from obca_tpu.warmstart import velosmooth

    lcfg = cfg or lattice_mod.default_config(spec)
    if field is None:
        field = lattice_mod.plan_field(spec, lcfg)
    poses, dirs, seg_len, n_valid, reached = lattice_mod.extract(
        spec, field, lcfg
    )
    X_lat, U_lat = velosmooth.polyline_time_sampled(
        spec, poses, dirs, seg_len
    )
    X_rs, U_rs = velosmooth.rs_time_sampled(spec)
    X = jnp.where(reached, X_lat, X_rs)
    U = jnp.where(reached, U_lat, U_rs)
    return warm_start(spec, X=X, U=U, dtype=dtype, dual_eps=dual_eps)


def grouped_lattice_warm_start(specs, layouts, lcfg, dtype=None,
                               dual_eps=1e-2):
    """Warm starts for a grouped randomized-obstacle batch.

    ``specs`` [B] is laid out as ``n_layouts`` contiguous groups of
    ``B / n_layouts`` lanes sharing one obstacle layout (see
    `spec.randomized_reverse_parking_specs`); ``layouts``
    [n_layouts] carries one representative spec per layout.  One
    `PlanField` is computed per *layout* (vmapped — the field depends
    only on (obstacles, goal), not the start pose), then path
    extraction runs per lane within each group.  This is what keeps
    obstacle-randomized sweeps affordable: per-lane fields would
    multiply the planner cost by the group size for identical output.
    """
    from obca_tpu.warmstart import lattice as lattice_mod

    G = layouts.x0.shape[0]
    B = specs.x0.shape[0]
    group = B // G
    fields = jax.vmap(
        lambda sp: lattice_mod.plan_field(sp, lcfg)
    )(layouts)
    sp_g = jax.tree.map(
        lambda a: a.reshape((G, group) + a.shape[1:]), specs
    )
    W0 = jax.vmap(
        lambda f, sps: jax.vmap(
            lambda sp: lattice_warm_start(sp, dtype=dtype,
                                          dual_eps=dual_eps, cfg=lcfg,
                                          field=f)
        )(sps)
    )(fields, sp_g)
    return W0.reshape((B,) + W0.shape[2:])


def rs_warm_start(spec, dtype=None, delta_frac=0.8, dual_eps=1e-2):
    """Full warm-start pipeline for parking problems: Reeds-Shepp path
    (C6b) + smooth velocity profile (C7) + geometric duals (C8) —
    the reference's Hybrid-A*-free `WarmStart.jl`-style path for
    obstacle-light instances; `lattice_warm_start` supersedes the path
    stage when obstacles block the RS shot."""
    from obca_tpu.warmstart import velosmooth

    X, U = velosmooth.rs_time_sampled(spec, delta_frac=delta_frac)
    return warm_start(spec, X=X, U=U, dtype=dtype, dual_eps=dual_eps)
