"""Velocity profile over a Reeds-Shepp path -> time-sampled warm start.

TPU-native equivalent of the reference's `veloSmooth.jl` (SURVEY.md §2.2
C7): the coarse path's bang-bang velocity is replaced by a smooth,
acceleration-bounded profile, and the path is resampled at the N+1 knot
times of the OCP.

Design: consecutive same-direction segments form "runs"; the car must
stop (v = 0) at every cusp, so each run gets its own cosine ease-in/out
profile s(t) = len * (1 - cos(pi t/T_r)) / 2.  Run durations are split
proportionally to sqrt(run length), which equalizes peak acceleration
across runs.  Speeds are clipped into the spec's bounds afterwards (the
solver restores exact dynamic feasibility).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from obca_tpu.warmstart import rs_path


def profile(types, lengths, N, T, dtype=None):
    """Time-sample a 5-segment RS path.

    Returns (ss [N+1] unsigned arclength, vs [N+1] signed speed).
    """
    dt = dtype or lengths.dtype
    seg_abs = jnp.abs(lengths)
    seg_dir = jnp.where(lengths >= 0, 1.0, -1.0)
    active = (types != rs_path.NONE) & (seg_abs > 1e-9)

    # Run index per segment: increment when direction flips between
    # active segments.
    def run_body(carry, inp):
        prev_dir, run = carry
        d, act = inp
        flip = act & (prev_dir != 0.0) & (d * prev_dir < 0.0)
        run = run + jnp.where(flip, 1, 0)
        prev_dir = jnp.where(act, d, prev_dir)
        return (prev_dir, run), run

    (_, _), run_idx = jax.lax.scan(
        run_body, (jnp.asarray(0.0, dt), jnp.asarray(0, jnp.int32)),
        (seg_dir, active),
    )
    run_idx = jnp.where(active, run_idx, 4)

    # Per-run unsigned length and direction (max 5 runs).
    one_hot = jax.nn.one_hot(run_idx, 5, dtype=dt)      # [5 seg, 5 run]
    run_len = (seg_abs * active)[None, :] @ one_hot      # -> [1, 5]
    run_len = run_len[0]
    run_dir_sum = ((seg_abs * seg_dir * active)[None, :] @ one_hot)[0]
    run_dir = jnp.where(run_len > 1e-9,
                        jnp.sign(run_dir_sum), 0.0)

    # Unsigned arclength where each run starts.
    run_s0 = jnp.concatenate(
        [jnp.zeros((1,), dt), jnp.cumsum(run_len)[:-1]]
    )

    # Run durations ~ sqrt(length).
    w = jnp.sqrt(jnp.maximum(run_len, 0.0))
    w = w / jnp.maximum(w.sum(), 1e-9)
    T_run = w * T
    t0_run = jnp.concatenate(
        [jnp.zeros((1,), dt), jnp.cumsum(T_run)[:-1]]
    )

    ts = jnp.linspace(0.0, T, N + 1, dtype=dt)

    def at_time(t):
        # Locate run (last run with t0 <= t, among runs with T>0).
        started = (t >= t0_run - 1e-12) & (T_run > 1e-12)
        r = jnp.maximum(
            0, jnp.max(jnp.where(started, jnp.arange(5), -1))
        )
        tau = jnp.clip((t - t0_run[r]) / jnp.maximum(T_run[r], 1e-12),
                       0.0, 1.0)
        ease = 0.5 * (1.0 - jnp.cos(jnp.pi * tau))
        dease = 0.5 * jnp.pi * jnp.sin(jnp.pi * tau) / jnp.maximum(
            T_run[r], 1e-12
        )
        s = run_s0[r] + run_len[r] * ease
        v = run_dir[r] * run_len[r] * dease
        return s, v

    ss, vs = jax.vmap(at_time)(ts)
    return ss, vs


def polyline_time_sampled(spec, poses, dirs, seg_len, n_runs: int = 8):
    """Time-sample an arbitrary directed pose polyline (e.g. a lattice
    plan) into (X [N+1, 4], U [N, 2]).

    poses [P, 3] continuous poses (heading unwrapped), dirs [P] +-1/0,
    seg_len [P] length of the step INTO poses[i] (0 = padding).  Same
    run/ease logic as `profile` but over arbitrary step counts.
    """
    dt = poses.dtype
    N = spec.N
    T = N * spec.Ts
    P = poses.shape[0]
    active = seg_len > 1e-9

    # run index per step (direction flips among active steps)
    def run_body(carry, inp):
        prev_dir, run = carry
        d, act = inp
        flip = act & (prev_dir != 0.0) & (d * prev_dir < 0.0)
        run = run + jnp.where(flip, 1, 0)
        prev_dir = jnp.where(act, d, prev_dir)
        return (prev_dir, run), run

    (_, _), run_idx = jax.lax.scan(
        run_body, (jnp.asarray(0.0, dt), jnp.asarray(0, jnp.int32)),
        (dirs, active),
    )
    run_idx = jnp.clip(jnp.where(active, run_idx, n_runs - 1), 0,
                       n_runs - 1)

    one_hot = jax.nn.one_hot(run_idx, n_runs, dtype=dt)   # [P, R]
    run_len = ((seg_len * active)[None, :] @ one_hot)[0]
    run_dir_sum = ((seg_len * dirs * active)[None, :] @ one_hot)[0]
    run_dir = jnp.where(run_len > 1e-9, jnp.sign(run_dir_sum), 0.0)
    run_s0 = jnp.concatenate(
        [jnp.zeros((1,), dt), jnp.cumsum(run_len)[:-1]]
    )
    w = jnp.sqrt(jnp.maximum(run_len, 0.0))
    w = w / jnp.maximum(w.sum(), 1e-9)
    T_run = w * T
    t0_run = jnp.concatenate(
        [jnp.zeros((1,), dt), jnp.cumsum(T_run)[:-1]]
    )

    cum = jnp.cumsum(seg_len)                      # arclength at pose i
    ts = jnp.linspace(0.0, T, N + 1, dtype=dt)

    def at_time(t):
        started = (t >= t0_run - 1e-12) & (T_run > 1e-12)
        r = jnp.maximum(
            0, jnp.max(jnp.where(started, jnp.arange(n_runs), -1))
        )
        tau = jnp.clip((t - t0_run[r]) / jnp.maximum(T_run[r], 1e-12),
                       0.0, 1.0)
        ease = 0.5 * (1.0 - jnp.cos(jnp.pi * tau))
        dease = 0.5 * jnp.pi * jnp.sin(jnp.pi * tau) / jnp.maximum(
            T_run[r], 1e-12
        )
        s = run_s0[r] + run_len[r] * ease
        v = run_dir[r] * run_len[r] * dease
        x = jnp.interp(s, cum, poses[:, 0])
        y = jnp.interp(s, cum, poses[:, 1])
        psi = jnp.interp(s, cum, poses[:, 2])
        return jnp.stack([x, y, psi]), v

    pose_k, vs = jax.vmap(at_time)(ts)

    margin = 0.02
    vs = jnp.clip(vs, spec.v_lo + margin, spec.v_hi - margin)
    xy = jnp.clip(pose_k[:, :2], spec.xy_lo[None, :] + margin,
                  spec.xy_hi[None, :] - margin)
    X = jnp.concatenate([xy, pose_k[:, 2:3], vs[:, None]], axis=-1)

    # steering from heading finite differences; accel from dv.
    dpsi = pose_k[1:, 2] - pose_k[:-1, 2]
    ds_signed = vs[:-1] * spec.Ts
    kappa = jnp.where(jnp.abs(ds_signed) > 0.05, dpsi / jnp.where(
        jnp.abs(ds_signed) > 0.05, ds_signed, 1.0), 0.0)
    deltas = jnp.clip(jnp.arctan(spec.wheelbase * kappa),
                      spec.u_lo[0] + margin, spec.u_hi[0] - margin)
    accels = jnp.clip((vs[1:] - vs[:-1]) / spec.Ts,
                      spec.u_lo[1] + margin, spec.u_hi[1] - margin)
    U = jnp.stack([deltas, accels], axis=-1)
    return X, U


def rs_time_sampled(spec, x0=None, xF=None, delta_frac=0.8):
    """Reeds-Shepp path + smooth velocity profile -> (X [N+1,4],
    U [N,2]) warm start for the OCP.

    delta_frac: fraction of the steering bound used for the RS turning
    radius (strictly interior so the warm start respects bounds).
    """
    x0 = spec.x0 if x0 is None else x0
    xF = spec.xF if xF is None else xF
    dt = x0.dtype
    N = spec.N
    delta_ws = delta_frac * spec.u_hi[0]
    rho = spec.wheelbase / jnp.tan(delta_ws)
    types, lengths, total = rs_path.solve(x0[:3], xF[:3], rho)

    T = N * spec.Ts
    ss, vs = profile(types, lengths, N, T, dtype=dt)
    poses, dirs = rs_path.sample(x0[:3], rho, types, lengths, ss)

    # Clip speeds and positions into bounds (the RS shot is obstacle- and
    # bound-blind; the barrier needs strictly interior points, and the
    # solver restores feasibility).
    margin = 0.02
    vs = jnp.clip(vs, spec.v_lo + margin, spec.v_hi - margin)
    xy = jnp.clip(poses[:, :2], spec.xy_lo[None, :] + margin,
                  spec.xy_hi[None, :] - margin)

    X = jnp.concatenate([xy, poses[:, 2:3], vs[:, None]], axis=-1)
    # Controls: steering from segment curvature at each knot, accel from
    # finite differences of v.
    seg_abs = jnp.abs(lengths)
    ends = jnp.cumsum(seg_abs)

    def delta_at(s):
        seg = jnp.clip(jnp.searchsorted(ends, s, side="left"), 0, 4)
        ty = types[seg]
        kappa = jnp.where(ty == rs_path.LEFT, 1.0,
                          jnp.where(ty == rs_path.RIGHT, -1.0, 0.0))
        return jnp.arctan(spec.wheelbase * kappa / rho)

    deltas = jax.vmap(delta_at)(ss[:N])
    accels = (vs[1:] - vs[:-1]) / spec.Ts
    accels = jnp.clip(accels, spec.u_lo[1] + margin,
                      spec.u_hi[1] - margin)
    U = jnp.stack([deltas, accels], axis=-1)
    return X, U
