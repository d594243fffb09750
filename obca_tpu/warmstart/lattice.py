"""Collision-aware coarse path search: SE(2) lattice value iteration.

TPU-native equivalent of the reference's Hybrid A* (`hybrid_a_star.jl`,
`a_star.jl`, `collision_check.jl` — SURVEY.md §2.2 C6/C6a/C6c).  The
reference's priority-queue search is replaced by *value iteration on a
dense (x, y, heading) lattice with arc motion primitives*: every sweep
relaxes all cells against their 6 successors (forward/reverse x
left/straight/right arcs) in one vectorized gather — no data-dependent
control flow, so the planner jits and vmaps over scenario batches
(SURVEY.md §7 Phase 4's "fixed expansion budget, dense arrays" design).

Collision checking (C6c) covers the ego rectangle with three discs and
tests disc centers against the obstacle halfspaces; `max(A p - b)`
lower-bounds the true distance outside, so flagging `< radius` is
conservative near corners.

The extracted cell path is refined with exact continuous primitive arcs
and finished with a Reeds-Shepp tail onto the exact goal pose (the
analytic-expansion role of the reference's `rs_path.jl`).
"""

from __future__ import annotations

import dataclasses
import typing as _t
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.spec import ProblemSpec
from obca_tpu.warmstart import rs_path


@dataclasses.dataclass(frozen=True)
class LatticeConfig:
    nx: int = 128
    ny: int = 64
    nh: int = 36
    n_sweeps: int = 140
    max_steps: int = 110
    delta_frac: float = 0.95    # fraction of steering bound for arcs
    reverse_penalty: float = 1.3
    turn_penalty: float = 1.05
    clearance: float = 0.02     # occupancy margin beyond d_min
    # Static grid geometry (python floats).  When set, the motion-table
    # cell offsets become STATIC numpy arrays and the value-iteration
    # sweep lowers to static pad+slice shifts instead of per-element
    # gathers — the difference between ~2.7 s and ~10 ms per field on
    # the TPU (gathers are the one op class the VPU executes element at
    # a time).  `LatticeConfig.for_spec(spec)` fills these from a
    # concrete spec; None falls back to the traced-gather path (kept
    # for fully traced use).
    grid_lo: tuple | None = None   # (x_lo, y_lo)
    grid_hi: tuple | None = None   # (x_hi, y_hi)
    max_kappa: float | None = None  # tan(delta_frac * delta_max) / L

    @staticmethod
    def for_spec(spec, **overrides) -> "LatticeConfig":
        """Static-geometry config for a concrete (non-traced) spec."""
        cfg = LatticeConfig(**overrides)
        lo = np.asarray(spec.xy_lo, float)
        hi = np.asarray(spec.xy_hi, float)
        kap = float(np.tan(cfg.delta_frac * float(spec.u_hi[0]))
                    / float(spec.wheelbase))
        return dataclasses.replace(
            cfg, grid_lo=(float(lo[0]), float(lo[1])),
            grid_hi=(float(hi[0]), float(hi[1])), max_kappa=kap,
        )


def _grid_params(spec: ProblemSpec, cfg: LatticeConfig):
    lo = spec.xy_lo
    hi = spec.xy_hi
    res = (hi - lo) / jnp.asarray([cfg.nx, cfg.ny], lo.dtype)
    return lo, hi, res


def motion_table(spec: ProblemSpec, cfg: LatticeConfig):
    """Primitive table.

    Returns:
      offs  [nh, 6, 3] int32 — (dx, dy, dh) cell offsets per heading bin
      deltas [nh, 6, 3] float — exact continuous (dx, dy, dpsi)
      cost  [6] float — primitive costs
      dirs  [6] float — +1 forward / -1 reverse
      kappas [6] float — signed curvature (1/rho, 0, -1/rho)
    """
    dt = spec.x0.dtype
    lo, hi, res = _grid_params(spec, cfg)
    dpsi_bin = 2.0 * np.pi / cfg.nh
    delta_ws = cfg.delta_frac * spec.u_hi[0]
    rho = spec.wheelbase / jnp.tan(delta_ws)
    ds = rho * dpsi_bin                      # arc step per heading bin

    hs = jnp.arange(cfg.nh, dtype=dt) * dpsi_bin
    # primitive parameters: (direction, curvature sign)
    prim_dir = jnp.asarray([1.0, 1.0, 1.0, -1.0, -1.0, -1.0], dt)
    prim_turn = jnp.asarray([1.0, 0.0, -1.0, 1.0, 0.0, -1.0], dt)

    def one(h, pd, pt):
        # signed length d = pd * ds, curvature kappa = pt / rho
        d = pd * ds
        kappa = pt / rho
        dpsi = d * kappa
        straight = pt == 0.0
        ksafe = jnp.where(straight, 1.0, kappa)
        dx = jnp.where(straight, d * jnp.cos(h),
                       (jnp.sin(h + dpsi) - jnp.sin(h)) / ksafe)
        dy = jnp.where(straight, d * jnp.sin(h),
                       -(jnp.cos(h + dpsi) - jnp.cos(h)) / ksafe)
        return jnp.stack([dx, dy, dpsi])

    deltas = jax.vmap(
        lambda h: jax.vmap(one, in_axes=(None, 0, 0))(h, prim_dir,
                                                      prim_turn)
    )(hs)                                                    # [nh, 6, 3]

    dxy_cells = jnp.round(deltas[..., :2] / res[None, None, :]).astype(
        jnp.int32
    )
    dh_cells = jnp.round(deltas[..., 2] / dpsi_bin).astype(jnp.int32)
    offs = jnp.concatenate([dxy_cells, dh_cells[..., None]], axis=-1)

    cost = ds * jnp.where(prim_dir < 0, cfg.reverse_penalty, 1.0)
    cost = cost * jnp.where(prim_turn != 0.0, cfg.turn_penalty, 1.0)
    kappas = prim_turn / rho
    return offs, deltas, cost, prim_dir, kappas, rho, ds


def motion_offsets_static(cfg: LatticeConfig) -> np.ndarray:
    """Static numpy twin of `motion_table`'s cell offsets [nh, 6, 3]
    (identical formulas on the static grid geometry — asserted against
    the traced table in tests)."""
    lo = np.asarray(cfg.grid_lo, float)
    hi = np.asarray(cfg.grid_hi, float)
    res = (hi - lo) / np.asarray([cfg.nx, cfg.ny], float)
    dpsi_bin = 2.0 * np.pi / cfg.nh
    rho = 1.0 / cfg.max_kappa
    ds = rho * dpsi_bin
    hs = np.arange(cfg.nh) * dpsi_bin
    prim_dir = np.asarray([1.0, 1.0, 1.0, -1.0, -1.0, -1.0])
    prim_turn = np.asarray([1.0, 0.0, -1.0, 1.0, 0.0, -1.0])

    offs = np.zeros((cfg.nh, 6, 3), np.int64)
    for p in range(6):
        d = prim_dir[p] * ds
        kappa = prim_turn[p] / rho
        dpsi = d * kappa
        if prim_turn[p] == 0.0:
            dx = d * np.cos(hs)
            dy = d * np.sin(hs)
        else:
            dx = (np.sin(hs + dpsi) - np.sin(hs)) / kappa
            dy = -(np.cos(hs + dpsi) - np.cos(hs)) / kappa
        offs[:, p, 0] = np.round(dx / res[0])
        offs[:, p, 1] = np.round(dy / res[1])
        offs[:, p, 2] = np.round(dpsi / dpsi_bin)
    return offs


def _static_shift2(A, dx: int, dy: int, fill):
    """R[x, y] = A[x + dx, y + dy] (fill out of range) — static pad +
    slice, which XLA lowers to contiguous copies (no gather)."""
    nx, ny = A.shape
    ax, ay = abs(dx), abs(dy)
    Ap = jnp.pad(A, ((ax, ax), (ay, ay)), constant_values=fill)
    return jax.lax.slice(Ap, (ax + dx, ay + dy),
                         (ax + dx + nx, ay + dy + ny))


def occupancy(spec: ProblemSpec, cfg: LatticeConfig):
    """[nx, ny, nh] float occupancy (1 = blocked), via the *exact* SAT
    clearance test (C6c) — disc covers proved too conservative for the
    tight rotation corridors of parking scenarios."""
    from obca_tpu import geometry

    dt = spec.x0.dtype
    lo, hi, res = _grid_params(spec, cfg)
    xs = lo[0] + (jnp.arange(cfg.nx, dtype=dt) + 0.5) * res[0]
    ys = lo[1] + (jnp.arange(cfg.ny, dtype=dt) + 0.5) * res[1]
    hsz = 2.0 * np.pi / cfg.nh
    hs = jnp.arange(cfg.nh, dtype=dt) * hsz
    margin = spec.d_min + cfg.clearance

    # Flat-cell layout (see geometry.ego_clearance_flat: keeping the
    # big cell axis as the only large dimension avoids XLA padding tiny
    # trailing dims to full tiles).
    PX, PY, PH = jnp.meshgrid(xs, ys, hs, indexing="ij")
    gaps = geometry.ego_clearance_flat(
        PX.reshape(-1), PY.reshape(-1), PH.reshape(-1), spec.ego_g,
        spec.obstacles,
    )
    return (gaps < margin).astype(dt).reshape(cfg.nx, cfg.ny, cfg.nh)


N_TAIL = 16


def _drive(pose, d, kappa, u):
    """Pose after driving arclength u with direction d, curvature
    kappa."""
    h0 = pose[2]
    straight = jnp.abs(kappa) < 1e-12
    ksafe = jnp.where(straight, 1.0, kappa)
    dpsi = d * u * kappa
    x = jnp.where(straight, pose[0] + d * u * jnp.cos(h0),
                  pose[0] + (jnp.sin(h0 + dpsi) - jnp.sin(h0)) / ksafe)
    y = jnp.where(straight, pose[1] + d * u * jnp.sin(h0),
                  pose[1] - (jnp.cos(h0 + dpsi) - jnp.cos(h0)) / ksafe)
    return jnp.stack([x, y, h0 + dpsi])


def _escape_pose(xF, u, esc, dt):
    """Pose at driven arclength u along the two-segment goal-escape
    maneuver esc = (d1, k1, l1, d2, k2, l2): from the goal pose drive
    segment 1 then segment 2 (directions independent — parallel-parking
    exits need a cusp: straight reverse to the slot end, then swing
    out)."""
    d1, k1, l1, d2, k2, l2 = esc
    u1 = jnp.minimum(u, l1)
    u2 = jnp.clip(u - l1, 0.0, l2)
    p1 = _drive(xF[:3] if xF.shape[0] > 3 else xF, d1, k1, u1)
    return _drive(p1, d2, k2, u2)


def staging_goal(spec: ProblemSpec, cfg: LatticeConfig, occ, to_cell,
                 offs=None):
    """Analytic goal expansion (the role of Hybrid A*'s analytic
    Reeds-Shepp shot near tight goals): tight parking goals (deep or
    parallel slots) have no lattice predecessors at primitive
    resolution, so the planner targets a *staging pose* instead — the
    endpoint of a short escape maneuver (arc at near-full lock + a
    straight) driven out of the goal, validated pose-by-pose with the
    exact SAT clearance test.  The reversed escape becomes the path
    tail.

    Returns (staging pose [3], esc = (d, kappa, a_len, total_len)) with
    total_len = 0 when the goal cell itself is reachable.
    """
    from obca_tpu import geometry

    dt = spec.x0.dtype
    xF = spec.xF
    nh = occ.shape[2]

    delta_m = cfg.delta_frac * spec.u_hi[0]
    k_max = jnp.tan(delta_m) / spec.wheelbase

    dirs_c = jnp.asarray([1.0, -1.0], dt)
    kappas_c = jnp.stack([k_max, jnp.zeros((), dt), -k_max])
    l1_c = jnp.linspace(0.0, 3.2, 5, dtype=dt)
    l2_c = jnp.linspace(0.0, 5.0, 6, dtype=dt)

    n_sub = 16

    def cand(esc):
        d1, k1, l1, d2, k2, l2 = esc
        total = l1 + l2
        pose = _escape_pose(xF, total, esc, dt)
        cx, cy, ch = to_cell(pose)
        free_c = occ[cx, cy, ch] < 0.5

        frac = jnp.linspace(0.0, 1.0, n_sub, dtype=dt)

        def sub_ok(f):
            p3 = _escape_pose(xF, f * total, esc, dt)
            p = jnp.concatenate([p3, jnp.zeros((1,), dt)])
            gaps = geometry.ego_clearance_exact(p, spec.ego_g,
                                                spec.obstacles)
            # Goal-adjacent poses may sit at exactly d_min clearance;
            # ramp the required margin up over the first metre of the
            # escape so the corridor away from the goal keeps the full
            # d_min + margin.  (A zero requirement here let parallel-
            # parking warm starts *touch* the curb mid-swing, wedging
            # the NLP at 45 mm clearance against d_min = 50 mm.)
            ramp = jnp.clip(f * total / 1.0, 0.0, 1.0)
            need = ramp * (spec.d_min + cfg.clearance)
            return jnp.min(gaps) >= need

        corridor_ok = jnp.all(jax.vmap(sub_ok)(frac))
        # prefer short escapes; mild cusp penalty
        score = total + 0.5 * (d1 != d2).astype(dt)
        return free_c & corridor_ok, score, cx, cy, ch

    grids = jnp.meshgrid(dirs_c, kappas_c, l1_c, dirs_c, kappas_c,
                         l2_c, indexing="ij")
    flat = [g.reshape(-1) for g in grids]
    ok, scores, cxs, cys, chs = jax.vmap(
        lambda a, b, c, d, e, f: cand((a, b, c, d, e, f))
    )(*flat)
    return flat, ok, scores, cxs, cys, chs


class PlanField(_t.NamedTuple):
    """Start-independent planning artifacts: occupancy, value function,
    seeds, and the motion tables.  Depends only on (obstacles, goal,
    bounds) — ONE field serves every start pose of a scenario geometry,
    which is what makes batched sweeps affordable (the [nx, ny, nh]
    arrays would otherwise be replicated per vmap lane)."""

    V: "jax.Array"
    occ: "jax.Array"
    seed_key: "jax.Array"
    seed_val: "jax.Array"
    esc_flat: tuple
    offs: "jax.Array"
    cost: "jax.Array"
    prim_dir: "jax.Array"
    ds: "jax.Array"


def plan_field(spec: ProblemSpec, cfg: LatticeConfig = LatticeConfig()):
    """Compute the start-independent PlanField for a scenario."""
    dt = spec.x0.dtype
    lo, hi, res = _grid_params(spec, cfg)
    offs, deltas, cost, prim_dir, kappas, rho, ds = motion_table(
        spec, cfg
    )
    occ = occupancy(spec, cfg)
    hsz = 2.0 * np.pi / cfg.nh

    def to_cell(pose):
        cx = jnp.clip(((pose[0] - lo[0]) / res[0]).astype(jnp.int32),
                      0, cfg.nx - 1)
        cy = jnp.clip(((pose[1] - lo[1]) / res[1]).astype(jnp.int32),
                      0, cfg.ny - 1)
        ch = jnp.mod(jnp.round(pose[2] / hsz).astype(jnp.int32), cfg.nh)
        return cx, cy, ch

    # Seed the value iteration with ALL qualifying goal-escape
    # endpoints (each at its escape cost); the VI itself decides which
    # staging is actually reachable from the start — no fragile single
    # choice up front.
    esc_flat, esc_ok, esc_scores, esc_cx, esc_cy, esc_ch = staging_goal(
        spec, cfg, occ, to_cell, offs=offs
    )
    big = jnp.asarray(1e9, dt)
    C = esc_ok.shape[0]
    # packed int key = round(score*256) * 4096 + idx for tie-stable
    # candidate recovery after scatter-min.
    iscore = jnp.round(
        jnp.where(esc_ok, esc_scores, 1e5) * 256.0
    ).astype(jnp.int32)
    key = iscore * 4096 + jnp.arange(C, dtype=jnp.int32)
    BIGKEY = jnp.asarray(2 ** 30, jnp.int32)
    seed_key = jnp.full((cfg.nx, cfg.ny, cfg.nh), BIGKEY, jnp.int32)
    seed_key = seed_key.at[esc_cx, esc_cy, esc_ch].min(
        jnp.where(esc_ok, key, BIGKEY)
    )
    seed_val = jnp.where(seed_key < BIGKEY,
                         (seed_key // 4096).astype(dt) / 256.0, big)

    V0 = seed_val
    free = occ < 0.5

    if cfg.grid_lo is not None:
        # Static-shift sweep (the fast path): per (heading, primitive)
        # the successor lookup is a static 2-D shift of one heading
        # slice — pure pad+slice copies, no gathers.  Runs in the
        # [nh, nx, ny] layout so every shift touches a contiguous
        # [nx, ny] plane.
        offs_np = motion_offsets_static(cfg)
        offs = jnp.asarray(offs_np, jnp.int32)   # keep extract in sync
        Vt0 = jnp.moveaxis(V0, -1, 0)
        freet = jnp.moveaxis(free, -1, 0)
        seedt = jnp.moveaxis(seed_val, -1, 0)

        def sweep_t(Vt, _):
            outs = []
            for h in range(cfg.nh):
                acc = Vt[h]
                for p in range(6):
                    dx, dy, dh = (int(offs_np[h, p, 0]),
                                  int(offs_np[h, p, 1]),
                                  int(offs_np[h, p, 2]))
                    sh = (h + dh) % cfg.nh
                    acc = jnp.minimum(
                        acc, _static_shift2(Vt[sh], dx, dy, big)
                        + cost[p])
                outs.append(acc)
            Vn = jnp.stack(outs, axis=0)
            Vn = jnp.where(freet, Vn, big)
            Vn = jnp.minimum(Vn, seedt)
            return Vn, None

        Vt, _ = jax.lax.scan(sweep_t, Vt0, None, length=cfg.n_sweeps)
        V = jnp.moveaxis(Vt, 0, -1)
        return PlanField(V=V, occ=occ, seed_key=seed_key,
                         seed_val=seed_val, esc_flat=tuple(esc_flat),
                         offs=offs, cost=cost, prim_dir=prim_dir, ds=ds)

    # Traced-offset fallback (gather sweep): needed when the grid
    # geometry itself is traced (e.g. fully vmapped scenario bounds).
    ix = jnp.arange(cfg.nx)[:, None, None]
    iy = jnp.arange(cfg.ny)[None, :, None]
    ih = jnp.arange(cfg.nh)[None, None, :]

    # successor indices per primitive: applying primitive p FROM cell
    # (x, y, h) lands at (x + dx[h, p], ...).
    def succ_idx(p):
        dx = offs[:, p, 0][None, None, :]
        dy = offs[:, p, 1][None, None, :]
        dh = offs[:, p, 2][None, None, :]
        sx = ix + dx
        sy = iy + dy
        sh = jnp.mod(ih + dh, cfg.nh)
        inb = ((sx >= 0) & (sx < cfg.nx) & (sy >= 0) & (sy < cfg.ny))
        sxc = jnp.clip(sx, 0, cfg.nx - 1)
        syc = jnp.clip(sy, 0, cfg.ny - 1)
        return sxc, syc, sh, inb

    succs = [succ_idx(p) for p in range(6)]

    def sweep(V, _):
        Vn = V
        for p in range(6):
            sx, sy, sh, inb = succs[p]
            Vs = V[sx, sy, sh]
            cand = jnp.where(inb, Vs + cost[p], big)
            Vn = jnp.minimum(Vn, cand)
        Vn = jnp.where(free, Vn, big)
        # seeds persist (they are free cells by construction)
        Vn = jnp.minimum(Vn, seed_val)
        return Vn, None

    V, _ = jax.lax.scan(sweep, V0, None, length=cfg.n_sweeps)
    return PlanField(V=V, occ=occ, seed_key=seed_key, seed_val=seed_val,
                     esc_flat=tuple(esc_flat), offs=offs, cost=cost,
                     prim_dir=prim_dir, ds=ds)


def extract(spec: ProblemSpec, field: PlanField,
            cfg: LatticeConfig = LatticeConfig()):
    """Extract the path for spec.x0 from a precomputed PlanField.

    Returns (poses [max_steps+1+N_TAIL, 3], dirs [same], seg_len [same],
    n_valid, reached) — `dirs[i]` / `seg_len[i]` describe the step INTO
    poses[i] (0 for i = 0 and padding).
    """
    dt = spec.x0.dtype
    lo, hi, res = _grid_params(spec, cfg)
    hsz = 2.0 * np.pi / cfg.nh
    V = field.V
    occ = field.occ
    seed_key = field.seed_key
    seed_val = field.seed_val
    esc_flat = field.esc_flat
    offs = field.offs
    cost = field.cost
    prim_dir = field.prim_dir
    ds = field.ds
    big = jnp.asarray(1e9, dt)
    C = esc_flat[0].shape[0]

    def to_cell(pose):
        cx = jnp.clip(((pose[0] - lo[0]) / res[0]).astype(jnp.int32),
                      0, cfg.nx - 1)
        cy = jnp.clip(((pose[1] - lo[1]) / res[1]).astype(jnp.int32),
                      0, cfg.ny - 1)
        ch = jnp.mod(jnp.round(pose[2] / hsz).astype(jnp.int32), cfg.nh)
        return cx, cy, ch

    ix = jnp.arange(cfg.nx)[:, None, None]
    iy = jnp.arange(cfg.ny)[None, :, None]
    ih = jnp.arange(cfg.nh)[None, None, :]

    def succ_idx(p):
        dx = offs[:, p, 0][None, None, :]
        dy = offs[:, p, 1][None, None, :]
        dh = offs[:, p, 2][None, None, :]
        sx = ix + dx
        sy = iy + dy
        sh = jnp.mod(ih + dh, cfg.nh)
        inb = ((sx >= 0) & (sx < cfg.nx) & (sy >= 0) & (sy < cfg.ny))
        sxc = jnp.clip(sx, 0, cfg.nx - 1)
        syc = jnp.clip(sy, 0, cfg.ny - 1)
        return sxc, syc, sh, inb

    succs = [succ_idx(p) for p in range(6)]

    # --- forward extraction, purely in cell space ---
    # Following V in cell coordinates is strictly monotone (each chosen
    # transition satisfies V(cell) = cost_p + V(succ)), so no cycles;
    # output poses are cell centers with an unwrapped heading (the
    # resampler interpolates and the OCP polishes).
    def cell_center(cx, cy, h_unwrapped):
        px = lo[0] + (cx.astype(dt) + 0.5) * res[0]
        py = lo[1] + (cy.astype(dt) + 0.5) * res[1]
        return jnp.stack([px, py, h_unwrapped])

    sx0, sy0, sh0 = to_cell(spec.x0[:3])

    def step(carry, _):
        cx, cy, ch, h_unw, done = carry
        # Arrived when the current cell is a seed and descending further
        # cannot beat using this seed's escape.
        at_goal = (seed_val[cx, cy, ch] < 0.5 * big) & (
            seed_val[cx, cy, ch] <= V[cx, cy, ch] + 1e-9
        )
        done_now = done | at_goal

        vals = []
        for p in range(6):
            sx, sy, sh, inb = succs[p]
            v = jnp.where(
                inb[cx, cy, ch],
                V[sx[cx, cy, ch], sy[cx, cy, ch], sh[cx, cy, ch]]
                + cost[p],
                big,
            )
            vals.append(v)
        best_p = jnp.argmin(jnp.stack(vals))

        dxyh = offs[ch, best_p]
        ncx = jnp.where(done_now, cx,
                        jnp.clip(cx + dxyh[0], 0, cfg.nx - 1))
        ncy = jnp.where(done_now, cy,
                        jnp.clip(cy + dxyh[1], 0, cfg.ny - 1))
        nch = jnp.where(done_now, ch, jnp.mod(ch + dxyh[2], cfg.nh))
        nh_unw = jnp.where(done_now, h_unw,
                           h_unw + dxyh[2].astype(dt) * hsz)
        pose = cell_center(ncx, ncy, nh_unw)
        out_dir = jnp.where(done_now, 0.0, prim_dir[best_p])
        return (ncx, ncy, nch, nh_unw, done_now), (pose, out_dir)

    h_unw0 = spec.x0[2]
    (fcx, fcy, fch, fh, reached), (poses, dirs) = jax.lax.scan(
        step, (sx0, sy0, sh0, h_unw0, jnp.asarray(False)), None,
        length=cfg.max_steps,
    )
    final_pose = cell_center(fcx, fcy, fh)
    poses = jnp.concatenate([spec.x0[None, :3], poses], axis=0)
    dirs = jnp.concatenate([dirs[:1] * 0.0, dirs], axis=0)
    seg_len = jnp.where(dirs != 0.0, ds, 0.0)

    # Recover the escape candidate whose seed terminated the descent.
    idx = jnp.mod(seed_key[fcx, fcy, fch], 4096)
    idx = jnp.clip(idx, 0, C - 1)
    esc = tuple(f[idx] for f in esc_flat)
    esc_d1, esc_k1, esc_l1, esc_d2, esc_k2, esc_l2 = esc
    esc_total = esc_l1 + esc_l2
    staging = _escape_pose(spec.xF, esc_total, esc, dt)

    # --- tail: connector (end pose -> staging) + reversed escape
    # maneuver (staging -> exact goal, possibly with a cusp) ---
    n_conn = 4
    n_esc = N_TAIL - n_conn

    fracc = (jnp.arange(n_conn, dtype=dt) + 1.0) / n_conn
    dpsi_c = jnp.arctan2(jnp.sin(staging[2] - final_pose[2]),
                         jnp.cos(staging[2] - final_pose[2]))
    conn_poses = jnp.stack(
        [
            final_pose[0] + fracc * (staging[0] - final_pose[0]),
            final_pose[1] + fracc * (staging[1] - final_pose[1]),
            final_pose[2] + fracc * dpsi_c,
        ],
        axis=-1,
    )
    conn_step = jnp.linalg.norm(staging[:2] - final_pose[:2]) / n_conn

    frace = 1.0 - (jnp.arange(n_esc, dtype=dt) + 1.0) / n_esc
    esc_poses = jax.vmap(
        lambda f: _escape_pose(spec.xF, f * esc_total, esc, dt)
    )(frace)
    # unwrap escape headings relative to the staging heading
    esc_poses = esc_poses.at[:, 2].set(
        staging[2] + jnp.arctan2(
            jnp.sin(esc_poses[:, 2] - staging[2]),
            jnp.cos(esc_poses[:, 2] - staging[2]),
        )
    )
    esc_step = esc_total / n_esc
    # drive-in direction per tail sample: opposite of the escape-out
    # direction of the segment the sample sits in.
    u_mid = esc_total * (1.0 - (jnp.arange(n_esc, dtype=dt) + 0.5)
                         / n_esc)
    seg2 = u_mid > esc_l1
    esc_dirs = -jnp.where(seg2, esc_d2, esc_d1)
    conn_dir = esc_dirs[0]

    tail_poses = jnp.concatenate([conn_poses, esc_poses], axis=0)
    tail_dirs = jnp.concatenate(
        [jnp.full((n_conn,), conn_dir, dt), esc_dirs]
    ) * reached
    tail_lens = jnp.concatenate(
        [jnp.full((n_conn,), conn_step, dt),
         jnp.full((n_esc,), esc_step, dt)]
    ) * reached

    poses = jnp.concatenate([poses, tail_poses], axis=0)
    dirs = jnp.concatenate([dirs, tail_dirs], axis=0)
    seg_len = jnp.concatenate([seg_len, tail_lens], axis=0)
    n_valid = jnp.sum((seg_len > 1e-9).astype(jnp.int32))
    return poses, dirs, seg_len, n_valid, reached


def default_config(spec) -> LatticeConfig:
    """Best available config for `spec`: static-shift geometry when the
    spec is concrete (host-side values), traced-gather fallback when it
    is a tracer (e.g. plan_field under vmap over scenario geometry)."""
    try:
        return LatticeConfig.for_spec(spec)
    except jax.errors.TracerArrayConversionError:
        return LatticeConfig()


def plan(spec: ProblemSpec, cfg: LatticeConfig | None = None):
    """Coarse collision-free path from spec.x0 to spec.xF (convenience
    wrapper: compute the field and extract in one call)."""
    cfg = cfg or default_config(spec)
    return extract(spec, plan_field(spec, cfg), cfg)
