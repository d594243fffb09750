"""Reeds-Shepp shortest car paths — branchless, batched.

TPU-native equivalent of the reference's `rs_path.jl` (SURVEY.md §2.2
C6b, H-OBCA lineage): analytic shortest paths for a car with unit
turning radius that can drive forward and backward.  Formulas are
implemented from the Reeds-Shepp paper's equations (Reeds & Shepp,
"Optimal paths for a car that goes both forwards and backwards",
Pacific J. Math 145(2), 1990) in the standard 9-base-word form with
timeflip/reflect/backwards transforms.

Instead of the reference's branchy word-by-word search, every candidate
word is evaluated unconditionally, invalid ones are masked to +inf, and
an argmin picks the winner — no data-dependent control flow, so the
whole solver `vmap`s over batches of (start, goal) pairs (SURVEY.md §7
Phase 4 "branchless enumerate-all-words + argmin").

A path is (types [5], lengths [5]): types in {1: left, 0: straight,
2: right, 3: unused}, lengths signed (negative = reverse), in units of
the turning radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LEFT, STRAIGHT, RIGHT, NONE = 1, 0, 2, 3

_PI = np.pi


def _mod2pi(x):
    """Wrap to (-pi, pi]."""
    return x - 2.0 * _PI * jnp.floor((x + _PI) / (2.0 * _PI))


def _polar(x, y):
    return jnp.hypot(x, y), jnp.arctan2(y, x)


# ---------------------------------------------------------------------------
# Base words.  Each returns (valid, t, u, v) — segment magnitudes for the
# canonical orientation; callers attach signs/types.  All are total
# functions (no NaNs for invalid inputs — masked instead).
# ---------------------------------------------------------------------------


def _LpSpLp(x, y, phi):
    """C S C, same-turn: L+ S+ L+  (paper 8.1)."""
    u, t = _polar(x - jnp.sin(phi), y - 1.0 + jnp.cos(phi))
    v = _mod2pi(phi - t)
    valid = (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _LpSpRp(x, y, phi):
    """C S C, opposite-turn: L+ S+ R+  (paper 8.2)."""
    u1, t1 = _polar(x + jnp.sin(phi), y - 1.0 - jnp.cos(phi))
    ok = u1 * u1 >= 4.0
    u = jnp.sqrt(jnp.maximum(u1 * u1 - 4.0, 0.0))
    theta = jnp.arctan2(2.0, u)
    t = _mod2pi(t1 + theta)
    v = _mod2pi(t - phi)
    valid = ok & (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _LpRmL(x, y, phi):
    """C|C C: L+ R- L  (paper 8.3/8.4 via the xi/eta form).

    Returns u as the *signed* canonical middle-arc length (negative:
    the middle R arc is driven backward)."""
    xi = x - jnp.sin(phi)
    eta = y - 1.0 + jnp.cos(phi)
    u1, theta = _polar(xi, eta)
    ok = u1 <= 4.0
    A = jnp.arccos(jnp.clip(u1 / 4.0, -1.0, 1.0))
    t = _mod2pi(theta + _PI / 2.0 + A)
    u = -_mod2pi(_PI - 2.0 * A)
    # Heading: L(t) then R arc of signed length u (heading -u), then L(v):
    # t - u + v = phi  =>  v = phi - t + u.
    v = _mod2pi(phi - t + u)
    return ok, t, u, v


def _LpRupLumRm(x, y, phi):
    """C Cu|Cu C: L+ R+ L- R-  (paper 8.7, tauOmega form)."""
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho = (2.0 + jnp.sqrt(xi * xi + eta * eta)) / 4.0
    ok = (rho >= 0.0) & (rho <= 1.0)
    u = jnp.arccos(jnp.clip(rho, -1.0, 1.0))
    t, v = _tau_omega(u, -u, xi, eta, phi)
    valid = ok & (t >= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _LpRumLumRp(x, y, phi):
    """C|Cu Cu|C: L+ R- L- R+  (paper 8.8)."""
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho = (20.0 - xi * xi - eta * eta) / 16.0
    ok = (rho >= 0.0) & (rho <= 1.0)
    u = -jnp.arccos(jnp.clip(rho, -1.0, 1.0))
    t, v = _tau_omega(u, u, xi, eta, phi)
    valid = ok & (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _tau_omega(u, v, xi, eta, phi):
    """Helper for the CCCC words (OMPL-standard tauOmega math from the
    paper's appendix)."""
    delta = _mod2pi(u - v)
    A = jnp.sin(u) - jnp.sin(delta)
    B = jnp.cos(u) - jnp.cos(delta) - 1.0
    t1 = jnp.arctan2(eta * A - xi * B, xi * A + eta * B)
    t2 = 2.0 * (jnp.cos(delta) - jnp.cos(v) - jnp.cos(u)) + 3.0
    tau = jnp.where(t2 < 0.0, _mod2pi(t1 + _PI), _mod2pi(t1))
    omega = _mod2pi(tau - u + v - phi)
    return tau, omega


def _LpRmSmLm(x, y, phi):
    """C|C(pi/2) S C: L+ R-(pi/2) S- L-  (paper 8.9)."""
    xi = x - jnp.sin(phi)
    eta = y - 1.0 + jnp.cos(phi)
    rho, theta = _polar(xi, eta)
    ok = rho >= 2.0
    r = jnp.sqrt(jnp.maximum(rho * rho - 4.0, 0.0))
    u = 2.0 - r
    t = _mod2pi(theta + jnp.arctan2(r, -2.0))
    v = _mod2pi(phi - _PI / 2.0 - t)
    valid = ok & (t >= 0.0) & (u <= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _LpRmSmRm(x, y, phi):
    """C|C(pi/2) S C: L+ R-(pi/2) S- R-  (paper 8.10)."""
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho, theta = _polar(-eta, xi)
    ok = rho >= 2.0
    t = theta
    u = 2.0 - rho
    v = _mod2pi(t + _PI / 2.0 - phi)
    valid = ok & (t >= 0.0) & (u <= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _LpRmSLmRp(x, y, phi):
    """C|C(pi/2) S C(pi/2)|C: L+ R-(pi/2) S- L-(pi/2) R+ (paper 8.11)."""
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho, _ = _polar(xi, eta)
    ok = rho >= 4.0
    r = jnp.sqrt(jnp.maximum(rho * rho - 4.0, 0.0))
    u = 4.0 - r
    t = _mod2pi(jnp.arctan2((4.0 - u) * xi - 2.0 * eta,
                            -2.0 * xi + (4.0 - u) * eta))
    v = _mod2pi(t - phi)
    valid = ok & (t >= 0.0) & (u <= 0.0) & (v >= 0.0)
    return valid, t, u, v


# ---------------------------------------------------------------------------
# Word tables: base word -> (segment types, signed length pattern).
# Transforms: timeflip (x -> -x, phi -> -phi, lengths negate),
# reflect (y -> -y, phi -> -phi, L <-> R), backwards (swap start/goal:
# (x cos + y sin, x sin - y cos, phi), reverse segment order).
# ---------------------------------------------------------------------------

_L, _S, _R, _N = LEFT, STRAIGHT, RIGHT, NONE


def _flip_lr(types):
    return [({_L: _R, _R: _L}.get(t, t)) for t in types]


def _candidates():
    """Build the full candidate table as python lists of
    (base_fn_index, types [5], sign pattern [5], timeflip, reflect,
    backwards)."""
    base = [
        # (fn_idx, types, signs of (t, u, v) mapped onto 5 slots)
        (0, [_L, _S, _L, _N, _N], [1, 1, 1, 0, 0]),        # L+S+L+
        (1, [_L, _S, _R, _N, _N], [1, 1, 1, 0, 0]),        # L+S+R+
        (2, [_L, _R, _L, _N, _N], [1, -1, -1, 0, 0]),      # L+R-L-  (8.3)
        (3, [_L, _R, _L, _R, _N], [1, 1, -1, -1, 0]),      # L+R+L-R- (8.7)
        (4, [_L, _R, _L, _R, _N], [1, -1, -1, 1, 0]),      # L+R-L-R+ (8.8)
        (5, [_L, _R, _S, _L, _N], [1, -1, -1, -1, 0]),     # 8.9
        (6, [_L, _R, _S, _R, _N], [1, -1, -1, -1, 0]),     # 8.10
        (7, [_L, _R, _S, _L, _R], [1, -1, -1, -1, 1]),     # 8.11
    ]
    # 8.3 also appears with the middle arc positive-left patterns via
    # transforms; additionally the L+R-L+ variant:
    base.append((2, [_L, _R, _L, _N, _N], [1, -1, 1, 0, 0]))  # L+R-L+
    cands = []
    for fn_idx, types, signs in base:
        for tf in (False, True):
            for rf in (False, True):
                for bw in (False, True):
                    ty = list(types)
                    if rf:
                        ty = _flip_lr(ty)
                    ty_canon = list(ty)          # canonical slot order
                    sg_canon = list(signs)       # canonical word signs
                    sg = [-s for s in signs] if tf else list(signs)
                    if bw:
                        # reverse the order of the active segments
                        nseg = sum(1 for t in ty if t != _N)
                        ty = ty[:nseg][::-1] + ty[nseg:]
                        sg = sg[:nseg][::-1] + sg[nseg:]
                    cands.append(
                        (fn_idx, ty, sg, ty_canon, sg_canon, tf, rf, bw)
                    )
    return cands


_CANDS = _candidates()
_FN_IDX = np.array([c[0] for c in _CANDS])                    # [C]
_TYPES = np.array([c[1] for c in _CANDS])                     # [C, 5]
_SIGNS = np.array([c[2] for c in _CANDS], dtype=np.float64)   # [C, 5]
_TYPES_CANON = np.array([c[3] for c in _CANDS])               # [C, 5]
_SIGNS_CANON = np.array([c[4] for c in _CANDS], dtype=np.float64)
_TF = np.array([c[5] for c in _CANDS])
_RF = np.array([c[6] for c in _CANDS])
_BW = np.array([c[7] for c in _CANDS])


def _eval_bases(x, y, phi):
    """Evaluate all 8 base functions at (x, y, phi) -> stacked
    (valid [8], t u v [8])."""
    fns = [_LpSpLp, _LpSpRp, _LpRmL, _LpRupLumRm, _LpRumLumRp,
           _LpRmSmLm, _LpRmSmRm, _LpRmSLmRp]
    vs, ts, us, vvs = [], [], [], []
    for f in fns:
        valid, t, u, v = f(x, y, phi)
        vs.append(valid)
        ts.append(t)
        us.append(u)
        vvs.append(v)
    return (jnp.stack(vs), jnp.stack(ts), jnp.stack(us), jnp.stack(vvs))


def _advance_pose(pose, seg_type, signed_len, rho):
    """Closed-form pose after driving one segment."""
    x, y, psi = pose[0], pose[1], pose[2]
    d = signed_len
    kappa = jnp.where(seg_type == LEFT, 1.0,
                      jnp.where(seg_type == RIGHT, -1.0, 0.0)) / rho
    ksafe = jnp.where(jnp.abs(kappa) < 1e-12, 1.0, kappa)
    dpsi = d * kappa
    straight = seg_type == STRAIGHT
    nx = jnp.where(straight, x + d * jnp.cos(psi),
                   x + (jnp.sin(psi + dpsi) - jnp.sin(psi)) / ksafe)
    ny = jnp.where(straight, y + d * jnp.sin(psi),
                   y - (jnp.cos(psi + dpsi) - jnp.cos(psi)) / ksafe)
    return jnp.stack([nx, ny, psi + dpsi])


def _path_endpoint(types, lengths, rho):
    """Endpoint of a 5-segment path starting at the origin pose."""
    pose0 = jnp.zeros((3,), lengths.dtype)

    def body(pose, inp):
        t, l = inp
        return _advance_pose(pose, t, l, rho), None

    pose, _ = jax.lax.scan(body, pose0, (types, lengths))
    return pose


def solve(start, goal, rho):
    """Shortest Reeds-Shepp path from start [3]=(x,y,psi) to goal [3]
    with minimum turning radius rho.

    Candidate words whose *reconstructed endpoint* misses the normalized
    goal are masked out, so a sign-convention slip in any single formula
    can only remove a candidate, never produce a wrong path.

    Returns (types [5] int32, lengths [5] float — signed, in *world*
    units, zero-padded; total — total |length|).
    """
    dt = jnp.asarray(start).dtype
    dx = (goal[0] - start[0]) / rho
    dy = (goal[1] - start[1]) / rho
    c, s = jnp.cos(start[2]), jnp.sin(start[2])
    x = c * dx + s * dy
    y = -s * dx + c * dy
    phi = _mod2pi(goal[2] - start[2])

    # Transform inputs per candidate: timeflip (x,-phi -> -x), reflect
    # (y, phi -> -y, -phi), backwards.
    def xform(x, y, phi, tf, rf, bw):
        xb = jnp.where(bw, x * jnp.cos(phi) + y * jnp.sin(phi), x)
        yb = jnp.where(bw, x * jnp.sin(phi) - y * jnp.cos(phi), y)
        x1, y1, p1 = xb, yb, phi
        x2 = jnp.where(tf, -x1, x1)
        p2 = jnp.where(tf, -p1, p1)
        y3 = jnp.where(rf, -y1, y1)
        p3 = jnp.where(rf, -p2, p2)
        return x2, y3, p3

    tf = jnp.asarray(_TF)
    rf = jnp.asarray(_RF)
    bw = jnp.asarray(_BW)
    xs, ys, ps = jax.vmap(xform, in_axes=(None, None, None, 0, 0, 0))(
        x, y, phi, tf, rf, bw
    )

    valid_b, t_b, u_b, v_b = jax.vmap(_eval_bases)(xs, ys, ps)  # [C, 8]
    ci = jnp.arange(len(_CANDS))
    fn = jnp.asarray(_FN_IDX)
    valid = valid_b[ci, fn]
    t = t_b[ci, fn]
    u = u_b[ci, fn]
    v = v_b[ci, fn]

    # Magnitudes per slot.  Base words use (t, u, v) in slots 0..2 for
    # 3-segment words; 4-segment words use (t, u, u, v); the 5-segment
    # word uses (t, pi/2, u, pi/2, v).
    #
    # For the 3-segment (CSC / CCC) words, *angular* slots are wrapped
    # into the sign the word pattern expects (magnitude in [0, 2pi)) —
    # far-away reversed-heading goals need arcs > pi, which a (-pi, pi]
    # wrap would wrongly reject.  Straight slots cannot wrap: a sign
    # mismatch there invalidates the candidate.  The endpoint check
    # below arbitrates correctness either way.
    n_seg = jnp.sum(jnp.asarray(_TYPES) != _N, axis=1)
    halfpi = jnp.asarray(_PI / 2.0, dt)
    types_np = jnp.asarray(_TYPES_CANON)
    signs_np = jnp.asarray(_SIGNS_CANON, dt)

    def m2pos(a):
        return a - 2.0 * _PI * jnp.floor(a / (2.0 * _PI))

    def magnitudes(ci_i, fn_i, t, u, v, ok_in):
        # Raw canonical slot values for the 3-segment words (t, u, v are
        # signed canonical lengths there).
        raw3 = jnp.stack([t, u, v, jnp.zeros_like(t),
                          jnp.zeros_like(t)])
        # 4/5-segment words: fixed slot structure, magnitudes + base
        # validity carry the signs via the pattern.
        m4cc = jnp.stack([jnp.abs(t), jnp.abs(u), jnp.abs(u),
                          jnp.abs(v), jnp.zeros_like(t)])      # 8.7/8.8
        m4cs = jnp.stack([jnp.abs(t), halfpi, jnp.abs(u),
                          jnp.abs(v), jnp.zeros_like(t)])      # 8.9/8.10
        m5 = jnp.stack([jnp.abs(t), halfpi, jnp.abs(u), halfpi,
                        jnp.abs(v)])                           # 8.11
        is4cc = (fn_i == 3) | (fn_i == 4)
        is4cs = (fn_i == 5) | (fn_i == 6)
        is5 = fn_i == 7
        is3 = ~(is4cc | is4cs | is5)

        ty = types_np[ci_i]
        sg = signs_np[ci_i]
        is_angle = (ty == _L) | (ty == _R)
        # 3-segment words: arc pose depends on (length mod 2pi) only, so
        # wrap each angular slot into the sign the pattern expects;
        # straight slots cannot wrap — sign mismatch invalidates.
        wrapped = jnp.where(sg >= 0, m2pos(raw3), m2pos(-raw3))
        straight_m = jnp.abs(raw3)
        m3 = jnp.where(is_angle, wrapped, straight_m)
        straight_ok = jnp.all(
            jnp.where(is_angle | (ty == _N), True,
                      raw3 * sg >= -1e-12)
        )
        mags = jnp.where(
            is5, m5,
            jnp.where(is4cc, m4cc, jnp.where(is4cs, m4cs, m3)),
        )
        ok = jnp.where(is3, straight_ok, ok_in)
        return mags, ok

    # NOTE: for 3-segment words geometric validity is recomputed here
    # (sign wrap replaces the t/v >= 0 checks); 4/5-segment words keep
    # their base validity.
    mags, valid = jax.vmap(magnitudes)(ci, fn, t, u, v, valid)
    # Backwards words reversed their sign/type patterns; magnitudes must
    # be reversed over active segments too.
    def rev_active(m, n, do):
        idx = jnp.arange(5)
        ridx = jnp.where(idx < n, n - 1 - idx, idx)
        return jnp.where(do, m[ridx], m)

    mags = jax.vmap(rev_active)(mags, n_seg, bw)
    lengths = mags * jnp.asarray(_SIGNS, dt)

    # Correct-by-construction masking: integrate each candidate in the
    # normalized frame and require it to actually reach (x, y, phi).
    types_arr = jnp.asarray(_TYPES)
    endpoints = jax.vmap(
        lambda ty, ln: _path_endpoint(ty, ln, jnp.asarray(1.0, dt))
    )(types_arr, lengths)
    pe = jnp.stack([x, y, phi])
    err = (jnp.abs(endpoints[:, 0] - pe[0])
           + jnp.abs(endpoints[:, 1] - pe[1])
           + jnp.abs(_mod2pi(endpoints[:, 2] - pe[2])))
    reach = err < 1e-6

    total = jnp.sum(mags * (types_arr != _N), axis=1)
    total = jnp.where(valid & reach, total, jnp.inf)

    best = jnp.argmin(total)
    return (
        types_arr[best].astype(jnp.int32),
        lengths[best] * rho,
        total[best] * rho,
    )


def sample(start, rho, types, lengths, ss):
    """Poses and direction along the path at world arc-lengths ss [K]
    (measured along the path, 0 .. total).

    Returns (poses [K, 3], dirs [K] — +1 forward / -1 reverse).
    """
    seg_abs = jnp.abs(lengths)
    ends = jnp.cumsum(seg_abs)
    starts = ends - seg_abs

    # Precompute segment start poses.
    def scan_body(pose, inp):
        seg_type, slen = inp
        return _advance_pose(pose, seg_type, slen, rho), pose

    _, seg_start_poses = jax.lax.scan(
        scan_body, jnp.asarray(start), (types, lengths)
    )

    def at(s):
        # Find segment, clamp s into it.
        seg = jnp.clip(jnp.searchsorted(ends, s, side="left"), 0, 4)
        local = jnp.clip(s - starts[seg], 0.0, seg_abs[seg])
        signed = local * jnp.sign(lengths[seg])
        pose = _advance_pose(seg_start_poses[seg], types[seg], signed,
                             rho)
        direction = jnp.where(lengths[seg] >= 0.0, 1.0, -1.0)
        return pose, direction

    return jax.vmap(at)(ss)
