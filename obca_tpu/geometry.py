"""Polytope geometry: H-representations, rotations, reference distances.

TPU-native equivalent of the reference's `obstHrep.jl` plus the geometric
ground-truth distance computations used only in tests/property checks
(SURVEY.md §2.2 C2 and §4.2: "dual reformulation vs brute-force
dist(E(x), O) computed geometrically").

Everything here is pure jnp and shape-static, so it vmaps over obstacle
and scenario axes.  `hrep_from_ccw_vertices` also has a host/numpy usage
from `spec.obstacles_from_vertices`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hrep_from_ccw_vertices(verts):
    """Convert a convex polygon vertex array [V, 2] (either winding) to
    halfspaces (A, b) with A y <= b for interior points.

    For a CCW edge p -> q the outward normal is (dy, -dx); the winding
    is detected from the signed area and normals are flipped for CW
    input (the reference's scenario tables are CW — orientation slips
    here silently produce *empty* obstacle sets that the dual
    reformulation then certifies as infinitely far, so robustness
    matters).
    """
    verts = jnp.asarray(verts) if isinstance(verts, jax.Array) else np.asarray(verts)
    lib = jnp if isinstance(verts, jax.Array) else np
    q = lib.roll(verts, -1, axis=0)
    d = q - verts
    # Signed area (shoelace): positive for CCW.
    area2 = (verts[:, 0] * q[:, 1] - q[:, 0] * verts[:, 1]).sum()
    sgn = lib.where(area2 >= 0, 1.0, -1.0) if lib is jnp else (
        1.0 if area2 >= 0 else -1.0
    )
    # CCW polygon: outward normal of edge (p->q) is (dy, -dx).
    n = lib.stack([d[:, 1], -d[:, 0]], axis=-1) * sgn
    norm = lib.sqrt((n ** 2).sum(axis=-1, keepdims=True))
    n = n / norm
    b = (n * verts).sum(axis=-1)
    return n, b


def rotation(psi):
    """Rotation matrix R(psi) (world_from_body), shape psi.shape + (2, 2)."""
    c, s = jnp.cos(psi), jnp.sin(psi)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )


EGO_G = np.array(
    [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
)  # body-frame box normals; g = (front, rear, half_w, half_w)


def ego_vertices(state, ego_g):
    """World-frame corners [4, 2] of the ego rectangle at state (X,Y,psi,v).

    Body frame: x in [-rear, front], y in [-half_w, half_w], anchored at the
    rear axle; ego_g = (front, rear, half_w, half_w).
    """
    front, rear, wl, wr = ego_g[0], ego_g[1], ego_g[2], ego_g[3]
    corners = jnp.stack(
        [
            jnp.stack([front, wl], -1),
            jnp.stack([front, -wr], -1),
            jnp.stack([-rear, -wr], -1),
            jnp.stack([-rear, wl], -1),
        ],
        axis=-2,
    )
    R = rotation(state[2])
    t = state[:2]
    return corners @ R.T + t


def point_polytope_distance(y, A, b, face_mask):
    """Euclidean distance from point y [2] to {z : A z <= b} (0 inside).

    Host-side exact ground truth — only used in tests and property
    checks, never in the solve path (SURVEY.md §4.2/§4.6).
    """
    y = np.asarray(y, float)
    A_ = np.asarray(A, float)
    b_ = np.asarray(b, float)
    m = np.asarray(face_mask) > 0
    if np.all(A_[m] @ y <= b_[m] + 1e-12):
        return 0.0
    verts = vertices_from_hrep(A_, b_, face_mask)
    k = len(verts)
    return float(
        min(
            _point_segment_distance(y, verts[i], verts[(i + 1) % k])
            for i in range(k)
        )
    )


def vertices_from_hrep(A, b, face_mask):
    """Recover CCW-ordered vertices from an H-rep produced by
    `hrep_from_ccw_vertices` (faces are in edge order, so vertex i is the
    intersection of faces i-1 and i).  Host-side, test-only."""
    A = np.asarray(A, float)
    b = np.asarray(b, float)
    idx = np.where(np.asarray(face_mask) > 0)[0]
    A, b = A[idx], b[idx]
    k = len(idx)
    verts = []
    for i in range(k):
        j = (i - 1) % k
        Mx = np.stack([A[j], A[i]])
        rhs = np.array([b[j], b[i]])
        verts.append(np.linalg.solve(Mx, rhs))
    return np.asarray(verts)


def _point_segment_distance(p, a, b):
    ab = b - a
    t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-300), 0.0, 1.0)
    return np.linalg.norm(p - (a + t * ab))


def _polygons_intersect(Pv, Qv):
    """Separating-axis test for convex polygons (vertex arrays [*, 2])."""
    for poly in (Pv, Qv):
        k = len(poly)
        for i in range(k):
            e = poly[(i + 1) % k] - poly[i]
            n = np.array([e[1], -e[0]])
            pP = Pv @ n
            pQ = Qv @ n
            if pP.max() < pQ.min() or pQ.max() < pP.min():
                return False
    return True


def convex_polygon_distance(Pv, Qv):
    """Exact Euclidean distance between convex polygons given as vertex
    arrays [*, 2]; 0 when they intersect.  Host-side ground truth
    (test-only, SURVEY.md §4.2/§4.6)."""
    Pv = np.asarray(Pv, float)
    Qv = np.asarray(Qv, float)
    if _polygons_intersect(Pv, Qv):
        return 0.0
    best = np.inf
    for U, V in ((Pv, Qv), (Qv, Pv)):
        k = len(V)
        for p in U:
            for i in range(k):
                best = min(
                    best, _point_segment_distance(p, V[i], V[(i + 1) % k])
                )
    return float(best)


def polytope_polytope_distance(P_A, P_b, Q_A, Q_b, mask_P, mask_Q):
    """Distance between convex polytopes {A p <= b} whose H-reps came from
    ordered CCW vertex lists; 0 when they intersect (test-only)."""
    Pv = vertices_from_hrep(P_A, P_b, mask_P)
    Qv = vertices_from_hrep(Q_A, Q_b, mask_Q)
    return convex_polygon_distance(Pv, Qv)


def sat_gap(P_pts, P_axes, Q_pts, Q_axes):
    """Separating-axis gap between convex polygons (in-graph, exact up
    to the face-normal axis set): max over candidate axes of the
    projection gap.  Positive = separated by at least that much;
    negative = overlapping on every axis (lower bound of -penetration).
    For convex polygons the separating axis theorem guarantees a
    positive gap on some face normal whenever disjoint; the returned
    value lower-bounds the true clearance (vertex-vertex nearest
    features are under-reported), which is the conservative direction
    for collision checks.

    P_pts [p, 2], Q_pts [q, 2]; axes [a, 2] unit normals of both.
    """
    axes = jnp.concatenate([P_axes, Q_axes], axis=0)   # [a, 2]
    projP = P_pts @ axes.T                             # [p, a]
    projQ = Q_pts @ axes.T
    gap1 = projQ.min(0) - projP.max(0)                 # Q above P
    gap2 = projP.min(0) - projQ.max(0)                 # P above Q
    return jnp.maximum(gap1, gap2).max()


def ego_clearance_exact(state, ego_g, obstacles):
    """In-graph conservative clearance of the ego rectangle at ``state``
    vs every obstacle: [M] array of SAT gaps (negative = collision).

    Used by the warm-start planners for corridor validation — the
    disc-cover occupancy is too conservative for tight slots
    (SURVEY.md §2.2 C6c collision check, exact variant)."""
    ego_pts = ego_vertices(state, ego_g)               # [4, 2]
    R = rotation(state[2])
    G = jnp.asarray(EGO_G, state.dtype)
    ego_axes = G @ R.T                                 # [4, 2]
    A = obstacles.A                                    # [M, V, 2]
    verts = obstacles.vertices                         # [M, V, 2]

    def per_obs(Averts, Vpts, fmask):
        # Replace padded faces' axes with a duplicate of face 0 — a zero
        # axis would report gap 0 and wrongly win the max for
        # overlapping polygons.
        axes = jnp.where(fmask[:, None] > 0, Averts, Averts[0])
        return sat_gap(ego_pts, ego_axes, Vpts, axes)

    gaps = jax.vmap(per_obs)(A, verts, obstacles.face_mask)
    # padded obstacles: report +inf clearance
    return jnp.where(obstacles.obs_mask > 0, gaps, jnp.inf)


def ego_clearance_flat(px, py, h, ego_g, obstacles):
    """Batched conservative SAT clearance for flat pose arrays.

    px/py/h: [n] arrays.  Returns [n] min-over-obstacles gap.

    TPU-layout-friendly variant of `ego_clearance_exact`: the small
    geometry dimensions (4 corners, <=8 axes, V vertices) are unrolled
    in Python so every XLA op is elementwise over the big [n] axis —
    batching them as trailing tensor dims instead makes XLA pad tiny
    minor dimensions to the (8, 128) tile and explode memory ~16x.
    """
    c, s = jnp.cos(h), jnp.sin(h)
    front, rear, wl, wr = ego_g[0], ego_g[1], ego_g[2], ego_g[3]
    body = [(front, wl), (front, -wr), (-rear, -wr), (-rear, wl)]
    ego_pts = [(px + c * bx - s * by, py + s * bx + c * by)
               for bx, by in body]
    # ego axes (unit): rotated +-x / +-y; +-pairs project identically,
    # so two axes suffice for the interval test.
    ego_axes = [(c, s), (-s, c)]

    M, V = obstacles.num_obs, obstacles.num_faces
    A = obstacles.A
    verts = obstacles.vertices
    fmask = obstacles.face_mask
    omask = obstacles.obs_mask

    big = jnp.asarray(jnp.inf, px.dtype)
    result = jnp.full_like(px, jnp.inf)

    for m in range(M):
        gaps = []
        # obstacle vertex projections are scalars per axis; ego
        # projections are [n] arrays.
        obs_pts = [(verts[m, v, 0], verts[m, v, 1]) for v in range(V)]

        def axis_gap(ax, ay, valid):
            pe = [ax * x + ay * y for x, y in ego_pts]
            po = [ax * ox + ay * oy for ox, oy in obs_pts]
            emin = pe[0]
            emax = pe[0]
            for p in pe[1:]:
                emin = jnp.minimum(emin, p)
                emax = jnp.maximum(emax, p)
            omin = po[0]
            omax = po[0]
            for p in po[1:]:
                omin = jnp.minimum(omin, p)
                omax = jnp.maximum(omax, p)
            g = jnp.maximum(omin - emax, emin - omax)
            return jnp.where(valid, g, -jnp.inf)

        # ego axes (per-cell arrays)
        for ax, ay in ego_axes:
            gaps.append(axis_gap(ax, ay, True))
        # obstacle face axes (scalars; padded faces duplicated to face 0)
        for v in range(V):
            ax = jnp.where(fmask[m, v] > 0, A[m, v, 0], A[m, 0, 0])
            ay = jnp.where(fmask[m, v] > 0, A[m, v, 1], A[m, 0, 1])
            gaps.append(axis_gap(ax, ay, True))

        gap_m = gaps[0]
        for g in gaps[1:]:
            gap_m = jnp.maximum(gap_m, g)
        gap_m = jnp.where(omask[m] > 0, gap_m, big)
        result = jnp.minimum(result, gap_m)
    return result


def ego_hrep_world(state, ego_g):
    """Ego polytope in world frame at ``state``: (Aw, bw) with
    E(x) = {y : Aw y <= bw}.  From G R'(y - t) <= g."""
    R = rotation(state[2])
    t = state[:2]
    G = jnp.asarray(EGO_G, state.dtype)
    Aw = G @ R.T
    bw = jnp.asarray(ego_g, state.dtype) + Aw @ t
    return Aw, bw


def ego_obstacle_distance(state, ego_g, obs_A, obs_b, face_mask):
    """Geometric distance between the ego rectangle at ``state`` and one
    obstacle polytope — host-side ground truth for the dual
    reformulation tests."""
    state = np.asarray(state, float)
    ego_g = np.asarray(ego_g, float)
    c, s = np.cos(state[2]), np.sin(state[2])
    R = np.array([[c, -s], [s, c]])
    front, rear, wl, wr = ego_g
    corners = np.array(
        [[front, wl], [front, -wr], [-rear, -wr], [-rear, wl]]
    )
    ego_v = corners @ R.T + state[:2]
    obs_v = vertices_from_hrep(obs_A, obs_b, face_mask)
    return convex_polygon_distance(ego_v, obs_v)
