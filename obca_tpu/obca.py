"""The OBCA dual / hyperplane-separation reformulation.

TPU-native equivalent of the collision-avoidance `@NLconstraint` blocks in
the reference's `ParkingSignedDist.jl` (norm-equality, signed-distance
variant) and `ParkingDist.jl` (norm-inequality, distance variant) — see
SURVEY.md §2.1 "Exact dual reformulation".

For each obstacle O_m = {y : A_m y <= b_m} and ego B = {y : G y <= g} at
state x with rotation R(psi), translation t = (X, Y):

  distance variant  (dist(E(x), O_m) >= d_min):
      exists lam_m >= 0, mu_m >= 0 :
        -g' mu_m + (A_m t - b_m)' lam_m >= d_min
        G' mu_m + R(psi)' A_m' lam_m = 0
        || A_m' lam_m ||_2 <= 1

  signed-distance variant: same with || A_m' lam_m ||_2 = 1, which makes
  the left-hand side the signed distance (penetration measurable).

The norm constraint is implemented in *squared* form ||A'lam||^2 {<=,=} 1
to stay smooth at lam = 0.  Everything is stage-local and vmaps over
(stage, obstacle, scenario) axes with static padded shapes; padded faces
have A = 0, b = 0 (zero dual contribution) and their lam entries are
pinned to zero by the solver's quadratic pin.
"""

from __future__ import annotations

import jax.numpy as jnp


def obca_terms(x, lam, mu, obs_A, obs_b, ego_g):
    """Per-obstacle constraint expressions at one stage.

    Args:
      x:     [4] state (X, Y, psi, v)
      lam:   [M, V] obstacle-face duals
      mu:    [M, 4] ego-face duals
      obs_A: [M, V, 2], obs_b: [M, V]
      ego_g: [4]

    Returns (eq [M, 2], dist [M], norm_sq [M]):
      eq      = G' mu_m + R' A_m' lam_m            (should be 0)
      dist    = -g' mu_m + lam_m' (A_m t - b_m)    (should be >= d_min)
      norm_sq = || A_m' lam_m ||^2                 (should be {<=,=} 1)
    """
    c, s = jnp.cos(x[2]), jnp.sin(x[2])
    t = x[:2]
    # A'lam per obstacle: [M, 2]
    Atlam = jnp.einsum("mvd,mv->md", obs_A, lam)
    # eq = G' mu + R' A'lam, with the tiny d=2 contractions unrolled:
    # batched [M,2]@[2,2] / [M,4]@[4,2] dots here sit inside the
    # (scenario x line-search) double vmap, and XLA pads each to
    # (8, 128) MXU tiles — one such "convolution fusion" was 10.8% of
    # per-iteration device time (854 us/iter, trace_ops.json r4
    # fusion.862).  Elementwise forms fuse into the surrounding ops.
    # G rows are the body-frame box normals (+x, -x, +y, -y), so
    # mu @ G = (mu0 - mu1, mu2 - mu3); R = [[c, -s], [s, c]].
    a0, a1 = Atlam[..., 0], Atlam[..., 1]
    eq = jnp.stack(
        [mu[..., 0] - mu[..., 1] + a0 * c + a1 * s,
         mu[..., 2] - mu[..., 3] - a0 * s + a1 * c], axis=-1)
    At = obs_A[..., 0] * t[0] + obs_A[..., 1] * t[1]   # [M, V]
    dist = (-jnp.sum(mu * ego_g, axis=-1)
            + jnp.sum(lam * (At - obs_b), axis=-1))
    norm_sq = (Atlam ** 2).sum(-1)
    return eq, dist, norm_sq


def dual_distance(x, lam, mu, obs_A, obs_b, ego_g):
    """The dual objective value -g'mu + lam'(A t - b) per obstacle [M]
    (equals dist(E(x), O_m) at the optimal feasible duals)."""
    _, dist, _ = obca_terms(x, lam, mu, obs_A, obs_b, ego_g)
    return dist


def point_obca_terms(p, lam, obs_A, obs_b):
    """Point-mass variant (reference quadcopter-nav example — SURVEY.md
    §2.1): dist(p, O_m) >= d_min  <=>  exists lam_m >= 0 with
    (A_m p - b_m)' lam_m >= d_min and ||A_m' lam_m|| <= 1.

    Returns (dist [M], norm_sq [M]).
    """
    Ap = obs_A[..., 0] * p[0] + obs_A[..., 1] * p[1]   # [M, V]
    dist = jnp.sum(lam * (Ap - obs_b), axis=-1)
    Atlam = jnp.einsum("mvd,mv->md", obs_A, lam)
    return dist, (Atlam ** 2).sum(-1)
