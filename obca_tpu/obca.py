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
have A = 0, b = 1 and their lam entries are pinned to zero by the solver.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from obca_tpu.geometry import EGO_G, rotation


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
    R = rotation(x[2])
    t = x[:2]
    G = jnp.asarray(EGO_G, x.dtype)
    # A'lam per obstacle: [M, 2]
    Atlam = jnp.einsum("mvd,mv->md", obs_A, lam)
    eq = mu @ G + Atlam @ R          # [M,4]@[4,2] + [M,2]@[2,2] -> [M, 2]
    dist = (-mu @ ego_g) + jnp.einsum(
        "mv,mv->m", lam, obs_A @ t - obs_b
    )
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
    dist = jnp.einsum("mv,mv->m", lam, obs_A @ p - obs_b)
    Atlam = jnp.einsum("mvd,mv->md", obs_A, lam)
    return dist, (Atlam ** 2).sum(-1)
