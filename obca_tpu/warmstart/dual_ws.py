"""Dual-variable warm start for the OBCA constraints.

TPU-native equivalent of the reference's `DualMultWS.jl` (SURVEY.md
§2.2 C8): the reference solves, per time step, a small LP in (lam, mu)
minimizing dual-feasibility slack at the warm-start pose.  Here the same
role is served in closed form, exploiting the geometry:

For each stage pose x and obstacle m, choose the separating direction
d = normalize(t - p_m) (ego position vs obstacle center).  Set

    lam_m,i ∝ max(0, a_i . d)        (weight on faces facing the ego)
    normalized so that || A_m' lam_m || = 1,

which satisfies the norm constraint exactly and is strictly inside
lam >= 0 after an eps floor.  Then pick mu_m >= 0 to satisfy the
rotation equality G' mu = -R' A' lam *exactly*: with the ego's
axis-aligned G = [+-e1, +-e2], G' mu = (mu1 - mu2, mu3 - mu4), so the
positive/negative parts of w = -R' A' lam give mu componentwise.

This removes the lam -> 0 degeneracy of the norm constraint (zero
Jacobian row — SURVEY.md §7 hard part 5) that otherwise blows up the
Newton system, and mirrors why the reference needs its dual warm start
for Ipopt convergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from obca_tpu import nlp
from obca_tpu.geometry import rotation
from obca_tpu.spec import ProblemSpec


def geometric_duals(spec: ProblemSpec, X, eps: float = 1e-2):
    """Closed-form dual warm start along a state trajectory.

    Args:
      X: [N+1, 4] warm-start states.
      eps: strict-positivity floor (barrier needs interior points).
    Returns (lam [N+1, M, V], mu [N+1, M, 4]).
    """
    A = spec.obstacles.A
    fm = spec.obstacles.face_mask
    om = spec.obstacles.obs_mask

    def per_stage(x):
        t = x[:2]
        # Most-separating face per obstacle: i* = argmax_i (a_i.t - b_i).
        # lam = onehot(i*) satisfies ||A'lam|| = 1 exactly and the dual
        # value equals the ego-to-face-halfplane signed distance — the
        # exact optimum whenever the nearest feature is a face.  (A
        # centroid-direction heuristic instead mixes in far faces of
        # elongated obstacles and reports wildly wrong distances.)
        face_val = jnp.einsum("mvd,d->mv", A, t) - spec.obstacles.b
        face_val = jnp.where(fm > 0, face_val, -1e9)
        i_star = jnp.argmax(face_val, axis=-1)            # [M]
        lam = jax.nn.one_hot(i_star, A.shape[1], dtype=x.dtype) * fm
        Atlam = jnp.einsum("mvd,mv->md", A, lam)          # [M, 2] (unit)
        # mu from G'mu = -R' A'lam  (exact, componentwise +/- parts).
        R = rotation(x[2])
        w = -(Atlam @ R)                          # [M, 2] = -R' A' lam
        mu = jnp.stack(
            [
                jnp.maximum(w[:, 0], 0.0),
                jnp.maximum(-w[:, 0], 0.0),
                jnp.maximum(w[:, 1], 0.0),
                jnp.maximum(-w[:, 1], 0.0),
            ],
            axis=-1,
        )
        lam = (lam + eps) * fm * om[:, None]
        mu = (mu + eps) * om[:, None]
        return lam, mu

    return jax.vmap(per_stage)(X)


def apply_dual_ws(spec: ProblemSpec, W, eps: float = 1e-2):
    """Write the geometric dual warm start into a packed trajectory W."""
    L = nlp.layout_of(spec)
    X = W[:, L.sl_x]
    lam, mu = geometric_duals(spec, X, eps)
    Np1 = L.N + 1
    W = W.at[:, L.sl_lam].set(lam.reshape(Np1, -1))
    W = W.at[:, L.sl_mu].set(mu.reshape(Np1, -1))
    return W
