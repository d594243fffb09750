"""Kinematic bicycle dynamics: discretization and rollout.

TPU-native equivalent of the dynamics `@NLconstraint` block inside the
reference's `ParkingSignedDist.jl` / `ParkingDist.jl` (SURVEY.md §2.1
"Vehicle dynamics"): states x = (X, Y, psi, v), inputs u = (delta, a),
midpoint-flavoured Euler discretization with an optional global time
scaling tau (free-time problems, fixTime = 0 in the reference).

All functions are pure, shape-static, and differentiable; `rollout` is a
`lax.scan` so the whole horizon stays on-device inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def step(x, u, tau, Ts, wheelbase):
    """One discretization step x_{k+1} = f(x_k, u_k; tau).

    Midpoint-velocity Euler (SURVEY.md §2.1):
      v_mid = v + tau*Ts/2 * a
      psi+  = psi + tau*Ts * v_mid * tan(delta)/L
      X+    = X + tau*Ts * v_mid * cos(psi + tau*Ts/2 * v * tan(delta)/L)
      Y+    = Y + tau*Ts * v_mid * sin(psi + tau*Ts/2 * v * tan(delta)/L)
      v+    = v + tau*Ts * a
    """
    X, Y, psi, v = x[0], x[1], x[2], x[3]
    delta, a = u[0], u[1]
    h = tau * Ts
    kappa = jnp.tan(delta) / wheelbase
    v_mid = v + 0.5 * h * a
    psi_mid = psi + 0.5 * h * v * kappa
    return jnp.stack(
        [
            X + h * v_mid * jnp.cos(psi_mid),
            Y + h * v_mid * jnp.sin(psi_mid),
            psi + h * v_mid * kappa,
            v + h * a,
        ]
    )


def rollout(x0, U, tau, Ts, wheelbase):
    """Roll the horizon: U [N, 2] -> states [N+1, 4] via lax.scan."""

    def body(x, u):
        xn = step(x, u, tau, Ts, wheelbase)
        return xn, xn

    _, xs = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None], xs], axis=0)


def dynamics_defects(X, U, tau, Ts, wheelbase):
    """Defect residuals x_{k+1} - f(x_k, u_k) for X [N+1,4], U [N,2]."""
    f = jax.vmap(step, in_axes=(0, 0, None, None, None))
    return X[1:] - f(X[:-1], U, tau, Ts, wheelbase)
