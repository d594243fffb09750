"""Inspect the KKT residual structure at the warm start."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from obca_tpu import nlp  # noqa: E402
from obca_tpu.spec import reverse_parking_spec  # noqa: E402
from obca_tpu.warmstart import geometric  # noqa: E402


def main():
    N = 40
    spec = reverse_parking_spec(N=N, Ts=24.0 / N)
    L = nlp.layout_of(spec)
    W0 = geometric.lattice_warm_start(spec)
    spec = dataclasses.replace(
        spec,
        dual_ref=jnp.concatenate([W0[:, L.sl_lam], W0[:, L.sl_mu]], -1),
    )
    active, is_eq = nlp.constraint_masks(L, spec)
    lo, hi, has_lo, has_hi, _ = nlp.bound_arrays(L, spec)
    g0 = jax.grad(lambda Wv: nlp.objective(L, Wv, spec))(W0)
    mu0 = 0.1
    zL0 = jnp.where(has_lo[None, :] > 0,
                    mu0 / jnp.maximum(W0 - lo[None, :], 1e-4), 0.0)
    zU0 = jnp.where(has_hi[None, :] > 0,
                    mu0 / jnp.maximum(hi[None, :] - W0, 1e-4), 0.0)
    # pure objective gradient vs bound duals (nu = 0)
    rw = g0 - zL0 + zU0
    rw = np.asarray(rw)
    print("nw =", L.nw, " slices: x", L.sl_x, "u", L.sl_u, "tau", L.i_tau,
          "lam", L.sl_lam, "mu", L.sl_mu)
    k, i = np.unravel_index(np.argmax(np.abs(rw)), rw.shape)
    print(f"max|rw(nu=0)| = {np.abs(rw).max():.3e} at stage {k} coord {i}")
    # per-coordinate-group maxima
    for name, sl in [("x", L.sl_x), ("u", L.sl_u),
                     ("tau", slice(L.i_tau, L.i_tau + 1)),
                     ("lam", L.sl_lam), ("mu", L.sl_mu)]:
        print(f"  max|rw| over {name}: {np.abs(rw[:, sl]).max():.3e} "
              f" max|g0|: {np.abs(np.asarray(g0)[:, sl]).max():.3e} "
              f" max zL0: {np.asarray(zL0)[:, sl].max():.3e} "
              f" max zU0: {np.asarray(zU0)[:, sl].max():.3e}")
    # smallest bound slacks
    slo = np.asarray(jnp.where(has_lo[None, :] > 0, W0 - lo[None, :], 1.0))
    print("min lower slack:", slo.min(), "at",
          np.unravel_index(np.argmin(slo), slo.shape))
    # now with the full Lagrangian gradient at the LS-initialized duals
    c0 = nlp.all_constraints(L, W0, spec)
    in_row = active * (1.0 - is_eq)[None, :]
    print("max ineq violation (c<0):",
          float(jnp.min(jnp.where(in_row > 0, c0, 1.0))))
    print("max |c| on eq rows:",
          float(jnp.max(jnp.abs(c0) * active * is_eq[None, :])))


if __name__ == "__main__":
    main()
