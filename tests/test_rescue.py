"""Neighbor-seeded rescue pass (ipm.solve_batch_rescued) semantics.

The real failure population (10/128 N=80 bench lanes whose duals
explode) is exercised on the TPU bench; these tests pin the mechanism's
invariants at test-scale N.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.solver import ipm
from obca_tpu.spec import SolverConfig, reverse_parking_spec
from obca_tpu.warmstart import geometric, lattice


def _batch(base, shifts):
    return jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(base, x0=base.x0.at[0].add(float(s)))
          for s in shifts],
    )


def test_rescue_noop_when_all_converge():
    base = reverse_parking_spec(N=40, Ts=0.6)
    lcfg = lattice.LatticeConfig.for_spec(base)
    field = lattice.plan_field(base, lcfg)
    specs = _batch(base, [-0.1, 0.0, 0.1])
    W0 = jax.vmap(
        lambda sp: geometric.lattice_warm_start(sp, field=field)
    )(specs)
    cfg = SolverConfig(max_iter=200)
    f = jax.jit(lambda sp, w: ipm.solve_batch_rescued(sp, cfg, w))
    res = f(specs, W0)
    assert np.all(np.asarray(res.status) == ipm.STATUS_CONVERGED)
    # Converged lanes keep their pass-1 iterates exactly.
    res1 = jax.jit(lambda sp, w: ipm.solve_batch(sp, cfg, w))(specs, W0)
    np.testing.assert_array_equal(np.asarray(res.W), np.asarray(res1.W))
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(res1.iters))


def test_rescue_recovers_failed_lane():
    """A lane whose pass 1 is starved of iterations converges in pass 2
    from the converged neighbors' seed."""
    base = reverse_parking_spec(N=40, Ts=0.6)
    lcfg = lattice.LatticeConfig.for_spec(base)
    field = lattice.plan_field(base, lcfg)
    specs = _batch(base, [-0.05, 0.0, 0.05])
    W0 = jax.vmap(
        lambda sp: geometric.lattice_warm_start(sp, field=field)
    )(specs)
    # Poison lane 1's warm start: zero duals + zero inputs leaves the
    # instance far from the basin pass 1 can reach within the cap.
    W0 = W0.at[1, :, 4:].set(0.0)
    cfg = SolverConfig(max_iter=40)
    res1 = jax.jit(lambda sp, w: ipm.solve_batch(sp, cfg, w))(specs, W0)
    st1 = np.asarray(res1.status)
    res = jax.jit(
        lambda sp, w: ipm.solve_batch_rescued(sp, cfg, w)
    )(specs, W0)
    st = np.asarray(res.status)
    # The rescue never loses lanes pass 1 already had...
    assert (st == ipm.STATUS_CONVERGED).sum() >= (
        st1 == ipm.STATUS_CONVERGED).sum()
    # ...and iters accounts for both passes on rescued lanes.
    rescued = (st1 != ipm.STATUS_CONVERGED) & (st == ipm.STATUS_CONVERGED)
    if rescued.any():
        assert np.all(np.asarray(res.iters)[rescued]
                      > np.asarray(res1.iters)[rescued] - cfg.max_iter)
