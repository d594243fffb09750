"""Sharded execution on a faked 8-device CPU mesh (SURVEY.md §4.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.parallel import mesh as mesh_mod
from obca_tpu.solver import ipm
from obca_tpu.spec import SolverConfig, reverse_parking_spec


def _batch(base, n, spread=0.4):
    shifts = jnp.linspace(-spread, spread, n)
    return jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dataclasses.replace(base, x0=base.x0.at[0].add(s))
          for s in shifts],
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_single_device():
    """Sharded batch result equals the unsharded vmap result
    (SURVEY.md §4.4: assert equal results vs single-device vmap)."""
    base = dataclasses.replace(
        reverse_parking_spec(N=8, Ts=2.0),
        x0=jnp.asarray([-8.0, 7.0, 0.0, 0.5]),
        xF=jnp.asarray([6.0, 8.0, 0.0, 0.5]),
    )
    cfg = SolverConfig(max_iter=10)
    specs = _batch(base, 8)

    mesh = mesh_mod.scenario_mesh()
    res_sh, metrics = mesh_mod.solve_sharded(specs, cfg, mesh)
    res_1 = jax.jit(lambda ss: ipm.solve_batch(ss, cfg))(specs)

    np.testing.assert_allclose(
        np.asarray(res_sh.U), np.asarray(res_1.U), atol=1e-4
    )
    assert int(metrics["n_converged"]) >= 0
    assert np.isfinite(float(metrics["max_err"]))


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    U = jax.jit(fn)(*args)
    assert U.shape == (40, 2)
