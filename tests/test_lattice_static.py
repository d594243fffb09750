"""The static-shift VI sweep (pad+slice, no gathers — the TPU fast
path) must reproduce the traced-gather sweep exactly: same offsets,
same value function, same extracted warm-start path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.spec import reverse_parking_spec
from obca_tpu.warmstart import lattice


def _small_cfgs():
    spec = reverse_parking_spec(N=20, Ts=1.2)
    static = lattice.LatticeConfig.for_spec(
        spec, nx=64, ny=32, nh=18, n_sweeps=60, max_steps=50)
    traced = dataclasses.replace(static, grid_lo=None, grid_hi=None,
                                 max_kappa=None)
    return spec, static, traced


def test_static_offsets_match_traced_table():
    spec, static, _ = _small_cfgs()
    offs_np = lattice.motion_offsets_static(static)
    offs_tr, *_ = lattice.motion_table(spec, static)
    np.testing.assert_array_equal(offs_np, np.asarray(offs_tr))


def test_static_sweep_matches_gather_sweep():
    spec, static, traced = _small_cfgs()
    f_static = lattice.plan_field(spec, static)
    f_gather = lattice.plan_field(spec, traced)
    np.testing.assert_allclose(np.asarray(f_static.V),
                               np.asarray(f_gather.V),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(f_static.offs),
                                  np.asarray(f_gather.offs))


def test_static_extract_same_path():
    spec, static, traced = _small_cfgs()
    p1 = lattice.extract(spec, lattice.plan_field(spec, static), static)
    p2 = lattice.extract(spec, lattice.plan_field(spec, traced), traced)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)
    assert bool(p1[4])  # reached


def test_default_config_traced_fallback():
    """Under tracing, default_config must fall back (no static fields)
    rather than raise."""
    spec = reverse_parking_spec(N=8, Ts=2.0)

    def f(sp):
        cfg = lattice.default_config(sp)
        assert cfg.grid_lo is None
        return sp.x0

    jax.jit(f)(spec)
