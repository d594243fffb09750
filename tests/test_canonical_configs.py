"""End-to-end coverage of the canonical BASELINE configurations
(BASELINE.json:7-9): reverse parking (signed + dist), parallel parking,
and the reference's headline free-time mode — each solved from the
committed golden's warm start and checked for convergence, control
parity with the golden, and geometric collision-freedom.

Reference surface: `OBCA@upstream:ParkingSignedDist.jl`,
`ParkingDist.jl`, and the "parallel" branch of `main.jl` (mount empty —
SURVEY.md §0; the f64 oracle goldens stand in for Ipopt).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu import geometry, nlp
from obca_tpu.solver import ipm
from obca_tpu.spec import (SolverConfig, parallel_parking_spec,
                           reverse_parking_spec)

GOLDDIR = os.path.join(os.path.dirname(__file__), "..", "oracle",
                       "goldens")

# (name, spec builder, cfg overrides).  The parallel family's
# canonical configuration pins the barrier start at mu_init = 1e-3
# (warm-start basin pinning — spec.parallel_fastpath_config; the
# golden is generated with the same pin, oracle/gen_goldens.py).
CASES = [
    ("reverse_parking_dist_N40",
     lambda g: reverse_parking_spec(N=int(g["N"]), Ts=float(g["Ts"]),
                                    signed=False), {}),
    ("parallel_parking_N80",
     lambda g: parallel_parking_spec(N=int(g["N"]), Ts=float(g["Ts"])),
     {"mu_init": 1e-3}),
    ("reverse_parking_freetime_N80",
     lambda g: reverse_parking_spec(N=int(g["N"]), Ts=float(g["Ts"]),
                                    fix_time=False), {}),
]


def _min_clearance(spec, X):
    ds = []
    for k in range(0, spec.N + 1, 2):
        for m in range(spec.max_obs):
            ds.append(float(geometry.ego_obstacle_distance(
                X[k], np.asarray(spec.ego_g), spec.obstacles.A[m],
                spec.obstacles.b[m], spec.obstacles.face_mask[m])))
    return min(ds)


@pytest.mark.parametrize("name,make_spec,cfg_over", CASES,
                         ids=[c[0] for c in CASES])
def test_canonical_config(name, make_spec, cfg_over):
    g = np.load(os.path.join(GOLDDIR, f"{name}.npz"))
    spec = make_spec(g)
    W0 = jnp.asarray(g["W0"])
    cfg = SolverConfig(max_iter=250,
                       **{k: jnp.asarray(v)
                          for k, v in cfg_over.items()})
    if spec.fix_time:
        res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
    else:
        res = jax.jit(lambda sp: ipm.solve_free_time(sp, cfg, W0))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED
    gap = np.abs(np.asarray(res.U) - g["U"]).max()
    assert gap < 1e-5, f"oracle reproducibility gap {gap:.2e}"
    X = np.asarray(res.X)
    assert _min_clearance(spec, X) >= float(spec.d_min) - 1e-6
    # terminal condition met exactly (equality-constrained)
    np.testing.assert_allclose(X[-1], np.asarray(spec.xF), atol=1e-5)
    if not spec.fix_time:
        # the free-time optimum uses the time-scaling channel
        assert abs(float(res.tau) - 1.0) > 0.05
        np.testing.assert_allclose(float(res.tau), float(g["tau"]),
                                   atol=1e-4)
